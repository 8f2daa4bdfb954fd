package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The measured 10× scale point — turns the engine's "would survive
  * 100 TB" plan-shape claims into numbers. Not part of the driver
  * contract; run manually:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.ScaleProbe"
  * }}}
  *
  * Synthesizes a 10× replica of the sf0.1 `documents` / `embeddings` /
  * `events` tables (parquet on disk, so scan behavior is the real one),
  * then times the flagship and the most expensive LLM-data queries at
  * both scales and reports each query's scaling exponent
  * `alpha = ln(t10/t1) / ln(input_factor)` — `alpha ≈ 1` is linear,
  * `alpha > 1.2` flags superlinear growth worth a root cause.
  *
  * The replication is deliberately STRUCTURE-PRESERVING so 10× input
  * means 10× work, not a degenerate blow-up:
  *   - documents: replica k prefixes every word with `r<k>` — replicas
  *     are shingle-disjoint, so the corpus dup/near-dup pair structure
  *     is exactly 10 copies of the original (a tag-free copy would make
  *     every doc a 10-way duplicate cluster and quadratic LSH work by
  *     construction, which is a different experiment). Text grows ~30%
  *     from the tags, so exponents use the measured BYTE factor, not
  *     the nominal 10.
  *   - embeddings: replica k flips a k-dependent sign pattern —
  *     within-replica cosines are EXACTLY preserved (both vectors flip
  *     the same dims), while cross-replica vectors land in unrelated
  *     LSH buckets.
  *   - events: replica k shifts user/event ids by k·10⁹ (≡ 0 mod 1000,
  *     preserving the fixtures' `event_id % 1000` item derivation) —
  *     disjoint users, identical per-user history shape.
  */
object ScaleProbe {

  private val Shift = 1000000000L // ≡ 0 mod 1000; keeps item_id = event_id % 1000 distributions

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def drain(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaledDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val reps = spark.range(10).toDF("k")

    // --- synthesize the 10× tables --------------------------------------
    val d1 = spark.read.parquet(s"$sfDir/documents.parquet")
    d1.crossJoin(reps)
      .select(
        (col("doc_id") + col("k") * Shift).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(regexp_replace(
            col("text"), lit("(\\S+)"),
            concat(lit("r"), col("k").cast("string"), lit("$1")))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$scaledDir/documents.parquet")

    val e1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e1.crossJoin(reps)
      .select(
        (col("vec_id") + col("k") * Shift).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * when(col("k") === 0 || pmod(hash(col("k"), i), lit(2)) === 0, lit(1.0f))
            .otherwise(lit(-1.0f))).cast("float")).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$scaledDir/embeddings.parquet")

    val ev1 = spark.read.parquet(s"$sfDir/events.parquet") // ts stays long nanos
    ev1.crossJoin(reps)
      .select(
        (col("event_id") + col("k") * Shift).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * Shift).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$scaledDir/events.parquet")

    // Effective input factors (document text grows ~30% from the tags —
    // exponents must use what was actually read, not the nominal 10).
    def docBytes(dir: String): Long = spark.read.parquet(s"$dir/documents.parquet")
      .agg(sum(length(encode(col("text"), "UTF-8")))).collect()(0).getLong(0)
    val byteFactor = docBytes(scaledDir).toDouble / docBytes(sfDir)
    val rowFactor = 10.0
    println(f"""{"probe":"scale10_inputs","doc_byte_factor":$byteFactor%.3f,"event_row_factor":$rowFactor%.1f}""")

    // --- flagship + the most expensive LLM-data queries (r08 ranking) ---
    val targets: Seq[(String, Double)] = Seq(
      "q03_training_examples" -> rowFactor, // flagship (events-derived)
      "q86_count_min" -> byteFactor,
      "q83_cluster_split" -> byteFactor,
      "q92_bloom_dedup_against" -> byteFactor,
      "q89_curate_corpus" -> byteFactor,
      "q96_bpe_encode" -> byteFactor)

    targets.foreach { case (name, factor) =>
      val fn = SparkEntry.queries(name)
      def run(dir: String): Double = {
        spark.catalog.clearCache()
        System.gc()
        (1 to 3).map(_ => time(drain(fn(spark, dir)))).min
      }
      val t1 = run(sfDir)
      val t10 = run(scaledDir)
      val alpha = math.log(t10 / t1) / math.log(factor)
      println(f"""{"probe":"scale10","query":"$name","sec_1x":$t1%.3f,"sec_10x":$t10%.3f,"input_factor":$factor%.3f,"alpha":$alpha%.3f,"superlinear":${alpha > 1.2}}""")
    }
    spark.stop()
  }
}
