package graft
import org.apache.spark.sql.SparkSession
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Suite-sized codegen compile cache — see Bench.scala (r21).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE_ENTRIES", "4096"))
    // Measurement-only conf overrides (comma-separated k=v) for isolated
    // A/Bs, e.g. SPARK_GRAFT_ISO_CONF=spark.sql.codegen.wholeStage=false.
    sys.env.get("SPARK_GRAFT_ISO_CONF").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Operator telemetry (e.g. dedupClusters round counts) logs at INFO
    // under the graft namespace — that's the signal IsoBench exists to
    // surface, so re-enable it under the global WARN.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft", org.apache.logging.log4j.Level.INFO)
    spark.range(1000).selectExpr("sum(id)").collect()
    // Measurement-only variants not in the gate registry: the
    // prefix-filter family's alternate verify strategy (ISO_r19 — the
    // data behind the verifyByCounts default).
    val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "q139_counts_verify" -> ((s: SparkSession, dir: String) => {
        val (result, cached) = graft.operators.Dedup.prefixFilterPairsPlan(
          graft.sources.Tables.documents(s, dir), 3, 50, verifyByCounts = true)
        try {
          val rows = result.orderBy("doc_a", "doc_b").collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
        } finally cached.unpersist()
      }),
      "q142_counts_verify" -> ((s: SparkSession, dir: String) => {
        val (result, cached) = graft.operators.Dedup.containmentPairsPlan(
          graft.sources.Tables.documents(s, dir), 3, 80, verifyByCounts = true)
        try {
          val rows = result.orderBy("src_doc", "dst_doc").collect()
          s.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
        } finally cached.unpersist()
      })) ++
      // Streaming-floor decomposition (VERDICT r19 #5): the q240 gate
      // body at micro-batch shufflePartitions 8 (gate default) / 4 / 2 —
      // same oracle answer (partition width never changes results),
      // purely a task/exchange-overhead measurement over the 3-batch
      // stream + compaction + merged read.
      Map(
        // q274's gate body with the micro-batch width pinned to 2 —
        // the gate passes None (inherits the session's 32); the delta
        // vs the registry's q274 row is the pure stream-floor saving.
        "q274_sp2" -> ((s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions.col
          val docs = graft.sources.Tables.documents(s, dir)
          val kept = docs.filter(col("doc_id") < 250)
          val path = SparkEntry.exitCleanedTempDir("graft_iso_q274_sp2")
          graft.streaming.StreamingOps.streamShards(s, kept, "doc_id", 3,
              stageKey = Some(s"q274_streaming_signature_index:$dir"),
              shufflePartitions = Some(2))(
            graft.streaming.StreamingOps.signatureIndexSink(path))
          graft.streaming.StreamingOps.compactSignatureIndexEpochs(s, path, keepAfter = 1L)
          graft.operators.Dedup.withNearDupAgainst(
              kept, docs.filter(col("doc_id") >= 250),
              keptSignatures =
                Some(graft.streaming.StreamingOps.mergedSignatureIndex(s, path))) {
            surv =>
              val rows = surv.orderBy("doc_id").take(250001)
              s.createDataFrame(java.util.Arrays.asList(rows: _*), surv.schema)
          }
        })) ++
      Seq(8, 4, 2).map { sp =>
        s"q240_sp$sp" -> ((s: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions.{col, min}
          val emb = graft.sources.Tables.embeddings(s, dir)
          val path = SparkEntry.exitCleanedTempDir(s"graft_iso_q240_sp$sp")
          graft.streaming.StreamingOps.streamShards(s, emb, "vec_id", 3,
              stageKey = Some(s"q240_streaming_graph_ann:$dir"),
              shufflePartitions = Some(sp))(
            graft.streaming.StreamingOps.graphAnnEdgeSink(s, path))
          graft.streaming.StreamingOps.compactGraphAnnEpochs(s, path, keepAfter = 1L)
          val (vecs, edges) = graft.streaming.StreamingOps.mergedGraphAnnState(s, path)
          val v = vecs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val entry = v.agg(min(col("vec_id"))).collect()(0).getLong(0)
          val out = graft.operators.Similarity.graphAnnSearchOverEdges(v, edges, entry)
          v.unpersist()
          out.orderBy("query_id", "rnk")
        })
      }.toMap
    names.foreach { name =>
      val fn = extras.getOrElse(name, SparkEntry.queries(name))
      // Same fences as Bench: operator-persisted intermediates from one
      // query must not squeeze the next query's execution memory.
      spark.catalog.clearCache()
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ISO $name min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
