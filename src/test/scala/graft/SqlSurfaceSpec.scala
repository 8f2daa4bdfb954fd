package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** The `spark.sql(...)` surface: every registered graft_* function must
  * evaluate through SQL and agree with its DataFrame-API twin (same
  * expression underneath — this spec guards the registration plumbing:
  * arity checks, literal-argument extraction, aggregate wrapping).
  */
class SqlSurfaceSpec extends SparkSpec {

  GraftFunctions.register(spark)

  test("scalar graft_* functions evaluate via SQL and match the DataFrame API") {
    val r = spark.sql(
      """SELECT graft_dot(array(1L, 2L), array(3L, 4L)) AS dp,
        |       graft_md5_60('x') AS h60,
        |       graft_md5_52('x') AS h52,
        |       graft_tokens('  a  b ') AS toks,
        |       graft_simhash(graft_tokens('a b a')) AS sh,
        |       graft_shingle_min(graft_tokens('a b c d'), 3) AS shmin,
        |       graft_minhash_sigs(graft_tokens('a b c d'), 3, 8) AS sigs,
        |       graft_shingle_digests(graft_tokens('a b c d'), 3) AS ds,
        |       graft_gram_stats(graft_tokens('a b a b a'), 2) AS gs
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("dp") === 11L)
    val viaDf = spark.range(1)
      .select(
        Hashing.md5Long60(lit("x")).as("h60"),
        Hashing.md5Long52(lit("x")).as("h52"))
      .collect().head
    assert(r.getAs[Long]("h60") === viaDf.getAs[Long]("h60"))
    assert(r.getAs[Long]("h52") === viaDf.getAs[Long]("h52"))
    assert(r.getSeq[String](r.fieldIndex("toks")) === Seq("a", "b"))
    assert(r.getSeq[Long](r.fieldIndex("sigs")).length === 8)
    // "a b c d" has two 3-shingles; shingle_min is a full 16-byte digest.
    assert(r.getSeq[Long](r.fieldIndex("ds")).length === 2)
    assert(r.getAs[Array[Byte]]("shmin").length === 16)
    assert(r.getAs[Long]("sh") !== 0L)
    // 4 bigrams, "a b" appears twice → top share 2/4.
    val gs = r.getAs[org.apache.spark.sql.Row]("gs")
    assert(gs.getAs[Long]("n_grams") === 4L)
    assert(gs.getAs[Long]("top_gram_cnt") === 2L)
  }

  test("graft_rolling_digests equals the composed slice/join/md5 chain, position for position") {
    // The fused expression must be digest-identical to what the DuckDB
    // oracles replay: md5_60 of each space-joined dense window, indexed
    // by start. Includes the repeated-window case (non-distinct) and the
    // too-short case (empty array).
    val r = spark.sql(
      """SELECT graft_rolling_digests(graft_tokens('a b c a b c a'), 3) AS fused,
        |       transform(sequence(0, 4),
        |                 i -> graft_md5_60(array_join(slice(graft_tokens('a b c a b c a'), i + 1, 3), ' '))) AS composed,
        |       graft_rolling_digests(graft_tokens('a b'), 3) AS short
        |""".stripMargin).collect().head
    assert(r.getSeq[Long](r.fieldIndex("fused")) === r.getSeq[Long](r.fieldIndex("composed")))
    assert(r.getSeq[Long](r.fieldIndex("fused")).length === 5)
    // Period-3 text: windows at starts 0 and 3 coincide — positions kept.
    assert(r.getSeq[Long](r.fieldIndex("fused"))(0) === r.getSeq[Long](r.fieldIndex("fused"))(3))
    assert(r.getSeq[Long](r.fieldIndex("short")).isEmpty)
  }

  test("graft_bpe_encode replays a merge table via SQL and matches the operator path") {
    // Merges in rank order: t+h → th, th+e → the.
    val r = spark.sql(
      """SELECT graft_bpe_encode('theater', array(array('t','h'), array('th','e'))) AS p,
        |       graft_bpe_encode('', array(array('a','b'))) AS empty
        |""".stripMargin).collect().head
    assert(r.getSeq[String](r.fieldIndex("p")) === Seq("the", "a", "t", "e", "r"))
    assert(r.getSeq[String](r.fieldIndex("empty")) === Seq.empty)
    // Non-foldable or malformed merge tables fail at analysis.
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bpe_encode(v, array(array(v))) FROM VALUES ('a') AS t(v)")
        .collect()
    }
    assert(err.getMessage.contains("foldable array") ||
      err.getCause != null && err.getCause.getMessage.contains("foldable array"))
  }

  test("graft_mg aggregates via SQL with the literal-k contract enforced") {
    val mg = spark.sql(
      "SELECT graft_mg(v, 4) AS m FROM VALUES ('a'), ('a'), ('a'), ('b') AS t(v)")
      .collect().head.getAs[Map[String, Long]]("m")
    assert(mg("a") === 3L)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_mg(v, v) FROM VALUES ('a') AS t(v)").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getCause != null && err.getCause.getMessage.contains("integer literal"))
  }

  test("r15 registrations: morton/hilbert keys, byte table, CDC chunks, top-k agg via SQL") {
    val r = spark.sql(
      """SELECT graft_morton(21, 3L, 5L) AS m2,
        |       graft_morton(21, 1L, 1L, 1L) AS m3,
        |       graft_hilbert(0L, 0L, 21) AS h0,
        |       graft_byte_remap('a b') AS br,
        |       graft_byte_unmap(graft_byte_remap('a b')) AS rt,
        |       graft_cdc_chunks(graft_tokens('a b c d'), 4) AS ch
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("m2") === 39L) // x=011 even bits, y=101 odd -> 100111
    assert(r.getAs[Long]("m3") === 7L)
    assert(r.getAs[Long]("h0") === 0L)
    assert(r.getAs[String]("br") === "aĠb")
    assert(r.getAs[String]("rt") === "a b")
    val chunks = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("ch"))
    assert(chunks.map(_.getAs[Long]("n_words")).sum === 4L)
    // Aggregate path: graft_topk_min groups and map-side combines in SQL.
    spark.range(100).selectExpr("id % 3 AS g", "id AS v").createOrReplaceTempView("tk")
    val agg = spark.sql(
      "SELECT g, graft_topk_min(v, 2) AS ks FROM tk GROUP BY g ORDER BY g")
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    assert(agg(0L) === Seq(0L, 3L) && agg(1L) === Seq(1L, 4L) && agg(2L) === Seq(2L, 5L))
    // The tokenizer-replay registrations run their literal-table parsers.
    val enc = spark.sql(
      """SELECT graft_wordpiece_encode('abc', array('a', '##b', '##c')) AS wp,
        |       graft_unigram_encode('abc', array(array('ab', '3'), array('c', '5'),
        |                                         array('a', '9'), array('b', '9'))) AS un
        |""".stripMargin).collect().head
    assert(enc.getSeq[String](0) === Seq("a", "##b", "##c"))
    assert(enc.getSeq[String](1) === Seq("ab", "c"))
  }

  test("graft_byte_unmap_lenient NULLs on out-of-image input; strict unmap raises") {
    // The lenient twin is the ad-hoc-SQL surface: one stray row must not
    // fail a corpus-scale scan (r15 advice). Valid inputs round-trip
    // identically to the strict function; invalid codepoints (anything
    // a remap cannot have produced, e.g. `Ǆ` U+01C4 ≥ 324) yield NULL.
    val r = spark.sql(
      """SELECT graft_byte_unmap_lenient(graft_byte_remap('a b')) AS ok,
        |       graft_byte_unmap_lenient('aǄb') AS bad,
        |       graft_byte_unmap_lenient(CAST(NULL AS STRING)) AS nul
        |""".stripMargin).collect().head
    assert(r.getAs[String]("ok") === "a b")
    assert(r.isNullAt(r.fieldIndex("bad")))
    assert(r.isNullAt(r.fieldIndex("nul")))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_byte_unmap('aǄb')").collect()
    }
    assert(err.getMessage.contains("byte-remap image") ||
      (err.getCause != null && err.getCause.getMessage.contains("byte-remap image")))
  }

  test("arity violations fail analysis, not execution") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1L))").collect()
    }
    assert(err.getMessage.contains("exactly 2") ||
      err.getCause != null && err.getCause.getMessage.contains("exactly 2"))
  }
}
