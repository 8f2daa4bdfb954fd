package graft

import org.apache.spark.sql.functions.col

import graft.operators.Curation

class CurationSpec extends SparkSpec {

  import spark.implicits._

  private def doc(id: Long, text: String, source: String = "s0") =
    (id, text, "en", source, text.length.toLong)

  test("chunkTokens produces strided overlapping windows with exact boundaries") {
    val docs = Seq(doc(0L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = Curation.chunkTokens(docs, chunkSize = 4, stride = 3)
      .orderBy("chunk_id").collect()
    // 10 tokens, starts 0/3/6/9 → lengths 4/4/4/1.
    assert(chunks.map(_.getAs[Int]("chunk_tokens")).toSeq === Seq(4, 4, 4, 1))
    assert(chunks(0).getAs[String]("chunk_text") === "t1 t2 t3 t4")
    assert(chunks(1).getAs[String]("chunk_text") === "t4 t5 t6 t7") // overlap of 1
    assert(chunks(3).getAs[String]("chunk_text") === "t10")
  }

  test("sourceQuota caps each source, preferring longer documents") {
    val docs = Seq(
      doc(0L, "a" * 10, "big"), doc(1L, "a" * 30, "big"), doc(2L, "a" * 20, "big"),
      doc(3L, "a" * 5, "small"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Curation.sourceQuota(docs, maxPerSource = 2)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Int]("rnk"), r.getAs[Long]("doc_id")))
    assert(kept.toSet === Set(("big", 1, 1L), ("big", 2, 2L), ("small", 1, 3L)))
  }

  test("hashSplit is deterministic, content-independent, and roughly proportioned") {
    val docs = (0L until 1000L).map(i => doc(i, s"text $i"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Curation.hashSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val b = Curation.hashSplit(docs.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a === b) // partitioning-independent
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac far from 80%")
  }

  test("packSequences lays docs end-to-end per shard and cuts at the budget") {
    // One shard (numShards=1), budget 10: docs of 6/7/4 tokens →
    // offsets 0, 6, 13%10=3; the 7-token doc straddles seq 0→1.
    val docs = Seq(
      doc(0L, (1 to 6).map(_ => "w").mkString(" ")),
      doc(1L, (1 to 7).map(_ => "w").mkString(" ")),
      doc(2L, (1 to 4).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val packed = Curation.packSequences(docs, budgetTokens = 10, numShards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_in_shard"), r.getAs[Long]("seq_offset")))
    assert(packed.toSeq === Seq((0L, 0L, 0L), (1L, 0L, 6L), (2L, 1L, 3L)))
  }

  test("dedupAgainst drops incoming docs whose normalized text the reference holds") {
    val reference = Seq(doc(0L, "Hello, World!"), doc(1L, "something old"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val incoming = Seq(
      doc(10L, "hello world"),     // normalized dup of reference doc 0
      doc(11L, "something new"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Curation.dedupAgainst(incoming, reference)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(kept.toSeq === Seq(11L))
  }

  test("stratifiedSample is deterministic, per-stratum, and near the target rate") {
    val docs = (0L until 2000L).map(i => doc(i, s"text $i", source = s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Curation.stratifiedSample(docs, pct = 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(docs.repartition(5), pct = 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b) // partitioning-independent
    val perSource = Curation.stratifiedSample(docs, pct = 10)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    perSource.values.foreach(n => assert(n > 50 && n < 150, s"stratum rate off: $perSource"))
  }

  test("latestSnapshot keeps exactly the ordering-first row per key") {
    import org.apache.spark.sql.functions.col
    val changelog = Seq(
      (1L, 1L, "a"), // key 1, version 1
      (1L, 3L, "c"), // key 1, latest
      (1L, 2L, "b"),
      (2L, 1L, "x")) // key 2, only row
      .toDF("k", "version", "payload")
    val snap = Curation.latestSnapshot(
      changelog, Seq(col("k")), Seq(col("version").desc, col("payload").desc))
      .orderBy("k").collect()
    assert(snap.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq((1L, 3L, "c"), (2L, 1L, "x")))
  }

  test("latestSnapshot preserves a user column named like its working column") {
    import org.apache.spark.sql.functions.col
    // A changelog that already carries `__graft_rn0` (and even `__graft_rn1`)
    // must come through untouched — the operator probes for a free name
    // instead of silently replacing-and-dropping user data.
    val changelog = Seq(
      (1L, 1L, 7L, 8L),
      (1L, 2L, 9L, 10L))
      .toDF("k", "version", "__graft_rn0", "__graft_rn1")
    val snap = Curation.latestSnapshot(changelog, Seq(col("k")), Seq(col("version").desc))
      .collect()
    assert(snap.length === 1)
    assert(snap(0).getAs[Long]("__graft_rn0") === 9L)
    assert(snap(0).getAs[Long]("__graft_rn1") === 10L)
    assert(snap(0).schema.fieldNames.toSeq === Seq("k", "version", "__graft_rn0", "__graft_rn1"))
  }

  test("admitSnapshot is idempotent: re-admitting an admitted snapshot yields nothing") {
    // The daily-pipeline invariant behind the replay-safe streaming sink:
    // once a snapshot's survivors joined the kept corpus, running the SAME
    // snapshot again admits zero docs (every survivor is now an exact dup
    // of kept; every previously-dropped doc drops for its original reason).
    def text(seed: Int): String =
      "the " + (0 until 45).map(i => s"word$seed$i").mkString(" ")
    val kept = Seq(doc(0L, text(0))).toDF("doc_id", "text", "lang", "source", "n_chars")
    val snapshot = Seq(
      doc(100L, text(0)),          // exact dup of kept
      doc(101L, text(1)),          // novel, admitted
      doc(102L, "junk"))           // fails quality
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a1 = Curation.admitSnapshot(kept, snapshot)
    assert(a1.collect().map(_.getAs[Long]("doc_id")).toSet === Set(101L))
    val a2 = Curation.admitSnapshot(kept.unionByName(a1), snapshot)
    assert(a2.isEmpty, "second admission of the same snapshot must be empty")
  }

  test("normalizedDuplicates groups case/punctuation variants raw dedup misses") {
    val docs = Seq(
      doc(0L, "Hello, World!"),
      doc(1L, "hello   world"),
      doc(2L, "HELLO WORLD."),
      doc(3L, "entirely different"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val groups = Curation.normalizedDuplicates(docs).collect()
    assert(groups.length === 2)
    val dup = groups.find(_.getAs[Long]("n_docs") == 3L).get
    assert(dup.getAs[Long]("canonical_id") === 0L)
    assert(dup.getAs[Seq[Long]]("members") === Seq(0L, 1L, 2L))
  }

  test("temperature allocation boosts small sources, sums to budget, caps at availability") {
    import org.apache.spark.sql.functions.col
    val perDoc = Seq(("A", 100L), ("B", 400L), ("C", 10000L))
      .toDF("source", "n_chars")
    // w = (10, 20, 100), denom = 130; budget 130 → quotas exactly w.
    val r = Curation.temperatureAllocation(perDoc, col("source"), col("n_chars"), 130L)
      .orderBy("grp").collect()
      .map(x => (x.getAs[String]("grp"), x.getAs[Long]("quota"), x.getAs[Long]("allocated")))
    assert(r.toSeq === Seq(("A", 10L, 10L), ("B", 20L, 20L), ("C", 100L, 100L)))
    // A holds 0.95% of chars but gets 7.7% of budget — the α=0.5 boost.
    // budget 131: one largest-remainder seat, and it goes to C (rem 100).
    val r2 = Curation.temperatureAllocation(perDoc, col("source"), col("n_chars"), 131L)
      .orderBy("grp").collect().map(x => x.getAs[String]("grp") -> x.getAs[Long]("quota")).toMap
    assert(r2 === Map("A" -> 10L, "B" -> 20L, "C" -> 101L))
    // Tiny source: quota can exceed availability; allocated is capped.
    val tiny = Seq(("A", 1L), ("B", 10000L)).toDF("source", "n_chars")
    val r3 = Curation.temperatureAllocation(tiny, col("source"), col("n_chars"), 1010L)
      .orderBy("grp").collect()
      .map(x => (x.getAs[String]("grp"), x.getAs[Long]("quota"), x.getAs[Long]("allocated")))
    assert(r3.toSeq === Seq(("A", 10L, 1L), ("B", 1000L, 1000L)))
  }

  test("uniform per-group sample draws exactly k, deterministically, content-independently") {
    import org.apache.spark.sql.functions.col
    val docs = ((0 until 30).map(i => doc(i.toLong, s"text $i", "big")) ++
      (100 until 103).map(i => doc(i.toLong, s"text $i", "small")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val s1 = Curation.uniformSamplePerGroup(docs, col("source"), col("doc_id"), k = 5)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(s1.count(_._1 == "big") === 5)   // exactly k where |group| >= k
    assert(s1.count(_._1 == "small") === 3) // whole group where |group| < k
    // Deterministic: same draw every run.
    val s2 = Curation.uniformSamplePerGroup(docs, col("source"), col("doc_id"), k = 5)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(s1 === s2)
    // Content-independent: editing text changes nothing (the rank hashes
    // the ID) — the property that keeps samples stable across re-crawls.
    val edited = docs.withColumn("text", org.apache.spark.sql.functions.upper(col("text")))
    val s3 = Curation.uniformSamplePerGroup(edited, col("source"), col("doc_id"), k = 5)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(s3 === s1)
    // Different salt → a different (still exact-k) draw.
    val s4 = Curation.uniformSamplePerGroup(docs, col("source"), col("doc_id"), k = 5, salt = "other")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(s4.count(_._1 == "big") === 5)
    assert(s4 !== s1)
  }

  test("bloom-accelerated dedup returns exactly the plain anti-join's rows") {
    val kept = (0L until 50L).map(i => doc(i, s"kept document number $i with words"))
    val snap = (50L until 120L).map(i =>
      if (i % 7 == 0) doc(i, s"kept document number ${i % 50} with words") // true dup
      else doc(i, s"novel document number $i with fresh words"))
    val keptDf = kept.toDF("doc_id", "text", "lang", "source", "n_chars")
    val snapDf = snap.toDF("doc_id", "text", "lang", "source", "n_chars")
    val plain = Curation.dedupAgainst(snapDf, keptDf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = Curation.bloomDedupAgainst(snapDf, keptDf, broadcastFilter = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("needed_exact_check"))
    assert(bloom.map(_._1).toSet === plain) // sketch never changes the answer
    // The filter actually prunes: most novel rows skip the exact join
    // (1984 bits for 50 keys, 3 probes → FPR well under 1%).
    val pruned = bloom.count(!_._2)
    assert(pruned > bloom.length / 2, s"only $pruned of ${bloom.length} rows skipped the join")
    // The shuffle-probe path (filter unbounded by the broadcast budget)
    // returns the same rows AND the same deterministic flags.
    val shuffled = Curation.bloomDedupAgainst(snapDf, keptDf, broadcastFilter = false)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("needed_exact_check"))
    assert(shuffled.toMap === bloom.toMap)
  }

  test("bloom word tables merge across snapshots to the union corpus's table") {
    val a = (0L until 40L).map(i => doc(i, s"alpha document $i body"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b = (30L until 80L).map(i => doc(i, s"beta document $i body"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def words(df: org.apache.spark.sql.DataFrame) =
      Curation.bloomWordTable(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Curation.mergeBloomWordTables(
      Seq(Curation.bloomWordTable(a), Curation.bloomWordTable(b)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === words(a.unionByName(b)), "merge != whole-corpus table")
    // bit_or idempotence: re-merging a snapshot changes nothing.
    val remerged = Curation.mergeBloomWordTables(
      Seq(Curation.bloomWordTable(a), Curation.bloomWordTable(b), Curation.bloomWordTable(a)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(remerged === merged)
  }

  test("sequential bloom snapshots leave no cached tables behind") {
    // The operator must not park persisted state in the session (the
    // old design cached the word table and told callers to
    // clearCache() — which evicts unrelated data too). An incremental
    // caller who WANTS a persisted, merged filter passes it via
    // bloomDedupAgainstWith and owns the single unpersist.
    val before = spark.sparkContext.getPersistentRDDs.size
    val kept = (0L until 30L).map(i => doc(i, s"kept snapshot doc $i"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    (1 to 2).foreach { day =>
      val snap = (100L * day until 100L * day + 20L)
        .map(i => doc(i, s"day $day crawl doc $i"))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      Curation.bloomDedupAgainst(snap, kept, broadcastFilter = true).collect()
      Curation.bloomDedupAgainst(snap, kept, broadcastFilter = false).collect()
    }
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "bloomDedupAgainst leaked session-scoped cached tables")
    // The caller-managed form: persist, probe, release — net zero.
    val words = Curation.bloomWordTable(kept)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val snap = (500L until 520L).map(i => doc(i, s"handle crawl doc $i"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val viaHandle = Curation.bloomDedupAgainstWith(snap, kept, words)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val direct = Curation.bloomDedupAgainst(snap, kept)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(viaHandle === direct)
    words.unpersist(blocking = true)
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }

  test("bloom filter stays executor-side at 2^20 bits over 1e5 kept docs") {
    import org.apache.spark.sql.functions.col
    // A sized filter must never be collected to the driver or inlined
    // as a SQL array literal (at 10^9 kept docs that literal is ~1.2 GB
    // parsed per probe expression): the word table stays a DataFrame
    // and reaches the probes through broadcast joins.
    val bits = 16901L * 62L // ≈ 2^20, multiple of 62
    def docs(lo: Long, hi: Long, tag: String) = spark.range(lo, hi).selectExpr(
      "id AS doc_id", s"concat('$tag doc ', id, ' body words') AS text",
      "'en' AS lang", "'s' AS source", "CAST(24 AS BIGINT) AS n_chars")
    val out = Curation.bloomDedupAgainst(
      docs(0L, 20000L, "novel"), docs(100000L, 200000L, "kept"), bits = bits,
      broadcastFilter = true)
    val audit = PlanAudit(out)
    // No literal filter in the plan: a 16901-element array literal would
    // put `element_at` probes and a megabyte-scale plan string here.
    assert(!audit.planString.contains("element_at"), "literal word-array probe found")
    assert(audit.planString.length < 200000,
      s"plan string is ${audit.planString.length} chars — literal-sized")
    // All 20k incoming rows are novel; with n=1e5 keys, m≈2^20 bits,
    // k=3 probes the predicted FPR is (1-e^{-kn/m})^3 ≈ 1.5%. Everything
    // comes back (no false negatives), and only ~FPR pay the join.
    val rows = out.select(col("doc_id"), col("needed_exact_check")).collect()
    assert(rows.length === 20000)
    val paid = rows.count(_.getAs[Boolean]("needed_exact_check"))
    assert(paid < 20000 * 0.05, s"FPR too high: $paid / 20000 paid the exact join")
    // The shuffle-probe path at the same sizing: identical answer and
    // flags without ever broadcasting the filter — the path that stays
    // open when the word table outgrows the broadcast budget.
    val out2 = Curation.bloomDedupAgainst(
      docs(0L, 20000L, "novel"), docs(100000L, 200000L, "kept"),
      bits = bits, broadcastFilter = false)
    val rows2 = out2.select(col("doc_id"), col("needed_exact_check")).collect()
    assert(rows2.length === 20000)
    assert(rows2.map(r => r.getLong(0) -> r.getBoolean(1)).toMap ===
      rows.map(r => r.getLong(0) -> r.getBoolean(1)).toMap)
  }

  test("curationFunnel aggregates verdicts, boilerplate volume, and split mix per source") {
    val boiler = "the aaa bbb ccc"
    val core = (0 until 44).map(i => s"wrd$i").mkString(" ")
    val other = (0 until 44).map(i => s"oth$i").mkString(" ")
    val docs = Seq(
      (0L, s"$boiler $core", "en", "sA", 100L),
      (1L, s"$boiler $core", "en", "sA", 100L),  // dup of 0 after cleaning
      (2L, s"$boiler $other", "en", "sB", 100L),
      (3L, "x y", "en", "sB", 3L))               // quality reject
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.curationFunnel(docs, passageLen = 4, maxDocFreq = 2)
      .orderBy("source").collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("sA").getAs[Long]("n_docs") === 2L)
    assert(r("sA").getAs[Long]("n_kept") === 1L)
    assert(r("sA").getAs[Long]("n_dropped_duplicate") === 1L)
    assert(r("sA").getAs[Long]("n_rejected_quality") === 0L)
    assert(r("sB").getAs[Long]("n_docs") === 2L)
    assert(r("sB").getAs[Long]("n_kept") === 1L)
    assert(r("sB").getAs[Long]("n_rejected_quality") === 1L)
    // Split columns partition the keepers.
    val kept = r.values.map(_.getAs[Long]("n_kept")).sum
    val splits = r.values.map(x =>
      x.getAs[Long]("n_train") + x.getAs[Long]("n_val") + x.getAs[Long]("n_test")).sum
    assert(splits === kept)
  }

  test("tokenBudgetSelect: distributed prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // Random scores with heavy ties (ties exercise the doc_id tie-break
    // across partition boundaries) and costs in [1, 50].
    val items = spark.range(2000).select(
      col("id"),
      pmod(hash(col("id")), lit(20)).cast("long").as("score"),
      (pmod(hash(col("id") * 7), lit(50)) + 1).cast("long").as("cost"))
    val total = items.agg(sum("cost")).collect()(0).getLong(0)
    val budget = total / 2
    val naive = items
      .withColumn(
        "cum_cost",
        sum(col("cost")).over(Window.orderBy(col("score").desc, col("id"))))
      .filter(col("cum_cost") <= budget)
      .select(col("id"), col("score"), col("cost"), col("cum_cost"))
      .collect().map(_.toSeq).toSet
    val dist = Curation.tokenBudgetSelect(
      items, col("id"), col("score"), col("cost"), budget, numPartitions = 8)
      .collect().map(_.toSeq).toSet
    assert(dist === naive)
    assert(dist.nonEmpty && dist.size < 2000)
    // Degenerate budgets.
    assert(Curation.tokenBudgetSelect(
      items, col("id"), col("score"), col("cost"), 0L, numPartitions = 8).isEmpty)
    assert(Curation.tokenBudgetSelect(
      items, col("id"), col("score"), col("cost"), total, numPartitions = 8)
      .count() === 2000L)
  }

  test("tokenBudgetSelect: the corpus crosses one range exchange (totals subtree reuses it)") {
    import org.apache.spark.sql.functions._
    val items = spark.range(5000).select(
      col("id"),
      pmod(hash(col("id")), lit(100)).cast("long").as("score"),
      lit(1L).as("cost"))
    val out = Curation.tokenBudgetSelect(
      items, col("id"), col("score"), col("cost"), 2500L, numPartitions = 8)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    val rangeExchanges =
      "Exchange rangepartitioning".r.findAllIn(p).size
    assert(
      p.contains("ReusedExchange") || rangeExchanges <= 1,
      s"totals subtree no longer reuses the corpus range exchange " +
        s"($rangeExchanges range exchanges, no ReusedExchange):\n$p")
  }

  test("deterministicShuffle: per-shard 1..n positions, partitioning-independent, salt-sensitive") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(500).toDF("doc_id")
    def runOn(df: org.apache.spark.sql.DataFrame, salt: String) =
      Curation.deterministicShuffle(df, col("doc_id"), numShards = 8, salt = salt)
        .select("doc_id", "shard", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val a = runOn(docs, "graft")
    // Same result from a different input partitioning.
    assert(runOn(docs.repartition(13), "graft") === a)
    // Every doc appears exactly once; positions are dense 1..n per shard.
    assert(a.map(_._1) === (0L until 500L))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.size.toLong))
    }
    // A different salt draws a different permutation (some doc moves).
    assert(runOn(docs, "other") !== a)
  }

  test("materializeRepeats: whole copies + hash-chosen fractional copy, deterministic") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(1000).select(
      col("id").as("doc_id"),
      when(col("id") < 500, "up").otherwise("down").as("source"))
    val factors = Seq(("up", 2500000L), ("down", 700000L)).toDF("grp", "factor_ppm")
    val out = Curation.materializeRepeats(docs, "source", col("doc_id"), factors)
      .collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    // "up" docs: 2 or 3 copies with dense copy_id 1..n; ~half get the
    // third copy (md5 coin, 500 draws at p=0.5 — 4σ ≈ 45).
    val upCounts = (0L until 500L).map(d => byDoc(d).length)
    assert(upCounts.forall(n => n == 2 || n == 3))
    assert(math.abs(upCounts.count(_ == 3) - 250) < 100)
    byDoc.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("copy_id")).sorted.toSeq === (1L to rows.length.toLong))
      assert(rows.head.getAs[Long]("n_copies") === rows.length.toLong)
    }
    // "down" docs: 0 or 1 copies, ~70% kept; zero-copy docs are absent.
    val downDocs = (500L until 1000L).filter(byDoc.contains)
    assert(downDocs.forall(d => byDoc(d).length == 1))
    assert(math.abs(downDocs.size - 350) < 100)
    // Deterministic: identical on re-run; a different salt moves the draw.
    val again = Curation.materializeRepeats(docs, "source", col("doc_id"), factors)
      .collect().map(_.toSeq).toSet
    assert(again === out.map(_.toSeq).toSet)
    val other = Curation.materializeRepeats(docs, "source", col("doc_id"), factors, salt = "x")
      .collect().map(_.toSeq).toSet
    assert(other !== out.map(_.toSeq).toSet)
  }

  test("lengthBucketBatches: bucketed size-ordered batches with exact padding accounting") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(300).select(
      col("id"), (pmod(hash(col("id")), lit(100)) + 1).cast("long").as("n_tokens"))
    val out = Curation.lengthBucketBatches(
      docs, col("id"), col("n_tokens"),
      boundaries = Seq(25L, 50L, 75L), batchSize = 8, numShards = 4)
      .collect()
    assert(out.length === 300)
    out.foreach { r =>
      val (n, b) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("bucket"))
      assert(b === Seq(25L, 50L, 75L).count(n >= _), s"bucket wrong for n=$n")
      assert(r.getAs[Long]("pad_waste") === r.getAs[Long]("batch_max") - n)
      assert(r.getAs[Long]("pad_waste") >= 0)
    }
    out.groupBy(r => (r.getAs[Long]("bucket"), r.getAs[Long]("shard"), r.getAs[Long]("batch_id")))
      .foreach { case ((_, _, bid), rows) =>
        assert(rows.length <= 8)
        assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq === (0L until rows.length.toLong))
        assert(rows.map(_.getAs[Long]("batch_max")).distinct.length === 1)
        assert(rows.map(_.getAs[Long]("n_tokens")).max === rows.head.getAs[Long]("batch_max"))
      }
    // Size-ordered within a (bucket, shard) cell: batch i's max never
    // exceeds batch i+1's min — padding stays local to a batch.
    out.groupBy(r => (r.getAs[Long]("bucket"), r.getAs[Long]("shard"))).foreach {
      case (_, rows) =>
        val byBatch = rows.groupBy(_.getAs[Long]("batch_id")).toSeq.sortBy(_._1)
        byBatch.sliding(2).foreach {
          case Seq((_, a), (_, b)) =>
            assert(a.map(_.getAs[Long]("n_tokens")).max <= b.map(_.getAs[Long]("n_tokens")).min)
          case _ => ()
        }
    }
  }

  test("curateCorpus composes quality, boilerplate removal, exact dedup, and split") {
    // 4-word boilerplate B shared by three docs (df=3 > maxDocFreq=2 →
    // stripped); docs 0 and 1 share a 44-word core (df=2 → survives), so
    // AFTER cleaning they are exact duplicates and doc 1 drops.
    val boiler = "the aaa bbb ccc"
    val core = (0 until 44).map(i => s"wrd$i").mkString(" ")
    val other = (0 until 44).map(i => s"oth$i").mkString(" ")
    val docs = Seq(
      doc(0L, s"$boiler $core"),
      doc(1L, s"$boiler $core"),
      doc(2L, s"$boiler $other"),
      doc(3L, "x y")) // fails the quality length rule
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.curateCorpus(docs, passageLen = 4, maxDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("verdict")).toSeq ===
      Seq("kept", "dropped_duplicate", "kept", "rejected_quality"))
    assert(out(0).getAs[Long]("n_dropped_passages") === 1L) // just the boilerplate
    assert(out(0).getAs[String]("split") != null)
    assert(out(1).getAs[Long]("dup_of") === 0L)
    assert(out(1).getAs[String]("split") === null)
    assert(out(3).getAs[String]("reject_reasons") === "length,word_shape,no_stopwords")
    assert(out(3).getAs[String]("split") === null)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by digest") {
    val oldSnap = Seq(
      doc(0L, "same text"),
      doc(1L, "before edit"),
      doc(2L, "will be deleted"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val newSnap = Seq(
      doc(0L, "same text"),
      doc(1L, "after edit"),
      (3L, "brand new", "en", "s9", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.snapshotDiff(oldSnap, newSnap).orderBy("key").collect()
    val byKey = r.map(x => x.getAs[Long]("key") -> x.getAs[String]("status")).toMap
    assert(byKey === Map(0L -> "unchanged", 1L -> "changed", 2L -> "removed", 3L -> "added"))
    // Added rows take their source from the new side; removed from the old.
    assert(r.find(_.getAs[Long]("key") == 3L).get.getAs[String]("source") === "s9")
    assert(r.find(_.getAs[Long]("key") == 2L).get.getAs[String]("source") === "s0")
  }

  test("snapshotDelta carries payloads; applyChanges reproduces the new snapshot, idempotently") {
    val oldSnap = Seq(
      doc(0L, "same text"),
      doc(1L, "before edit"),
      doc(2L, "will be deleted"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val newSnap = Seq(
      doc(0L, "same text"),
      doc(1L, "after edit"),
      (3L, "brand new", "en", "s9", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val delta = Curation.snapshotDelta(oldSnap, newSnap)
    val d = delta.orderBy("doc_id").collect()
    // Delta-sized: unchanged keys absent; payloads from the NEW side,
    // key-only (NULL payload) for removed.
    assert(d.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L))
    assert(d.map(_.getAs[String]("status")).toSeq === Seq("changed", "removed", "added"))
    assert(d.find(_.getAs[Long]("doc_id") == 1L).get.getAs[String]("text") === "after edit")
    assert(d.find(_.getAs[Long]("doc_id") == 2L).get.getAs[String]("text") === null)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq
    // Full-recompute equivalence: apply(old, delta(old, new)) == new.
    val applied = Curation.applyChanges(oldSnap, delta)
    assert(rows(applied) === rows(newSnap))
    // Idempotent reapply: the same delta applied to the result is a no-op.
    assert(rows(Curation.applyChanges(applied, delta)) === rows(newSnap))
    // Bounded-delta broadcast path is plan-only, results identical.
    assert(rows(Curation.applyChanges(oldSnap, delta, deltaBounded = true)) === rows(newSnap))
  }

  test("rendezvousShard: minimal disruption on growth, deterministic, reasonably balanced") {
    import org.apache.spark.sql.functions.col
    val keys = (0L until 600L).toDF("k")
    def shards(n: Int) = Curation.rendezvousShard(keys, col("k").cast("string"), n)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Int]("shard")).toMap
    val s5 = shards(5); val s6 = shards(6)
    // HRW property: a key moves ONLY to the newly added shard.
    val moved = s5.keys.filter(k => s5(k) != s6(k))
    assert(moved.nonEmpty, "some keys must move to the new shard")
    assert(moved.forall(k => s6(k) == 5), "every moved key must land on the NEW shard")
    // Expected movement ~1/6 of keys; allow a wide band.
    assert(moved.size > 600 / 12 && moved.size < 600 / 3, s"moved ${moved.size} of 600")
    // Determinism + bounds + single-shard degenerate case.
    assert(shards(5) === s5)
    assert(s6.values.forall(v => v >= 0 && v < 6))
    assert(shards(1).values.forall(_ == 0))
    // Balance sanity: no shard holds more than 2x its fair share.
    val byShard = s6.values.groupBy(identity).map(_._2.size)
    assert(byShard.max <= 200, s"imbalanced: $byShard")
  }

  test("systematicWeightedSample: exactly k strata hits, heavy docs multi-picked") {
    // Telescoping: summed n_picks over kept rows is floor(T·k/T) −
    // floor(0·k/T) = k, independent of the weight layout.
    val docs = (0L until 40L).map(i => (i, if (i == 7L) 500L else 10L))
      .toDF("doc_id", "w_in")
    for (k <- Seq(1, 5, 10)) {
      val r = Curation.systematicWeightedSample(
        docs, col("doc_id"), col("w_in"), k = k).collect()
      assert(r.map(_.getAs[Long]("n_picks")).sum === k.toLong, s"k=$k")
    }
    // Doc 7 holds 500/890 > 1/2 of the weight: with k=10 it must span
    // multiple strata.
    val r10 = Curation.systematicWeightedSample(
      docs, col("doc_id"), col("w_in"), k = 10).collect()
    val heavy = r10.find(_.getAs[Long]("id") == 7L).get
    assert(heavy.getAs[Long]("n_picks") >= 5L)
  }

  test("systematicWeightedSample is partitioning-invariant and deterministic") {
    val docs = (0L until 100L).map(i => (i, 1L + i % 13L)).toDF("doc_id", "w_in")
    def run(np: Int) = Curation.systematicWeightedSample(
      docs, col("doc_id"), col("w_in"), k = 9, numPartitions = np)
      .orderBy("cum_w").collect().map(x =>
        (x.getAs[Long]("id"), x.getAs[Long]("cum_w"), x.getAs[Long]("n_picks"))).toSeq
    val base = run(1)
    assert(run(7) === base)   // range partitioning must not move the strata
    assert(run(32) === base)
    assert(run(7) === run(7)) // and reruns reproduce bit-identically
  }

  test("systematicWeightedSample never picks zero-weight docs") {
    val docs = (0L until 20L).map(i => (i, if (i % 2 == 0) 0L else 5L))
      .toDF("doc_id", "w_in")
    val r = Curation.systematicWeightedSample(docs, col("doc_id"), col("w_in"), k = 4)
      .collect()
    assert(r.map(_.getAs[Long]("n_picks")).sum === 4L)
    assert(r.forall(_.getAs[Long]("id") % 2 == 1))
  }

  test("kAnonymityAudit flags small groups and homogeneous sensitive values") {
    val rows =
      // g1: 6 members, both sensitive values → safe.
      (1 to 6).map(i => ("g1", if (i <= 2) "x" else "y")) ++
        // g2: 3 members, diverse — still at risk (cnt < k).
        (1 to 3).map(i => ("g2", if (i == 1) "x" else "y")) ++
        // g3: 7 members, ALL the same sensitive value → homogeneity risk.
        (1 to 7).map(_ => ("g3", "x")) ++
        // g4: 6 members, sensitive entirely NULL — l_diversity counts 0
        // distinct values but the group is still homogeneous ("unknown"
        // for everyone) and must flag.
        (1 to 6).map(_ => ("g4", null: String))
    val df = rows.toDF("q", "sens")
    val out = Curation.kAnonymityAudit(df, Seq(col("q")), col("sens"))
      .collect().map(r => r.getAs[String]("q") -> r).toMap
    assert(out("g1").getAs[Long]("cnt") === 6L)
    assert(out("g1").getAs[Long]("l_diversity") === 2L)
    assert(!out("g1").getAs[Boolean]("at_risk"))
    assert(out("g2").getAs[Long]("cnt") === 3L)
    assert(out("g2").getAs[Boolean]("at_risk"), "count below k")
    assert(out("g3").getAs[Long]("cnt") === 7L)
    assert(out("g3").getAs[Long]("l_diversity") === 1L)
    assert(out("g3").getAs[Boolean]("at_risk"), "homogeneous sensitive value")
    assert(out("g4").getAs[Long]("l_diversity") === 0L)
    assert(out("g4").getAs[Boolean]("at_risk"), "all-NULL sensitive is homogeneous")
  }

  test("maintainAggregate: delta merge equals recompute; zero groups vanish, negatives stay visible") {
    // State a:(2,10) c:(1,4). Changes: a gains 5 and loses 3 -> (2,12);
    // b is born -> (1,7); c deletes to zero -> VANISHES; d deletes what
    // was never inserted -> (-1,-9) kept visible, not clamped.
    val state = Seq(("a", 2L, 10L), ("c", 1L, 4L)).toDF("grp", "n", "sum_x")
    val changes = Seq(
      ("a", 5L, "insert"), ("a", 3L, "delete"),
      ("b", 7L, "insert"),
      ("c", 4L, "delete"),
      ("d", 9L, "delete"))
      .toDF("grp", "x", "op")
    val out = Curation.maintainAggregate(state, changes).collect()
      .map(r => r.getAs[String]("grp") -> (r.getAs[Long]("n"), r.getAs[Long]("sum_x"))).toMap
    assert(out === Map("a" -> ((2L, 12L)), "b" -> ((1L, 7L)), "d" -> ((-1L, -9L))))
    // Untouched groups pass through unchanged.
    val quiet = Curation.maintainAggregate(state, Seq(("b", 1L, "insert")).toDF("grp", "x", "op"))
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("n")).toMap
    assert(quiet === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }

  test("paretoFrontier: hand-computed skyline keeps ties only as exact duplicates") {
    // (cost, value): lower cost better, higher value better.
    //  1:(1,5) frontier; 2:(2,5) dominated by 1 (equal value, dearer);
    //  3:(2,7) frontier; 4:(3,7) dominated by 3; 5/6:(3,9) duplicate
    //  frontier pair (neither dominates the other); 7:(4,8) dominated
    //  by 5; 8:(4,10) frontier.
    val df = Seq(
      (1L, 1L, 5L), (2L, 2L, 5L), (3L, 2L, 7L), (4L, 3L, 7L),
      (5L, 3L, 9L), (6L, 3L, 9L), (7L, 4L, 8L), (8L, 4L, 10L))
      .toDF("pid", "c0", "v0")
    val out = Curation.paretoFrontier(df, col("pid"), col("c0"), col("v0"), grid = 2)
      .collect().map(_.getAs[Long]("id")).sorted
    assert(out.toSeq === Seq(1L, 3L, 5L, 6L, 8L))
  }

  test("paretoFrontier: grid prune is lossless vs the brute-force dominance join") {
    // 200 deterministic points with heavy ties; a coarse grid stresses
    // the prune (more survivors, same frontier).
    val pts = (0 until 200).map { i =>
      val c = (i * 37 % 50).toLong
      (i.toLong, c, (i * 91 + c * 13) % 40L)
    }
    for (g <- Seq(2, 8, 64)) {
      val fast = Curation.paretoFrontier(
          pts.toDF("pid", "c0", "v0"), col("pid"), col("c0"), col("v0"), grid = g)
        .collect().map(_.getAs[Long]("id")).sorted
      val brute = pts.filter { case (_, c, v) =>
        !pts.exists { case (_, c2, v2) => c2 <= c && v2 >= v && (c2 < c || v2 > v) }
      }.map(_._1).sorted
      assert(fast.toSeq === brute, s"grid=$g")
    }
  }
}
