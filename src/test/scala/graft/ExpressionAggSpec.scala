package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Specs for the round-15 codegen/aggregate expressions:
  * [[graft.expressions.MortonIndex]] (d-dimensional Z-order interleave)
  * and [[graft.expressions.TopKMin]] (bounded map-side k-smallest).
  */
class ExpressionAggSpec extends SparkSpec {
  import spark.implicits._

  private val bridge = org.apache.spark.sql.graft.bridge

  test("MortonIndex 3-D: bit i of dim j lands at position i*d+j; anchors + round-trip") {
    // d=3: x at positions 0,3,6..., y at 1,4,7..., z at 2,5,8...
    val df = Seq(
      (0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (1L, 1L, 1L), (2L, 0L, 0L), (0L, 2L, 0L), (5L, 3L, 6L))
      .toDF("x", "y", "z")
      .withColumn("m", graft.sources.Sinks.zValueN(Seq("x", "y", "z")))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getAs[Long]("m")).toMap
    def ref(x: Long, y: Long, z: Long): Long = {
      var m = 0L
      for (i <- 0 until 21; (v, j) <- Seq((x, 0), (y, 1), (z, 2)))
        m |= ((v >> i) & 1L) << (i * 3 + j)
      m
    }
    got.foreach { case ((x, y, z), m) =>
      assert(m === ref(x, y, z), s"morton3($x, $y, $z)")
    }
    assert(got((1L, 0L, 0L)) === 1L && got((0L, 1L, 0L)) === 2L && got((0L, 0L, 1L)) === 4L)
    assert(got((1L, 1L, 1L)) === 7L && got((2L, 0L, 0L)) === 8L)
  }

  test("MortonIndex: 2-D zValue equals the retired SQL fold; null in -> null out") {
    val df = Seq((3L, 5L), (1234567L, 7654321L), (0L, (1L << 21) - 1L))
      .toDF("zx", "zy")
      .withColumn("m", graft.sources.Sinks.zValue("zx", "zy"))
      .withColumn("legacy", expr(
        "aggregate(sequence(0, 20), CAST(0 AS BIGINT), (acc, i) -> " +
          "acc + (((zx >> i) & 1) << (2 * i)) + (((zy >> i) & 1) << (2 * i + 1)))"))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("m") === r.getAs[Long]("legacy"),
        s"zValue(${r.getLong(0)}, ${r.getLong(1)}) diverged from the SQL fold")
    }
    val withNull = Seq((Some(3L), None: Option[Long]), (None, Some(5L)), (Some(1L), Some(1L)))
      .toDF("zx", "zy").withColumn("m", graft.sources.Sinks.zValue("zx", "zy"))
      .select("m").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(withNull.toSeq === Seq(None, None, Some(3L)))
  }

  test("TopKMin: equals the row_number-window k-smallest on skewed random groups") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 4000).map { i =>
      (s"g${i % 7}", rnd.nextLong() % 1000L)
    } ++ Seq(("tiny", 3L), ("tiny", 1L)) // a group with fewer than k rows
    val df = rows.toDF("g", "v").repartition(8) // force multi-partition merge
    val k = 5
    val agg = df.groupBy(col("g"))
      .agg(bridge.column(graft.expressions.TopKMin(
        bridge.expression(col("v")), k).toAggregateExpression()).as("arr"))
      .select(col("g"), col("arr"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val w = Window.partitionBy(col("g")).orderBy(col("v"))
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(col("g")).agg(sort_array(collect_list(col("v"))).as("arr"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(agg.keySet === win.keySet)
    agg.foreach { case (g, arr) =>
      assert(arr === win(g), s"group $g: TopKMin diverged from the window k-smallest")
      assert(arr === arr.sorted, s"group $g: output not ascending")
    }
    assert(agg("tiny") === Seq(1L, 3L))
  }

  test("HilbertIndexN: 3-D bits=2 is a continuous bijection (the Hilbert property); 1-D planes anchor") {
    // Every (x,y,z) in the 4^3 grid maps to a distinct index in [0, 64)
    // and CONSECUTIVE indices are Manhattan-adjacent cells — only a
    // genuine Hilbert walk satisfies both.
    val cells = for (x <- 0L until 4L; y <- 0L until 4L; z <- 0L until 4L)
      yield (x, y, z)
    val idx = cells.map { case (x, y, z) =>
      graft.expressions.HilbertIndexN.compute(Array(x, y, z), 2) -> (x, y, z)
    }.toMap
    assert(idx.size === 64, "3-D index must be injective over the grid")
    assert(idx.keySet === (0L until 64L).toSet, "3-D index must cover [0, 64)")
    (0L until 63L).foreach { h =>
      val (x1, y1, z1) = idx(h)
      val (x2, y2, z2) = idx(h + 1)
      val dist = math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2)
      assert(dist === 1, s"steps $h -> ${h + 1} not adjacent: $idx")
    }
    // 4-D, bits=1: the 2^4 hypercube corners must also form a
    // Hamiltonian path (dimension-generic Hilbert property).
    val corners = (0L until 16L).map { m =>
      Array(0, 1, 2, 3).map(i => (m >> i) & 1L)
    }
    val idx4 = corners.map(c =>
      graft.expressions.HilbertIndexN.compute(c.clone(), 1) -> c.toSeq).toMap
    assert(idx4.keySet === (0L until 16L).toSet, "4-D bits=1 must be a bijection")
    (0L until 15L).foreach { h =>
      val d = idx4(h).zip(idx4(h + 1)).map { case (a, b) => math.abs(a - b) }.sum
      assert(d === 1, s"4-D steps $h -> ${h + 1} not adjacent")
    }
    // Column path agrees with the plain-Scala compute.
    val viaCol = Seq((1L, 2L, 3L), (0L, 0L, 0L), (3L, 3L, 3L)).toDF("x", "y", "z")
      .withColumn("h", bridge.column(graft.expressions.HilbertIndexN(
        Seq("x", "y", "z").map(c => bridge.expression(col(c))), 2)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
    viaCol.foreach { case ((x, y, z), h) =>
      assert(h === graft.expressions.HilbertIndexN.compute(Array(x, y, z), 2))
    }
  }

  test("ByteRemap: GPT-2 bytes_to_unicode — identity on printables, space->Ġ, total+injective") {
    val t = graft.expressions.ByteRemap.table
    // Printable ASCII keeps its codepoint; the excluded bytes shift to 256+n
    // in ascending byte order (so space, the 33rd excluded byte from 0, is
    // U+0120 Ġ — the marker every GPT-2-family vocab shows).
    ('!' to '~').foreach(c => assert(t(c.toInt) === c))
    assert(t(' '.toInt) === 'Ġ')
    assert(t(0) === 'Ā' && t('\n'.toInt) === 'Ċ' && t(127) === 'ġ')
    assert(t.distinct.length === 256, "byte table must be injective")
    // Column-level: remap is per-UTF-8-BYTE (é = 2 bytes -> 2 chars).
    val out = Seq(("a b", 1), ("é", 2)).toDF("s", "id")
      .withColumn("r", bridge.column(graft.expressions.ByteRemap(
        bridge.expression(col("s")))))
      .orderBy("id").collect().map(_.getString(2))
    assert(out(0) === "aĠb")
    assert(out(1).length === 2 && out(1) === "Ã©") // 0xC3 0xA9 kept bytes
  }

  test("byte-level BPE: trainer equals a plain-Scala model on pretokenized+remapped text") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en", "t"),
      (2L, "the cats sat", "en", "t"),
      (3L, "on the mat the cat sat", "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val merges = graft.functions.TextAnalysis.byteBpeTrainMerges(docs, numMerges = 4)
    // Plain-Scala twin: regex pretokenize, remap space->Ġ, greedy merges.
    val pat = graft.functions.TextAnalysis.BytePretokenPattern.r
    val pretoks = Seq("the cat sat on the mat", "the cats sat", "on the mat the cat sat")
      .flatMap(t => pat.findAllIn(t).toSeq)
      .map(_.map(c => graft.expressions.ByteRemap.table(c.toInt)).mkString)
    var vocab = pretoks.filter(_.length >= 2).groupBy(identity)
      .map { case (w, g) => (w.map(_.toString).toList, g.size.toLong) }.toArray
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 0 until 4) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, wc) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + wc) }
      val ((c1, c2), cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      expect += ((rank, c1, c2, cnt))
      vocab = vocab.map { case (syms, wc) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: tl if a == c1 && b == c2 => out += (c1 + c2); rest = tl
          case a :: tl => out += a; rest = tl
          case Nil =>
        }
        (out.toList, wc)
      }
    }
    assert(merges === expect.toSeq)
    // Encode round-trip: concatenated pieces reproduce the remapped pretoken.
    val enc = graft.functions.TextAnalysis.byteBpeEncode(docs, merges)
      .select(col("w"), concat_ws("", col("pieces")).as("joined")).collect()
    enc.foreach(r => assert(r.getString(0) === r.getString(1),
      "byte-level pieces must concatenate back to the pre-token (no byte lost)"))
  }

  test("byte-BPE pre-token patterns: RE2-safe gate pattern ≡ true GPT-2 pattern on single-spaced text") {
    import graft.functions.TextAnalysis.{BytePretokenPattern, BytePretokenPatternGpt2}
    val gate = java.util.regex.Pattern.compile(BytePretokenPattern)
    val gpt2 = java.util.regex.Pattern.compile(BytePretokenPatternGpt2)
    def toks(p: java.util.regex.Pattern, s: String): Seq[String] = {
      val m = p.matcher(s)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toSeq
    }
    // Equivalence domain: no consecutive whitespace — the entire gate
    // corpus (and both patterns always PARTITION the input: every char
    // lands in exactly one pre-token).
    val singleSpaced = Seq(
      "the cat sat", "it's fine, really!", "a1 b2 3c", "word", " leading",
      "trailing ", "punct... dashes-and_scores 42")
    singleSpaced.foreach { s =>
      assert(toks(gate, s) === toks(gpt2, s), s"patterns diverged on single-spaced: '$s'")
      assert(toks(gate, s).mkString === s, s"gate pattern must partition '$s'")
    }
    // The ONLY divergence: runs of 2+ spaces — GPT-2's lookahead leaves
    // the last space to attach to the next word; the RE2-safe pattern
    // consumes the whole run. Pinned so the doc claim stays true.
    assert(toks(gate, "a  b") === Seq("a", "  ", "b"))
    assert(toks(gpt2, "a  b") === Seq("a", " ", " b"))
    assert(toks(gpt2, "a  b").mkString === "a  b", "both still partition")
  }

  test("TopKMin: partial aggregation bounds the exchange (partial_graft_topk_min in plan)") {
    val df = (1 to 100).map(i => (i % 3, i.toLong)).toDF("g", "v")
    val out = df.groupBy(col("g"))
      .agg(bridge.column(graft.expressions.TopKMin(
        bridge.expression(col("v")), 4).toAggregateExpression()).as("arr"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk_min") || plan.contains("partial graft_topk_min"),
      s"TopKMin must map-side combine (≤k values per group per partition):\n${plan.take(1500)}")
  }
}
