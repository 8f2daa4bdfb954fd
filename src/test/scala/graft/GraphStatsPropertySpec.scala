package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.functions.Stats
import graft.operators.{Dedup, Graphs}

/** Differential property tests for the r13 operator batch: each operator
  * must equal an independent brute-force model on ARBITRARY generated
  * inputs — the prefix filter against set-arithmetic jaccard, groupAuc
  * against O(n²) pair counting, pageRank against a Map-based replay of
  * the integer recurrence.
  */
class GraphStatsPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(r.passed, s"$name: $r")
  }

  test("prefixFilterPairs equals brute-force set jaccard for any corpus and threshold") {
    val corpusGen = for {
      n <- Gen.choose(2, 14)
      pct <- Gen.oneOf(30, 50, 80)
      docs <- Gen.listOfN(n, for {
        words <- Gen.choose(0, 14)
        ws <- Gen.listOfN(words, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield ws.mkString(" "))
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, pct)
    check("prefix-filter-vs-brute-force", Prop.forAll(corpusGen) { case (corpus, pct) =>
      def shingleSet(t: String): Set[String] = {
        val ws = t.trim.split("\\s+").filter(_.nonEmpty)
        if (ws.length < 3) Set.empty[String] else ws.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = corpus.map { case (id, t) => id -> shingleSet(t) }.filter(_._2.nonEmpty)
      val expected = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        common = (sa & sb).size.toLong
        na = sa.size.toLong; nb = sb.size.toLong
        if 100L * common >= pct.toLong * (na + nb - common)
      } yield (a, b, common, na, nb)).toSet
      val df = corpus.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = Dedup.prefixFilterPairs(df, minJaccardPct = pct).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Long]("n_common"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toSet
      Prop(got == expected) :| s"pct=$pct got=$got expected=$expected"
    })
  }

  test("containmentPairs equals brute-force ordered containment for any corpus") {
    val corpusGen = for {
      n <- Gen.choose(2, 12)
      pct <- Gen.oneOf(50, 80)
      docs <- Gen.listOfN(n, for {
        words <- Gen.choose(0, 14)
        ws <- Gen.listOfN(words, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield ws.mkString(" "))
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, pct)
    check("containment-vs-brute-force", Prop.forAll(corpusGen) { case (corpus, pct) =>
      def shingleSet(t: String): Set[String] = {
        val ws = t.trim.split("\\s+").filter(_.nonEmpty)
        if (ws.length < 3) Set.empty[String] else ws.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = corpus.map { case (id, t) => id -> shingleSet(t) }.filter(_._2.nonEmpty)
      val expected = (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        common = (sa & sb).size.toLong
        if 100L * common >= pct.toLong * sa.size
      } yield (a, b, common, sa.size.toLong, sb.size.toLong)).toSet
      val df = corpus.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = Dedup.containmentPairs(df, minContainmentPct = pct).collect()
        .map(r => (r.getAs[Long]("src_doc"), r.getAs[Long]("dst_doc"),
          r.getAs[Long]("n_common"), r.getAs[Long]("n_src"), r.getAs[Long]("n_dst"))).toSet
      Prop(got == expected) :| s"pct=$pct got=$got expected=$expected"
    })
  }

  test("groupAuc equals O(n^2) pair counting for any label/score mix") {
    val rowsGen = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("g1", "g2", "g3")
        s <- Gen.choose(0, 5).map(_.toDouble) // coarse scores force ties
        y <- Gen.oneOf(true, false)
      } yield (g, s, y))
    } yield rows
    check("groupAuc-vs-pairs", Prop.forAll(rowsGen) { rows =>
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val pos = rs.filter(_._3).map(_._2)
        val neg = rs.filterNot(_._3).map(_._2)
        if (pos.isEmpty || neg.isEmpty) None
        else {
          val conc = (for (p <- pos; q <- neg if p > q) yield 1L).sum
          val tied = (for (p <- pos; q <- neg if p == q) yield 1L).sum
          Some(g -> (pos.size.toLong, neg.size.toLong, conc, tied))
        }
      }
      val got = Stats.groupAuc(rows.toDF("grp", "s", "y"), col("grp"), col("s"), col("y"))
        .collect()
        .map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
            r.getAs[Long]("concordant"), r.getAs[Long]("tied"))).toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    })
  }

  test("pageRank equals the Map-based integer recurrence for any graph") {
    val edgeGen = for {
      m <- Gen.choose(1, 20)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, 9L); b <- Gen.choose(0L, 9L)
      } yield (a, b))
    } yield edges
    check("pageRank-vs-reference", Prop.forAll(edgeGen) { edges =>
      val scale = 1000000000000L
      val iters = 3
      val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .filter(e => e._1 != e._2).distinct
      if (sym.isEmpty) Prop(Graphs.pageRank(edges.toDF("src", "dst"), iters).count() == 0)
      else {
        val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
        val base = scale * 15L / 100L
        var r = deg.keys.map(_ -> scale).toMap
        for (_ <- 1 to iters) {
          val contrib = sym.groupBy(_._2).map { case (dst, es) =>
            dst -> es.map { case (src, _) => r(src) * 85L / (100L * deg(src)) }.sum
          }
          r = deg.keys.map(k => k -> (base + contrib.getOrElse(k, 0L))).toMap
        }
        val expected = deg.keys.map(k => k -> (deg(k), r(k))).toMap
        val got = Graphs.pageRank(edges.toDF("src", "dst"), iters).collect()
          .map(x => x.getAs[Long]("id") ->
            (x.getAs[Long]("deg"), x.getAs[Long]("rank_scaled"))).toMap
        Prop(got == expected) :| s"got=$got expected=$expected"
      }
    })
  }

  test("triangleCounts equals brute-force triangle enumeration for any graph") {
    val edgeGen = for {
      m <- Gen.choose(1, 25)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, 9L); b <- Gen.choose(0L, 9L)
      } yield (a, b))
    } yield edges
    check("triangles-vs-brute-force", Prop.forAll(edgeGen) { edges =>
      val und = edges.map { case (a, b) => (a min b, a max b) }
        .filter(e => e._1 != e._2).distinct
      if (und.isEmpty)
        Prop(Graphs.triangleCounts(edges.toDF("src", "dst")).count() == 0)
      else {
        val adj = (und ++ und.map(_.swap)).groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).toSet }
        val nodes = adj.keys.toSeq
        // Brute force: enumerate every vertex triple once (i < j < k).
        val triPerNode = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for {
          Seq(i, j, k) <- nodes.sorted.combinations(3)
          if adj(i)(j) && adj(j)(k) && adj(i)(k)
        } Seq(i, j, k).foreach(v => triPerNode(v) += 1L)
        val expected = nodes.map { v =>
          val d = adj(v).size.toLong
          val t = triPerNode(v)
          val c = if (d >= 2) 2000000L * t / (d * (d - 1)) else 0L
          v -> ((d, t, c))
        }.toMap
        val got = Graphs.triangleCounts(edges.toDF("src", "dst")).collect()
          .map(x => x.getAs[Long]("id") -> ((
            x.getAs[Long]("deg"), x.getAs[Long]("triangles"),
            x.getAs[Long]("coeff_ppm")))).toMap
        Prop(got == expected) :| s"got=$got expected=$expected"
      }
    })
  }

  test("corenessHIndex fixed point equals brute-force peel for any graph") {
    val edgeGen = for {
      m <- Gen.choose(1, 25)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, 9L); b <- Gen.choose(0L, 9L)
      } yield (a, b))
    } yield edges
    check("coreness-vs-peel", Prop.forAll(edgeGen) { edges =>
      val und = edges.map { case (a, b) => (a min b, a max b) }
        .filter(e => e._1 != e._2).distinct
      if (und.isEmpty)
        Prop(Graphs.corenessHIndex(edges.toDF("src", "dst"), iters = 16).count() == 0)
      else {
        // Brute-force peel: remove the (deg, id)-min vertex repeatedly;
        // coreness(v) = running max of degree-at-removal.
        val adj = scala.collection.mutable.Map[Long, Set[Long]]()
        und.foreach { case (a, b) =>
          adj(a) = adj.getOrElse(a, Set()) + b
          adj(b) = adj.getOrElse(b, Set()) + a
        }
        val fullDeg = adj.map { case (k, v) => k -> v.size.toLong }.toMap
        val core = scala.collection.mutable.Map[Long, Long]()
        var k = 0L
        while (adj.nonEmpty) {
          val (v, d) = adj.view.map { case (n, s) => (n, s.size.toLong) }
            .minBy { case (n, d) => (d, n) }
          k = math.max(k, d)
          core(v) = k
          adj -= v
          adj.keys.foreach(n => adj(n) = adj(n) - v)
        }
        // 10-node graphs converge well inside 16 H-index rounds.
        val got = Graphs.corenessHIndex(edges.toDF("src", "dst"), iters = 16)
          .collect()
          .map(x => x.getAs[Long]("id") ->
            ((x.getAs[Long]("deg"), x.getAs[Long]("coreness")))).toMap
        val expected = core.map { case (v, c) => v -> ((fullDeg(v), c)) }.toMap
        Prop(got == expected) :| s"got=$got expected=$expected"
      }
    })
  }
}
