package graft

import graft.operators.Graphs

class GraphsSpec extends SparkSpec {

  import spark.implicits._

  test("pageRank runs the exact scaled-integer recurrence on a path graph") {
    // Path 1—2—3, with a duplicate, a reversed duplicate, and a
    // self-loop that symmetrize/dedup must absorb.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 2L), (1L, 2L))
      .toDF("src", "dst")
    val out = Graphs.pageRank(edges, iters = 2).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).getAs[Long]("deg") === 1L)
    assert(out(2L).getAs[Long]("deg") === 2L)
    // By hand at scale 1e12, base 1.5e11:
    //   r1(1) = r1(3) = 1.5e11 + (1e12*85) div 200 = 575e9
    //   r1(2)         = 1.5e11 + 2*(1e12*85 div 100) = 1.85e12
    //   r2(1) = 1.5e11 + (1.85e12*85) div 200 = 936.25e9
    //   r2(2) = 1.5e11 + 2*(575e9*85 div 100) = 1.1275e12
    assert(out(1L).getAs[Long]("rank_scaled") === 936250000000L)
    assert(out(3L).getAs[Long]("rank_scaled") === 936250000000L)
    assert(out(2L).getAs[Long]("rank_scaled") === 1127500000000L)
  }

  test("pageRank centers outrank leaves on a star and isolated nodes are absent") {
    val star = (2L to 6L).map(leaf => (1L, leaf)).toDF("src", "dst")
    val out = Graphs.pageRank(star, iters = 4).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank_scaled")).toMap
    assert(out.size === 6)
    val center = out(1L)
    (2L to 6L).foreach(leaf => assert(center > out(leaf)))
    assert((2L to 6L).map(out).toSet.size === 1, "leaves are symmetric")
  }

  test("triangleCounts: exact counts and ppm coefficients on K4 minus an edge") {
    // Vertices 1..4, edges {12,13,14,23,24} (no 34) — plus a duplicate,
    // a reversed duplicate, and a self-loop that normalization absorbs.
    // Triangles: (1,2,3) and (1,2,4).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("src", "dst")
    val out = Graphs.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L).getAs[Long]("deg") === 3L)
    assert(out(3L).getAs[Long]("deg") === 2L)
    assert(out(1L).getAs[Long]("triangles") === 2L)
    assert(out(2L).getAs[Long]("triangles") === 2L)
    assert(out(3L).getAs[Long]("triangles") === 1L)
    assert(out(4L).getAs[Long]("triangles") === 1L)
    // coeff = (2e6 * tri) div (deg * (deg - 1))
    assert(out(1L).getAs[Long]("coeff_ppm") === 666666L)
    assert(out(2L).getAs[Long]("coeff_ppm") === 666666L)
    assert(out(3L).getAs[Long]("coeff_ppm") === 1000000L)
    assert(out(4L).getAs[Long]("coeff_ppm") === 1000000L)
  }

  test("triangleCounts: a path has no triangles and degree-1 nodes get coeff 0") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graphs.triangleCounts(path).collect()
    assert(out.length === 4)
    assert(out.forall(_.getAs[Long]("triangles") === 0L))
    assert(out.forall(_.getAs[Long]("coeff_ppm") === 0L))
  }

  test("rareShingleEdges: only df-banded shared shingles connect documents") {
    def doc(id: Long, text: String) = (id, text, "en", "src", text.length.toLong)
    // "p q r" appears in docs 0..3 (df 4 — above the cap, no edges);
    // "m n o" appears in docs 4 and 5 (df 2 — one edge).
    val docs = Seq(
      doc(0L, "p q r s"), doc(1L, "z p q r"), doc(2L, "p q r t"),
      doc(3L, "p q r u"), doc(4L, "m n o x"), doc(5L, "y m n o"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val edges = graft.operators.Dedup.rareShingleEdges(docs)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    assert(edges === Set((4L, 5L)))
    // Raising maxDf to 4 admits the p-q-r clique: C(4,2) new pairs.
    val wide = graft.operators.Dedup.rareShingleEdges(docs, maxDf = 4L)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    assert(wide === Set(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("labelPropagation: two bridged triangles resolve to two communities") {
    import spark.implicits._
    // Triangles {1,2,3} and {4,5,6}, bridged 3-4. Hand-replay of 3
    // synchronous rounds with smallest-label ties:
    //   l1 = {1:2, 2:1, 3:1, 4:3, 5:4, 6:4}
    //   l2 = {1:1, 2:1, 3:1, 4:4, 5:3, 6:3}
    //   l3 = {1:1, 2:1, 3:1, 4:3, 5:3, 6:3}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val r = graft.operators.Graphs.labelPropagation(edges)
      .orderBy("id").collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("label"))
    assert(r.toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    // Determinism: identical labels on re-run.
    val r2 = graft.operators.Graphs.labelPropagation(edges)
      .orderBy("id").collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("label"))
    assert(r2.toSeq === r.toSeq)
  }

  test("labelPropagation normalizes direction, duplicates, and self-loops") {
    import spark.implicits._
    // Same triangle given with reversed duplicates and a self-loop: the
    // symmetrize+distinct front end must make it equivalent to the
    // clean undirected triangle (all-same community after 3 rounds).
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 3L))
      .toDF("src", "dst")
    val r = graft.operators.Graphs.labelPropagation(messy)
      .orderBy("id").collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("label"))
    // Triangle replay: l1 = {1:2, 2:1, 3:1}; l2 = {1:1, 2:1, 3:1} (node 1
    // ties 1 vs 1-count labels -> min), l3 stable.
    assert(r.toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // No self-loop row leaked a phantom node; exactly the 3 vertices.
    assert(r.length === 3)
  }

  test("corenessHIndex: clique plus pendant chain converges to coreness") {
    // K4 on {1,2,3,4} + chain 4—5—6, with a reversed duplicate and a
    // self-loop that normalization absorbs. Coreness: clique members 3
    // (the 3-core), chain nodes 1 (peeled in the first k=1 pass).
    // H-index trace: h0 = deg = {1:3, 2:3, 3:3, 4:4, 5:2, 6:1};
    // round 1 settles 5 and 6 to 1 and 4 to 3; round 2 is a fixpoint.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (2L, 1L), (6L, 6L))
      .toDF("src", "dst")
    val out = Graphs.corenessHIndex(edges, iters = 4).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("deg"), r.getAs[Long]("coreness")))
      .toMap
    assert(out === Map(
      1L -> ((3L, 3L)), 2L -> ((3L, 3L)), 3L -> ((3L, 3L)),
      4L -> ((4L, 3L)), 5L -> ((2L, 1L)), 6L -> ((1L, 1L))))
  }

  test("corenessHIndex intermediate rounds stay upper bounds of coreness") {
    // Star K1,5: center degree 5, coreness 1 everywhere. One round must
    // already settle the center (neighbor estimates all 1 → H-index 1),
    // and a single-round budget never dips BELOW true coreness.
    val star = (2L to 6L).map(leaf => (1L, leaf)).toDF("src", "dst")
    val one = Graphs.corenessHIndex(star, iters = 1).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("coreness")).toMap
    assert(one === (1L to 6L).map(_ -> 1L).toMap)
  }

  test("seedDistances: min-merge relaxation, isolated seeds kept, horizon cut") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    // Seed 99 touches no edge — still emitted at 0. Nodes past maxHops
    // hops are ABSENT, not infinite.
    val far = Graphs.seedDistances(path, Seq(1L, 99L).toDF("id"), maxHops = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("dist")).toMap
    assert(far === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 99L -> 0L))
    // Two competing seeds: every node takes the MIN hop count.
    val two = Graphs.seedDistances(path, Seq(1L, 4L).toDF("id"), maxHops = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("dist")).toMap
    assert(two === Map(
      1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 1L, 6L -> 2L))
  }

  test("personalizedPageRank: seed-concentrated teleport by hand; unreachable components stay 0") {
    // Path 1—2—3 with seed {1}; disjoint edge 4—5 carries no trust.
    // S = 1e12, base = 1.5e11. Hand recurrence:
    //   r1 = (1.5e11, 8.5e11, 0, 0, 0)
    //   r2(1) = 1.5e11 + ⌊8.5e11·85/200⌋ = 5.1125e11
    //   r2(2) = ⌊1.5e11·85/100⌋ = 1.275e11
    //   r2(3) = ⌊8.5e11·85/200⌋ = 3.6125e11
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = Graphs.personalizedPageRank(edges, seeds, iters = 2).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(out(1L).getAs[Boolean]("is_seed") && !out(2L).getAs[Boolean]("is_seed"))
    assert(out(1L).getAs[Long]("trust_scaled") === 511250000000L)
    assert(out(2L).getAs[Long]("trust_scaled") === 127500000000L)
    assert(out(3L).getAs[Long]("trust_scaled") === 361250000000L)
    // The component no seed can reach holds EXACTLY zero — kept, not dropped.
    assert(out(4L).getAs[Long]("trust_scaled") === 0L)
    assert(out(5L).getAs[Long]("trust_scaled") === 0L)
  }

  test("hyperBall registers equal the HLL of the true r-hop balls (max-propagation identity)") {
    // Path 1—2—3—4—5 plus a disjoint edge 10—11. Register-max along
    // edges must reproduce EXACTLY hllRegisters of the brute-force
    // 2-hop ball membership — no propagation error, only HLL's own.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val adj = Map(
      1L -> Set(2L), 2L -> Set(1L, 3L), 3L -> Set(2L, 4L), 4L -> Set(3L, 5L),
      5L -> Set(4L), 10L -> Set(11L), 11L -> Set(10L))
    def ball(v: Long, r: Int): Set[Long] =
      (0 until r).foldLeft(Set(v))((b, _) => b ++ b.flatMap(adj))
    val members = adj.keys.toSeq.sorted.flatMap(v => ball(v, 2).toSeq.sorted.map(v -> _))
    val expected = graft.functions.Sketches.hllEstimate(
        graft.functions.Sketches.hllRegisters(
          members.toDF("id", "member"), "id", "member", 6), "id", 6)
      .collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("m_used"), r.getAs[Long]("s"),
        r.getAs[Double]("est_distinct"))).toMap
    val got = Graphs.hyperBall(edges, rounds = 2, p = 6).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("m_used"), r.getAs[Long]("s"),
        r.getAs[Double]("est_ball"))).toMap
    assert(got === expected)
    // Interior node 3 reaches everything on the path within 2 hops (5
    // members); endpoint 1 reaches 3; the disjoint pair reaches 2 — the
    // ESTIMATES must rank interior > endpoint > pair.
    assert(got(3L)._3 > got(1L)._3 && got(1L)._3 > got(10L)._3)
  }

  test("hits runs the exact integer-renormalized fixpoint on a bipartite graph") {
    // Hubs {1,2}, authorities {10,11,12}; 11 is endorsed by both hubs.
    // A duplicate edge that dedup must absorb.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (1L, 10L))
      .toDF("src", "dst")
    val rows = Graphs.hits(edges, iters = 2).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("id")) -> r).toMap
    assert(rows.keySet === Set(
      ("hub", 1L), ("hub", 2L), ("auth", 10L), ("auth", 11L), ("auth", 12L)))
    assert(rows(("hub", 1L)).getAs[Long]("deg") === 2L)
    assert(rows(("auth", 11L)).getAs[Long]("deg") === 2L)
    // By hand at scale 1e9: round 1 a_raw = (1e9, 2e9, 1e9), divisor 2 →
    // a = (5e8, 1e9, 5e8); h_raw = (1.5e9, 1.5e9), divisor 1. Round 2
    // re-converges to the same point (divisor 3 on a_raw = (1.5, 3, 1.5)e9).
    assert(rows(("hub", 1L)).getAs[Long]("score_scaled") === 1500000000L)
    assert(rows(("hub", 2L)).getAs[Long]("score_scaled") === 1500000000L)
    assert(rows(("auth", 10L)).getAs[Long]("score_scaled") === 500000000L)
    assert(rows(("auth", 11L)).getAs[Long]("score_scaled") === 1000000000L)
    assert(rows(("auth", 12L)).getAs[Long]("score_scaled") === 500000000L)
  }

  test("hits: scores stay under 2·scale and a midpath node holds both roles") {
    // 50 hubs all pointing at authority 99 (max skew), plus a chain
    // 1→2→3 so node 2 appears as hub AND authority.
    val skew = (100L to 149L).map(h => (h, 99L))
    val edges = (skew ++ Seq((1L, 2L), (2L, 3L))).toDF("src", "dst")
    val rows = Graphs.hits(edges, iters = 4, scale = 1000L).collect()
    val byKey = rows.map(r => (r.getAs[String]("kind"), r.getAs[Long]("id")) -> r.getAs[Long]("score_scaled")).toMap
    rows.foreach(r => assert(r.getAs[Long]("score_scaled") < 2000L,
      s"score ${r.getAs[Long]("score_scaled")} breaches the 2·scale bound"))
    assert(byKey.contains(("hub", 2L)) && byKey.contains(("auth", 2L)))
    // The mass concentrates on the skew component: authority 99 strictly
    // dominates the chain authorities.
    assert(byKey(("auth", 99L)) > byKey(("auth", 3L)))
  }

  test("modularity: two bridged triangles match the closed form") {
    // Triangles {1,2,3} and {4,5,6} bridged by 3–4: m = 7, each
    // community has m_c = 3 internal edges and degree sum 7, so
    // q_num = 4·7·3 − 7² = 35 and Q_c = 35/196 per community.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"),
      (5L, "b"), (6L, "b")).toDF("id", "label")
    val rows = Graphs.modularity(edges, labels).collect()
      .map(r => r.getAs[String]("label") -> r).toMap
    for (c <- Seq("a", "b")) {
      assert(rows(c).getAs[Long]("n_nodes") === 3L)
      assert(rows(c).getAs[Long]("m_in") === 3L)
      assert(rows(c).getAs[Long]("deg_sum") === 7L)
      assert(rows(c).getAs[Long]("q_num") === 35L)
      assert(rows(c).getAs[Double]("q_contrib") === 35.0 / 196.0)
    }
  }

  test("modularity: a split edge community has zero internal edges, negative q") {
    // One edge whose endpoints land in different communities: both
    // singleton communities have m_in = 0 (the left-join coalesce) and
    // q_num = −deg_sum² < 0.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val labels = Seq((1L, "x"), (2L, "y")).toDF("id", "label")
    val rows = Graphs.modularity(edges, labels).collect()
      .map(r => r.getAs[String]("label") -> r).toMap
    for (c <- Seq("x", "y")) {
      assert(rows(c).getAs[Long]("m_in") === 0L)
      assert(rows(c).getAs[Long]("q_num") === -1L)
      assert(rows(c).getAs[Double]("q_contrib") === -0.25)
    }
  }

  test("withRoundWidth restores the session shuffle width, on success and on failure") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2L)).toDF("src", "dst")
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val inside = Graphs.withRoundWidth(df, roundRows = 1L) {
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(inside === "2", "tiny round volume narrows to the floor width")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
    intercept[RuntimeException] {
      Graphs.withRoundWidth(df, roundRows = 1L) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before,
      "width restored by the finally even when the body throws")
    // Large round volumes keep the session's CONFIGURED width (the
    // at-scale no-op guarantee — the bracket narrows, never re-widths).
    val wide = Graphs.withRoundWidth(df, roundRows = Long.MaxValue / 2) {
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    }
    assert(wide === before.toInt)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
    // And the narrowed loop computes the same ranks as the session width
    // (width never changes results — the oracle's invariant, pinned here
    // on a fixture the other tests already hand-verify).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val narrow = Graphs.pageRank(edges, iters = 3)
      .orderBy(col("id")).collect().map(_.toSeq)
    assert(narrow.length === 4)
  }
}
