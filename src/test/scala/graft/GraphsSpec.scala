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
}
