package graft

import org.apache.spark.sql.functions._

import graft.operators.Association

class AssociationSpec extends SparkSpec {

  import spark.implicits._

  // Baskets: o1{1,2,3} o2{1,2} o3{1,2,4} o4{3} — with a duplicated
  // (o1, 1) line that must NOT double-count (items are per-basket sets).
  private def tx = Seq(
    (1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
    (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L), (3L, 4L),
    (4L, 3L))
    .toDF("o", "i")

  test("frequentItemPairs: exact ppm support/confidence/lift by hand") {
    // n_baskets=4; counts 1:3 2:3 3:2 4:1. Only (1,2) reaches minPairCount=2:
    // n_ab=3 -> support ⌊3e6/4⌋, both confidences 1e6 (2 always rides with 1),
    // lift ⌊1e6·3·4/(3·3)⌋ = 1333333 (> 1e6: above independence).
    val out = Association.frequentItemPairs(tx, col("o"), col("i")).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("item_a") === 1L && r.getAs[Long]("item_b") === 2L)
    assert(r.getAs[Long]("n_ab") === 3L)
    assert(r.getAs[Long]("support_ppm") === 750000L)
    assert(r.getAs[Long]("conf_ab_ppm") === 1000000L)
    assert(r.getAs[Long]("conf_ba_ppm") === 1000000L)
    assert(r.getAs[Long]("lift_ppm") === 1333333L)
  }

  test("frequentItemPairs: minPairCount=1 keeps singletons, lift below 1e6 for incidental pairs") {
    val out = Association.frequentItemPairs(tx, col("o"), col("i"), minPairCount = 1)
      .collect().map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) -> r).toMap
    assert(out.size === 5) // (1,2) (1,3) (2,3) (1,4) (2,4)
    // (1,3): n_ab=1, n_a=3, n_b=2 -> lift ⌊1e6·1·4/6⌋ = 666666 — the pair
    // co-occurs BELOW what independence predicts.
    assert(out((1L, 3L)).getAs[Long]("lift_ppm") === 666666L)
    assert(out((1L, 3L)).getAs[Long]("conf_ab_ppm") === 333333L)
    assert(out((1L, 3L)).getAs[Long]("conf_ba_ppm") === 500000L)
  }

  test("frequentItemTriples: a-priori cascade finds exactly the brute-force triples") {
    // Baskets: o1{1,2,3} o2{1,2,3} o3{1,2} o4{3,4} o5{1,4}.
    // Frequent pairs (>=2): (1,2)x3 (1,3)x2 (2,3)x2. Only triple
    // reaching 2: (1,2,3) in o1,o2 — support ⌊2e6/5⌋, conf(1,2 -> 3) =
    // ⌊2e6/3⌋. The (3,4)/(1,4) pairs are infrequent, so 4 never triples.
    val tx = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L),
      (4L, 3L), (4L, 4L),
      (5L, 1L), (5L, 4L))
      .toDF("o", "i")
    val out = Association.frequentItemTriples(tx, col("o"), col("i")).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[Long]("item_a"), r.getAs[Long]("item_b"), r.getAs[Long]("item_c"))
      === ((1L, 2L, 3L)))
    assert(r.getAs[Long]("n_abc") === 2L)
    assert(r.getAs[Long]("n_ab") === 3L)
    assert(r.getAs[Long]("support_ppm") === 400000L)
    assert(r.getAs[Long]("conf_ab_c_ppm") === 666666L)
  }

  // Three sessions (30-min gap): user 1 @t0 view→click→buy, user 1 two
  // hours later a lone view, user 2 click→view. User 3 has two SAME-µs
  // events — strict "before" must count neither direction.
  private def seqEvents = {
    val t0 = 1700000000000000L // µs
    Seq(
      (1L, 1L, "view", t0),
      (1L, 2L, "click", t0 + 10L * 1000000L),
      (1L, 3L, "buy", t0 + 20L * 1000000L),
      (1L, 4L, "view", t0 + 7200L * 1000000L),
      (2L, 5L, "click", t0),
      (2L, 6L, "view", t0 + 5L * 1000000L),
      (3L, 7L, "view", t0),
      (3L, 8L, "click", t0))
      .toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
  }

  test("sequentialPairs: strict-order supports and exact ppm by hand") {
    // Sessions: {view<click<buy}, {view}, {click<view}, {view=click}.
    // n_total=4; n_ante: view 4, click 3, buy 1. Ordered pairs per
    // session: s1 view→click, view→buy, click→buy; s3 click→view;
    // s4 NONE (same-µs tie is not "before").
    val out = Association.sequentialPairs(seqEvents, minSupport = 1)
      .collect().map(r => (r.getAs[String]("ante"), r.getAs[String]("cons")) -> r).toMap
    assert(out.keySet === Set(
      ("view", "click"), ("view", "buy"), ("click", "buy"), ("click", "view")))
    val vc = out(("view", "click"))
    assert(vc.getAs[Long]("n_sessions") === 1L)
    assert(vc.getAs[Long]("n_ante") === 4L)
    assert(vc.getAs[Long]("support_ppm") === 250000L) // ⌊1e6·1/4⌋
    assert(vc.getAs[Long]("conf_ppm") === 250000L)    // ⌊1e6·1/4⌋
    val cb = out(("click", "buy"))
    assert(cb.getAs[Long]("n_ante") === 3L)
    assert(cb.getAs[Long]("conf_ppm") === 333333L)    // ⌊1e6·1/3⌋
  }

  test("sequentialPairs: default minSupport prunes single-session patterns") {
    assert(Association.sequentialPairs(seqEvents).collect().isEmpty)
  }
}
