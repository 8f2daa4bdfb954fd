package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkSpec {

  import spark.implicits._

  test("asOfJoin matches the most recent right row at or before each left row") {
    val trades = Seq(
      (1L, 100L, 10L), // before any quote
      (1L, 105L, 11L), // exactly at a quote
      (1L, 109L, 12L), // between quotes
      (2L, 200L, 20L)) // key with no quotes at all
      .toDF("key", "t", "trade_id")
    val quotes = Seq(
      (1L, 105L, 50L),
      (1L, 110L, 51L))
      .toDF("key", "qt", "quote_id")
    val out = Joins.asOfJoin(trades, quotes, Seq("key"), "t", "qt", Seq("quote_id"))
      .collect()
      .map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[Any]("matched_qt")), Option(r.getAs[Any]("matched_quote_id"))))
      .toMap
    assert(out(10L) === (None, None))             // nothing at or before 100
    assert(out(11L) === (Some(105L), Some(50L)))  // simultaneous quote visible
    assert(out(12L) === (Some(105L), Some(50L)))  // most recent, not any
    assert(out(20L) === (None, None))             // keys never mix
  }

  test("asOfJoin breaks exact-time ties by the largest right payload") {
    val l = Seq((1L, 10L, 1L)).toDF("key", "t", "lid")
    val r = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 9L, 99L)).toDF("key", "qt", "rid")
    val row = Joins.asOfJoin(l, r, Seq("key"), "t", "qt", Seq("rid")).collect().head
    assert(row.getAs[Long]("matched_rid") === 9L)
  }

  test("asOfJoin maxLookback voids stale matches") {
    val l = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("key", "t", "lid")
    val r = Seq((1L, 95L, 7L)).toDF("key", "qt", "rid")
    val out = Joins.asOfJoin(l, r, Seq("key"), "t", "qt", Seq("rid"), maxLookback = Some(10L))
      .collect()
      .map(r2 => r2.getAs[Long]("lid") -> Option(r2.getAs[Any]("matched_rid")))
      .toMap
    assert(out(1L) === Some(7L))  // 5 units old: within lookback
    assert(out(2L) === None)      // 105 units old: voided
  }

  test("rangeJoin equals the naive inequality join, including multi-bucket intervals") {
    // Deterministic pseudo-random points and intervals; interval lengths
    // straddle several bucket widths so replication + the exactly-one-
    // bucket-meeting property both get exercised.
    val points = (0 until 300).map { i =>
      (i.toLong % 7, (i * 37L) % 1000, i.toLong)
    }.toDF("key", "pt", "pid")
    val intervals = (0 until 60).map { i =>
      val s = (i * 91L) % 900
      (i.toLong % 7, s, s + (i * 13L) % 250, 1000L + i)
    }.toDF("key", "s", "e", "iid")
    val fast = Joins.rangeJoin(points, intervals, Seq("key"), "pt", "s", "e", bucketWidth = 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.join(intervals, Seq("key"))
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.length === fast.distinct.length, "bucketization duplicated a pair")
    assert(fast.toSet === naive.toSet)
    assert(fast.nonEmpty)
  }

  test("asOfJoin equals the naive inequality-join argmax on pseudo-random data") {
    // Deterministic pseudo-random times over few keys so at-or-before
    // sets, exact ties, and empty matches all occur.
    val lhs = (0 until 200).map(i => (i.toLong % 5, (i * 37L) % 97, i.toLong))
      .toDF("key", "t", "lid")
    val rhs = (0 until 150).map(i => (i.toLong % 5, (i * 53L) % 97, 1000L + i))
      .toDF("key", "qt", "rid")
    val fast = Joins.asOfJoin(lhs, rhs, Seq("key"), "t", "qt", Seq("rid"))
      .collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("matched_rid")))
      .toMap
    // Naive: inequality join, rank by (qt, rid) desc, keep the top match.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lid")).orderBy(col("qt").desc, col("rid").desc)
    val naive = lhs.join(rhs, lhs("key") === rhs("key") && col("qt") <= col("t"), "left_outer")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("rid")))
      .toMap
    assert(fast.size === 200)
    (0 until 200).foreach { i =>
      assert(fast(i.toLong) === naive.getOrElse(i.toLong, None),
        s"lid=$i fast=${fast(i.toLong)} naive=${naive.get(i.toLong)}")
    }
  }

  test("temporal joins plan without inequality-join cross products") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir).withColumn("t", unix_micros(col("ts")))
    val p = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("event_id"), col("t"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("vid"), col("t").as("vt"))
    val asOf = Joins.asOfJoin(p, v, Seq("user_id"), "t", "vt", Seq("vid"))
    val asOfPlan = asOf.queryExecution.executedPlan.toString
    assert(!asOfPlan.contains("BroadcastNestedLoopJoin") && !asOfPlan.contains("CartesianProduct"),
      s"as-of join regressed to an inequality join:\n$asOfPlan")
    // union + window: ONE hash exchange total.
    assert("Exchange hashpartitioning".r.findAllIn(asOfPlan).length <= 1,
      s"as-of join grew a shuffle:\n$asOfPlan")

    val er = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("eid"), col("t").as("es"), (col("t") + 600000000L).as("ee"))
    val rng = Joins.rangeJoin(
      p.withColumnRenamed("event_id", "pid"), er, Seq("user_id"), "t", "es", "ee", 600000000L)
    val rngPlan = rng.queryExecution.executedPlan.toString
    assert(!rngPlan.contains("BroadcastNestedLoopJoin") && !rngPlan.contains("CartesianProduct"),
      s"range join regressed to an inequality join:\n$rngPlan")
  }

  test("intervalJoin: inclusive overlap, one copy per multi-bucket pair, key isolation") {
    val l = Seq(
      (1L, 0L, 25L, "a"),   // spans buckets 0-2 at width 10
      (1L, 30L, 40L, "b"),
      (1L, 50L, 49L, "w"),  // inverted (empty) interval — matches nothing
      (2L, 0L, 100L, "c"))  // other key — must never pair with key 1
      .toDF("key", "ls", "le", "lid")
    val r = Seq(
      (1L, 5L, 35L, "x"),   // overlaps a (in 3 shared buckets) AND b
      (1L, 25L, 25L, "y"),  // touches a exactly at its endpoint — inclusive
      (1L, 41L, 50L, "z"))  // adjacent to b but disjoint (41 > 40)
      .toDF("key", "rs", "re", "rid")
    val out = Joins.intervalJoin(l, r, Seq("key"), "ls", "le", "rs", "re", 10L)
      .collect().map(x => (x.getAs[String]("lid"), x.getAs[String]("rid")))
    // A pair sharing several buckets must appear exactly ONCE.
    assert(out.sorted.toSeq === Seq(("a", "x"), ("a", "y"), ("b", "x")))
  }

  test("intervalJoin equals the naive inequality join on pseudo-random intervals") {
    def h(i: Long, salt: Long) = math.abs((i * 2654435761L + salt) % 97L)
    val l = (0L until 150L).map(i => (i % 5L, h(i, 1), h(i, 1) + h(i, 7) % 20L, i))
      .toDF("key", "ls", "le", "lid")
    val r = (0L until 150L).map(i => (i % 5L, h(i, 3), h(i, 3) + h(i, 11) % 20L, i))
      .toDF("key", "rs", "re", "rid")
    val fast = Joins.intervalJoin(l, r, Seq("key"), "ls", "le", "rs", "re", 8L)
      .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("rid"))).sorted.toSeq
    val naive = l.as("l").join(r.as("r"),
        col("l.key") === col("r.key") &&
          col("l.ls") <= col("r.re") && col("r.rs") <= col("l.le"))
      .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("rid"))).sorted.toSeq
    assert(fast === naive)
    assert(fast.nonEmpty, "differential fixture must actually produce overlaps")
  }
}
