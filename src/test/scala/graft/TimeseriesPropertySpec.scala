package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Timeseries

/** Property-based invariants for the time-series operators: results must
  * be pure functions of the event DATA, never of row order, partition
  * layout, or partition count — the determinism a distributed engine has
  * to prove, not assume. Each property runs the operator against a
  * sequential in-memory reference model or against itself under a
  * different physical layout.
  */
class TimeseriesPropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(r.passed, s"$name: $r")
  }

  // (event_id, user_id, event_type, epoch_us) — small day/user/type
  // domains force collisions, ties, gaps, and unreached funnel stages.
  private val eventsGen: Gen[List[(Long, Long, String, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 5L)
      tpe <- Gen.oneOf("signup", "view", "click", "purchase", "noise")
      day <- Gen.choose(0L, 6L)
      usInDay <- Gen.oneOf(0L, 1L, 500000L) // repeated instants → ties
    } yield (user, tpe, day * 86400000000L + usInDay))
  } yield rows.zipWithIndex.map { case ((u, t, us), i) => (i.toLong, u, t, us) }

  private def toEvents(rows: List[(Long, Long, String, Long)]) =
    rows.toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")

  test("ewmaSmooth is bitwise invariant under row order and partitioning") {
    check("ewmaOrderIndependence", Prop.forAll(eventsGen, Gen.choose(1, 7)) { (rows, parts) =>
      def run(df: org.apache.spark.sql.DataFrame) =
        Timeseries.ewmaSmooth(df, windowDays = 3).collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            (r.getAs[Long]("n_events"), r.getAs[Double]("ewma"))).toMap
      val base = run(toEvents(rows))
      // Reversed arrival order, different partition count: every weight
      // is a dyadic rational so the doubles must match BITWISE.
      val scrambled = run(
        toEvents(rows.reverse).repartition(parts, col("event_id")))
      base == scrambled
    })
  }

  test("funnel matches the sequential greedy first-match model for any event soup") {
    val steps = Seq("signup", "view", "click", "purchase")
    check("funnelStrictness", Prop.forAll(eventsGen) { rows =>
      // Reference model: per user, walk events in (us, event_id) order and
      // append a stage time exactly when the next expected type appears
      // strictly after the previously matched stage.
      val perUser = rows.groupBy(_._2).values.map { evs =>
        evs.sortBy(e => (e._4, e._1))
          .foldLeft(Vector.empty[Long]) { (ts, e) =>
            if (ts.size < steps.size && e._3 == steps(ts.size) &&
              (ts.isEmpty || e._4 > ts.last)) ts :+ e._4
            else ts
          }
      }.filter(_.nonEmpty).toList
      val modelUsers = steps.indices.map(s => perUser.count(_.size > s).toLong)
      val modelLag = steps.indices.map { s =>
        val reached = perUser.filter(_.size > s)
        if (reached.isEmpty) None
        else Some(reached.map(t => t(s) - t(0)).sum.toDouble / reached.size)
      }
      val got = Timeseries.funnel(toEvents(rows), steps)
        .orderBy("stage").collect()
      val gotUsers = got.map(_.getAs[Long]("n_users")).toSeq
      val gotLag = got.map(r =>
        Option(r.getAs[Any]("mean_lag_us")).map(_.asInstanceOf[Double])).toSeq
      val monotone = gotUsers.sliding(2).forall(p => p.length < 2 || p(0) >= p(1))
      gotUsers == modelUsers && gotLag == modelLag && monotone
    })
  }
}
