package graft

import java.nio.file.Files

import graft.model.{Action, Schemas}
import graft.sources.Sinks

/** Source/sink format roundtrips: the engine's outputs must survive CSV and
  * JSON-lines roundtrips with explicit schemas (types intact, no inference).
  */
class SinksSpec extends SparkSpec {

  import spark.implicits._

  private def actions = Seq(
    Action(1L, 10L, ts("2025-08-13 12:00:00"), 1),
    Action(2L, 20L, ts("2025-08-13 13:30:45"), 3)).toDF()

  test("csv roundtrip preserves the actions schema and values") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Sinks.writeCsv(actions, dir)
    val back = Sinks.readCsv(spark, dir, Schemas.actions)
    assert(back.schema === Schemas.actions)
    assert(back.orderBy("customer_id").collect().toSeq ===
      actions.orderBy("customer_id").collect().toSeq)
  }

  test("json roundtrip preserves the actions schema and values") {
    val dir = Files.createTempDirectory("graft_json").toString
    Sinks.writeJson(actions, dir)
    val back = Sinks.readJson(spark, dir, Schemas.actions)
    assert(back.schema === Schemas.actions)
    assert(back.orderBy("customer_id").collect().toSeq ===
      actions.orderBy("customer_id").collect().toSeq)
  }

  test("orc roundtrip preserves schema, values, and filter pushdown") {
    val dir = Files.createTempDirectory("graft_orc").toString
    Sinks.writeOrc(actions, dir)
    val back = Sinks.readOrc(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      actions.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("customer_id").collect().toSeq ===
      actions.orderBy("customer_id").collect().toSeq)
    val filtered = back.filter(back("customer_id") === 1L)
    assert(filtered.queryExecution.executedPlan.toString.contains("PushedFilters"))
    assert(filtered.count() === 1L)
  }
}
