package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Action-type codes used in training-example history arrays.
  *
  * Mirrors the reference encoding (pipeline.py:22,45,52,59): 0 is padding,
  * 1=click, 2=add-to-cart, 3=order.
  */
object ActionType {
  val Pad = 0
  val Click = 1
  val AddToCart = 2
  val Order = 3
}

/** One element of an impression carousel (pipeline.py:71-75). */
case class ImpressionItem(item_id: Long, is_order: Boolean)

/** A carousel of items shown to a customer on a day (pipeline.py:71-75). */
case class Impression(
    dt: String,
    ranking_id: String,
    customer_id: Long,
    impressions: Seq[ImpressionItem])

/** Raw click event (pipeline.py:41-46). */
case class Click(dt: String, customer_id: Long, item_id: Long, click_time: Timestamp)

/** Raw add-to-cart event (pipeline.py:48-53). */
case class CartAdd(
    dt: String,
    customer_id: Long,
    config_id: Long,
    simple_id: Int,
    occurred_at: Timestamp)

/** Raw order event (pipeline.py:55-60). */
case class OrderEvent(
    order_date: String,
    customer_id: Long,
    config_id: Long,
    simple_id: Int,
    occurred_at: Timestamp)

/** Normalized action row (pipeline.py:34-40). */
case class Action(customer_id: Long, item_id: Long, action_time: Timestamp, action_type: Int)

/** Final training example (pipeline.py:14-22; README.md:15-22).
  *
  * `actions` / `action_types` are parallel fixed-length arrays of exactly
  * `maxHistory` elements, most-recent-first, zero-padded.
  */
case class TrainingExample(
    dt: String,
    ranking_id: String,
    customer_id: Long,
    impression_pos: Integer,
    impression_item_id: java.lang.Long,
    label: Int,
    actions: Seq[Long],
    action_types: Seq[Int])

/** Canonical StructType constants + a conform helper.
  *
  * The reference enforces schemas by convention (select + defensive cast,
  * pipeline.py:41-64); here the same posture is captured once as explicit
  * schema constants so every operator can `conform` its inputs.
  */
object Schemas {

  val impressionItem: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("is_order", BooleanType)))

  val impressions: StructType = StructType(Seq(
    StructField("dt", StringType),
    StructField("ranking_id", StringType),
    StructField("customer_id", LongType),
    StructField("impressions", ArrayType(impressionItem))))

  val clicks: StructType = StructType(Seq(
    StructField("dt", StringType),
    StructField("customer_id", LongType),
    StructField("item_id", LongType),
    StructField("click_time", TimestampType)))

  val cartAdds: StructType = StructType(Seq(
    StructField("dt", StringType),
    StructField("customer_id", LongType),
    StructField("config_id", LongType),
    StructField("simple_id", IntegerType),
    StructField("occurred_at", TimestampType)))

  val orders: StructType = StructType(Seq(
    StructField("order_date", StringType),
    StructField("customer_id", LongType),
    StructField("config_id", LongType),
    StructField("simple_id", IntegerType),
    StructField("occurred_at", TimestampType)))

  val actions: StructType = StructType(Seq(
    StructField("customer_id", LongType),
    StructField("item_id", LongType),
    StructField("action_time", TimestampType),
    StructField("action_type", IntegerType)))

  val trainingExample: StructType = StructType(Seq(
    StructField("dt", StringType),
    StructField("ranking_id", StringType),
    StructField("customer_id", LongType),
    StructField("impression_pos", IntegerType),
    StructField("impression_item_id", LongType),
    StructField("label", IntegerType),
    StructField("actions", ArrayType(LongType)),
    StructField("action_types", ArrayType(IntegerType))))

  /** Project + cast `df` onto `schema` (same defensive posture as
    * pipeline.py:41-64, applied uniformly).
    */
  def conform(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
}
