package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sketches: approximate algorithms whose OUTPUT is an exact
  * function of the input (hash-defined, no RNG), so they hash-verify
  * against a SQL oracle and reproduce across partitionings — unlike
  * `approx_count_distinct`'s HLL, whose merge order leaks into the result.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count sketch per group: keep the k
    * smallest 60-bit hashes of the value; the k-th smallest `h_k`
    * estimates the distinct count as `(k-1) * 2^60 / h_k` (the classic
    * order-statistics estimator, ±1/√k relative error). Groups with
    * fewer than k distinct hashes report their exact count.
    *
    * Scale: the shuffle carries DISTINCT (group, hash) longs only —
    * map-side combined — and WindowGroupLimit bounds each group to k
    * rows before the final aggregate; the sketch row per group is
    * mergeable downstream (union + re-take the k smallest).
    * `est_distinct` is exact-double arithmetic: `(k-1)·2^60` is exactly
    * representable, the long→double conversion of `h_k` is correctly
    * rounded in every IEEE engine, and one division follows.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val h = df
      .select(col(groupCol), Hashing.md5Long60(col(valueCol).cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    h.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(max(col("h")).as("kth"), count(lit(1)).as("k_actual"))
      .withColumn(
        "est_distinct",
        when(col("k_actual") < k, col("k_actual").cast("double"))
          .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) / col("kth").cast("double")))
  }
}
