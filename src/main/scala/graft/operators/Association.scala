package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Market-basket association mining — co-occurrence rules over
  * transaction-shaped data (orders × items here; the same shape covers
  * document × entities, session × pages, user × subscriptions). The
  * LLM-pipeline use is corpus diagnostics: which tags/domains/shards
  * co-occur far above chance (lift) flags template families and
  * correlated ingestion, the basket twin of `TextAnalysis.collocations`'
  * adjacent-token PMI.
  */
object Association {

  /** Frequent item PAIRS with exact-ppm support / confidence / lift —
    * the a-priori 2-itemset pass plus the rule metrics, in one
    * relational shape. Per unordered pair `(item_a < item_b)` co-present
    * in ≥ `minPairCount` baskets:
    * {{{
    *   support_ppm  = ⌊10⁶ · n_ab / n_baskets⌋
    *   conf_ab_ppm  = ⌊10⁶ · n_ab / n_a⌋      (a ⇒ b), conf_ba the reverse
    *   lift_ppm     = ⌊10⁶ · n_ab · n_baskets / (n_a · n_b)⌋
    * }}}
    * all floor divisions on exact counts — engine-bit-identical; the
    * lift numerator `10⁶·n_ab·N` is carried in DECIMAL(38,0) (HUGEINT
    * in the oracle), so a trillion-basket corpus cannot wrap it.
    * Lift > 10⁶ means the pair co-occurs above independence.
    *
    * Scale: items are DISTINCT per basket first (dedup shuffle on the
    * basket key), then the pair expansion is a self-equi-join on the
    * SAME basket key — co-partitioned, and bounded by basket size
    * (Σ_b s_b², never items²); the pair aggregate shuffles pair keys
    * with map-side combine, and the item-count table joins back onto
    * the SURVIVING pairs only (post-`minPairCount`, the frequent
    * fraction). Nothing materializes the n² item space. A hot basket
    * (one order holding 10⁵ items) would expand s² = 10¹⁰ pairs — cap
    * pathological baskets upstream if the domain allows them; order
    * carts do not.
    */
  def frequentItemPairs(
      transactions: DataFrame,
      basket: Column,
      item: Column,
      minPairCount: Int = 2): DataFrame = {
    require(minPairCount >= 1, s"minPairCount=$minPairCount must be >= 1")
    val dec = DataTypes.createDecimalType(38, 0)
    val b = transactions
      .select(basket.cast("long").as("o"), item.cast("long").as("i"))
      .filter(col("o").isNotNull && col("i").isNotNull)
      .distinct()
    val nBaskets = b.agg(count_distinct(col("o")).as("n_baskets"))
    val itemCounts = b.groupBy(col("i")).agg(count(lit(1)).as("ci"))
    val pairs = b.select(col("o"), col("i").as("item_a"))
      .join(b.select(col("o"), col("i").as("item_b")), Seq("o"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount.toLong)
    pairs
      .join(itemCounts.select(col("i").as("item_a"), col("ci").as("n_a")), Seq("item_a"))
      .join(itemCounts.select(col("i").as("item_b"), col("ci").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(1000000 * n_ab) div n_baskets").as("support_ppm"),
        expr("(1000000 * n_ab) div n_a").as("conf_ab_ppm"),
        expr("(1000000 * n_ab) div n_b").as("conf_ba_ppm"),
        (lit(1000000L).cast(dec) * col("n_ab").cast(dec) * col("n_baskets").cast(dec))
          .as("_lift_num"),
        (col("n_a").cast(dec) * col("n_b").cast(dec)).as("_lift_den"))
      .withColumn("lift_ppm", expr("(_lift_num div _lift_den)"))
      .drop("_lift_num", "_lift_den")
  }

  /** Frequent item TRIPLES via the a-priori candidate cascade (Agrawal &
    * Srikant 1994's level-wise prune, expressed relationally): a triple
    * can only reach `minCount` if all three of its pairs do, so the
    * in-basket pair expansion is FILTERED against the frequent-pair set
    * before it ever triples — the pruning that keeps level-3 mining
    * affordable where a naive s³ expansion of every basket is not.
    * The oracle is the BRUTE-FORCE all-triples count, so the hash match
    * PROVES the cascade lossless (the q139 prefix-filter argument at
    * the itemset level). Output per surviving `(a < b < c)` triple:
    * the triple count, the `(a,b)` pair count, exact-ppm support, and
    * `conf_ab_c_ppm = ⌊10⁶·n_abc/n_ab⌋` — the "customers with a,b also
    * took c" rule confidence.
    *
    * Scale: distinct per basket, pair instances semi-joined against the
    * frequent-pair table (aggregate-sized, shuffle equi-join — never
    * broadcast-limited), the third item joins on the basket key and
    * prunes through the (a,c) and (b,c) semi-joins before the final
    * pair-keyed aggregate. Expansion is bounded by Σ_b fs_b²·s_b with
    * fs the FREQUENT items per basket — the a-priori win.
    */
  def frequentItemTriples(
      transactions: DataFrame,
      basket: Column,
      item: Column,
      minCount: Int = 2): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    val b = transactions
      .select(basket.cast("long").as("o"), item.cast("long").as("i"))
      .filter(col("o").isNotNull && col("i").isNotNull)
      .distinct()
    val nBaskets = b.agg(count_distinct(col("o")).as("n_baskets"))
    val pairInBasket = b.select(col("o"), col("i").as("a"))
      .join(b.select(col("o"), col("i").as("bb")), Seq("o"))
      .filter(col("a") < col("bb"))
    val pf = pairInBasket
      .groupBy(col("a"), col("bb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount.toLong)
    val frequentPairInstances = pairInBasket
      .join(pf.select(col("a"), col("bb")), Seq("a", "bb"), "left_semi")
    frequentPairInstances
      .join(b.select(col("o"), col("i").as("c")), Seq("o"))
      .filter(col("bb") < col("c"))
      .join(
        pf.select(col("a"), col("bb").as("c")).select(col("a"), col("c")),
        Seq("a", "c"), "left_semi")
      .join(
        pf.select(col("a").as("bb"), col("bb").as("c")).select(col("bb"), col("c")),
        Seq("bb", "c"), "left_semi")
      .groupBy(col("a").as("item_a"), col("bb").as("item_b"), col("c").as("item_c"))
      .agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= minCount.toLong)
      .join(
        pf.select(col("a").as("item_a"), col("bb").as("item_b"), col("n_ab")),
        Seq("item_a", "item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("item_c"), col("n_abc"), col("n_ab"),
        expr("(1000000 * n_abc) div n_baskets").as("support_ppm"),
        expr("(1000000 * n_abc) div n_ab").as("conf_ab_c_ppm"))
  }

  /** Sequential pattern mining, level 2 (the GSP/PrefixSpan 2-sequence
    * pass — Srikant & Agrawal 1996): DIRECTED event-type pairs `a → b`
    * supported by the sessions where some occurrence of `a` happens
    * STRICTLY before (in µs) some occurrence of `b`. Order is what
    * [[frequentItemPairs]]' basket co-occurrence cannot see — "view
    * then purchase" and "purchase then view" are different behaviors
    * with the same co-occurrence count. Metrics are exact floor-ppm on
    * BIGINT counts, engine-bit-identical:
    * {{{
    *   support_ppm = ⌊10⁶ · n_sessions(a→b) / n_sessions_total⌋
    *   conf_ppm    = ⌊10⁶ · n_sessions(a→b) / n_sessions(a)⌋
    * }}}
    *
    * The existence test compresses to spans: a session supports `a → b`
    * iff `min_us(a) < max_us(b)` within it — so each session first
    * collapses to ONE row per (session, type) carrying its first/last
    * occurrence, and the pair expansion is a self-equi-join on the
    * session key over that collapsed table, bounded by
    * sessions × |alphabet|², never by event count². Same-µs ties do NOT
    * count as "before" (strict inequality on values — no order
    * dependence to break).
    *
    * Scale: sessionization is [[Timeseries.sessionLabels]]' single
    * `user_id` exchange; the span aggregate extends that key (no second
    * shuffle); the self-join is co-partitioned on the session key; the
    * pair aggregate shuffles an alphabet²-bounded key space with
    * map-side combine; the antecedent-count table joins only surviving
    * pairs and the scalar total broadcasts. Event types are a small
    * enum by construction — the |alphabet|² blow-up basket carts risk
    * (see [[frequentItemPairs]]) cannot arise here.
    */
  def sequentialPairs(
      events: DataFrame,
      gapUs: Long = 1800L * 1000000L,
      minSupport: Int = 2): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport must be >= 1")
    val spans = Timeseries.sessionLabels(events, gapUs)
      .groupBy(col("user_id"), col("session_id"), col("event_type"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
    val total = spans.select(col("user_id"), col("session_id")).distinct()
      .agg(count(lit(1)).as("n_total"))
    val na = spans.groupBy(col("event_type").as("ante"))
      .agg(count(lit(1)).as("n_ante"))
    val a = spans.select(
      col("user_id"), col("session_id"),
      col("event_type").as("ante"), col("first_us"))
    val b = spans.select(
      col("user_id"), col("session_id"),
      col("event_type").as("cons"), col("last_us"))
    a.join(b, Seq("user_id", "session_id"))
      .filter(col("ante") =!= col("cons") && col("first_us") < col("last_us"))
      .groupBy(col("ante"), col("cons"))
      .agg(count(lit(1)).as("n_sessions"))
      .filter(col("n_sessions") >= minSupport.toLong)
      .join(na, Seq("ante"))
      .crossJoin(broadcast(total))
      .select(
        col("ante"), col("cons"), col("n_sessions"), col("n_ante"),
        expr("(1000000 * n_sessions) div n_total").as("support_ppm"),
        expr("(1000000 * n_sessions) div n_ante").as("conf_ppm"))
  }
}
