package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators over edge/pair tables — centrality and propagation
  * passes a corpus pipeline runs on its derived document graphs (near-dup
  * pairs, citation/link graphs, co-bucket candidates). The reference has
  * no graph surface (SURVEY §2.8); this is a north-star extension built
  * on the same pair tables the dedup stack already produces.
  */
object Graphs {

  /** Deterministic scaled-integer PageRank over an undirected graph —
    * the quality-propagation / centrality pass (harmonic-rank corpus
    * weighting, hub detection in near-dup graphs) computed EXACTLY:
    * ranks live as BIGINTs at `scale` (r₀ = scale), each round is
    * `r'(v) = ⌊scale·15/100⌋ + Σ_{u∈N(v)} ⌊r(u)·85 / (100·deg(u))⌋`
    * (α = 0.85), and because every operation is integer arithmetic on
    * nonnegative values the fixpoint iteration is order-independent and
    * engine-bit-identical — no float mass to drift. (Spark `div`
    * truncates toward zero and DuckDB `//` floors; ranks are
    * nonnegative throughout, where the two agree.)
    *
    * Semantics notes: the graph is symmetrized and de-duplicated
    * (self-loops dropped); vertices are the edge endpoints — an isolated
    * node has no row. Flooring drops mass, so ranks are a deterministic
    * LOWER quantization of float PageRank·scale, not a re-normalized
    * distribution — ordering, which is what a corpus weighting consumes,
    * is preserved to quantization granularity.
    *
    * Scale: each round is one edge-keyed equi-join (rank lookup on
    * `src`) + one map-side-combined sum on `dst` — the textbook
    * Pregel/GraphX shape expressed relationally, `iters` shuffle rounds
    * total, nothing quadratic. Degrees and the symmetrized edge table
    * persist for the loop and are released after the final ranks
    * materialize (the returned frame owns the one remaining small
    * cache, |V| rows, like dedupClusters' labels). BIGINT headroom:
    * a vertex's rank is bounded by ~0.85·N·scale on a star graph —
    * lower `scale` a decade per 10× vertices past ~10⁵ at the default
    * (DuckDB raises on overflow, Spark wraps; staying exact in BOTH
    * engines is the contract).
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 4,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters=$iters out of range [1, 64]")
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val symd = sym.join(deg, Seq("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = deg.select(col("src").as("id"), col("deg"))
    val base = scale * 15L / 100L
    var ranks = nodes.select(col("id"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      val contrib = symd
        .join(ranks.select(col("id").as("src"), col("r")), Seq("src"))
        .select(col("dst").as("id"), expr("r * 85 div (100 * deg)").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("in_sum"))
      ranks = nodes.select(col("id"))
        .join(contrib, Seq("id"), "left_outer")
        .select(col("id"), (lit(base) + coalesce(col("in_sum"), lit(0L))).as("r"))
    }
    val out = nodes.join(ranks, Seq("id"))
      .select(col("id"), col("deg"), col("r").as("rank_scaled"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    symd.unpersist()
    deg.unpersist()
    out
  }
}
