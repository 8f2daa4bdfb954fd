package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextAnalysis

/** Deduplication operators for LLM-corpus curation over `documents`.
  *
  * Scale design (100 TB): exact dedup is one hash-partitioned aggregate on
  * the content hash (never on the full text — the 32-byte digest is the
  * shuffle key). MinHash/LSH follows the standard shingle → signature →
  * band → bucket-join pipeline: corpus-size-linear, with the only shuffles
  * keyed on (doc, hash-index) and on the 32-byte band keys; candidate
  * verification (jaccard) touches only bucket-colliding pairs, never the
  * full cross product.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  /** Exact dedup: group by content digest, keep the smallest doc_id as
    * canonical. The shuffle key is the md5 digest, not the document text.
    */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** MinHash signatures from one md5 per shingle: the digest yields two
    * sub-hashes (60-bit and 52-bit hex slices), and hash function j is
    * `rotate_j(h1) XOR h2` — a j-dependent bit rotation of the FULL
    * 60-bit h1 (shift (1 + 7j) mod 60), XORed with h2. Signature j is
    * the min over the document's k-shingles.
    *
    * The rotation family matters, and it must rotate h1 (the full 60-bit
    * field): the textbook-looking `h1 + j*h2` is NOT min-wise independent
    * across j without a modular wrap — a shingle with small h1 AND small
    * h2 wins the min for EVERY j — and rotating only h2 still leaves h1's
    * top 8 bits fixed across all j, so one small-h1 shingle dominates
    * every hash function. Both variants were measured on the sf0.01
    * corpus putting doc pairs at true jaccard 0.02 at 6/8 signature
    * agreement; with per-j rotations of h1, cross-corpus agreement shows
    * a clean cliff (planted jaccard≈0.98 pairs at 7-8/8, everything else
    * ≤3/8). Overflow-free (rot < 2^60, xor < 2^60 — DuckDB errors on
    * bigint overflow, Spark silently wraps) and portable (both engines
    * have %, integer division, and xor).
    *
    * Scale: md5 count is |shingles|, not |shingles| × numHashes; the
    * min-aggregation is map-side combined and shuffles ONE row per doc
    * (numHashes long columns), exploding to (doc, j, sig) rows only after
    * the shuffle.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 3, numHashes: Int = 8): DataFrame =
    signatureArrays(docs, k, numHashes)
      .select(col("doc_id"), posexplode(col("sigs")).as(Seq("j", "sig")))

  /** Per-document signature ARRAYS `(doc_id, sigs: array<long>)` — the
    * compact index shape: all numHashes minima per doc in ONE narrow
    * expression pass over the words array
    * ([[graft.expressions.MinHashSigs]] — same family, min is
    * duplicate-invariant so the shingle-distinct step drops out). No
    * shuffle at all until a consumer aggregates. This is the shape a
    * persisted cross-snapshot signature index should use (one row per
    * doc, 8-byte longs), and what [[nearDupAgainst]]'s `keptSignatures`
    * expects.
    */
  def signatureArrays(docs: DataFrame, k: Int = 3, numHashes: Int = 8): DataFrame = {
    val bridge = org.apache.spark.sql.graft.bridge
    TextAnalysis.spread(docs)
      .select(
        col("doc_id"),
        bridge.column(graft.expressions.MinHashSigs(
          bridge.expression(TextAnalysis.wordsCol), k, numHashes)).as("sigs"))
      .filter(size(col("sigs")) > 0)
  }

  /** LSH banding: join the signatures of each band of
    * `numHashes / numBands` consecutive hash functions into one compact
    * band key string. Documents sharing any (band, band_sig) are
    * near-duplicate candidates.
    */
  def minhashBands(docs: DataFrame, k: Int = 3, numHashes: Int = 8, numBands: Int = 4): DataFrame =
    bandsFromArrays(signatureArrays(docs, k, numHashes), numHashes, numBands)

  /** Band keys sliced NARROWLY out of the per-doc signature array — the
    * signatures are already in j order inside `sigs`, so each band is a
    * `slice` + string join, no per-(doc, band) aggregation (the previous
    * formulation re-grouped exploded (doc, j, sig) rows, paying a full
    * shuffle to reassemble an order the array already had).
    */
  private def bandsFromArrays(arr: DataFrame, numHashes: Int, numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    arr.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(numBands - 1)),
        b => array_join(
          transform(slice(col("sigs"), b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string")),
          "_"))).as(Seq("band", "band_sig")))
  }

  /** Candidate near-duplicate pairs: group docs by (band, band_sig) bucket
    * and expand each bucket's (doc_a < doc_b) pairs with array
    * combinatorics. One pass over the signatures (a self-join would
    * recompute the whole MinHash subtree for each side) and one shuffle on
    * the 36-byte bucket key; per-bucket work is quadratic only in the
    * bucket's size, which LSH keeps small by construction.
    */
  def lshCandidatePairs(docs: DataFrame, k: Int = 3, numHashes: Int = 8, numBands: Int = 4): DataFrame =
    bucketPairs(
      minhashBands(docs, k, numHashes, numBands),
      Seq("band", "band_sig"), "doc_id")
      .toDF("doc_a", "doc_b")
      .distinct()

  /** Expand each group's sorted (a < b) element pairs. */
  private[operators] def bucketPairs(df: DataFrame, keys: Seq[String], elem: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col(elem))).as("es"))
      .filter(size(col("es")) > 1)
      .select(explode(flatten(transform(
        col("es"),
        (a, i) => transform(
          slice(col("es"), i + 2, size(col("es"))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))

  /** The 100 TB dedup path: LSH candidate generation followed by exact
    * Jaccard verification via sorted-shingle-set intersection — quadratic
    * work only inside LSH buckets, never across the corpus. The candidate
    * set bounds recall (pairs below ~(1/bands)^(1/rowsPerBand) similarity
    * are increasingly likely to be missed), which is the standard
    * accuracy/scale trade; [[jaccardPairs]] is the exact baseline.
    *
    * Cache lifecycle: the fused signature+digest table this call builds
    * stays persisted (the result plan reads it three times — banding and
    * both verification join sides) and is owned by the caller's
    * evaluation of the result; one-shot callers should use
    * [[withLshVerifiedPairs]], which unpersists it after the action.
    */
  def lshVerifiedPairs(
      docs: DataFrame,
      k: Int = 3,
      numHashes: Int = 8,
      numBands: Int = 4,
      minJaccard: Double = 0.2): DataFrame =
    lshVerifiedPairsPlan(docs, k, numHashes, numBands, minJaccard)._1

  /** [[lshVerifiedPairs]] as a caller-owned-lifecycle bracket: runs the
    * action `f` over the pairs frame, then unpersists the signature
    * table this call persisted — the [[withNearDupAgainst]] convention
    * for one-shot callers (a bench sweep, a one-off audit) so
    * long-lived sessions never accumulate session-lifetime caches.
    */
  def withLshVerifiedPairs[T](
      docs: DataFrame,
      k: Int = 3,
      numHashes: Int = 8,
      numBands: Int = 4,
      minJaccard: Double = 0.2)(f: DataFrame => T): T = {
    val (result, cached) =
      lshVerifiedPairsPlan(docs, k, numHashes, numBands, minJaccard)
    try f(result) finally cached.unpersist()
  }

  private def lshVerifiedPairsPlan(
      docs: DataFrame,
      k: Int,
      numHashes: Int,
      numBands: Int,
      minJaccard: Double): (DataFrame, DataFrame) = {
    // ONE fused expression pass emits both the signature array (for
    // banding) and the distinct 60-bit shingle-digest set (for exact
    // verification) — one md5 per shingle, no exploded shingle table, and
    // the per-doc "reassemble the shingle set" shuffle drops out entirely
    // (the digest array is born per-doc). Verification intersects 8-byte
    // longs instead of shingle strings: ~5× less data through the
    // candidate joins, same jaccard up to md5-collision odds (~n²/2⁶⁰).
    // persist (not localCheckpoint) keeps lineage: on a real cluster a
    // lost executor recomputes blocks instead of killing the job. The
    // cache is read three times (banding + both join sides) and stays
    // owned by the session (LRU-evicted), like nearDupAgainst's indexes.
    val bridge = org.apache.spark.sql.graft.bridge
    val base = TextAnalysis.spread(docs)
      .select(
        col("doc_id"),
        bridge.column(graft.expressions.MinHashSigDigests(
          bridge.expression(TextAnalysis.wordsCol), k, numHashes)).as("sd"))
      .select(
        col("doc_id"),
        col("sd.sigs").as("sigs"),
        col("sd.shl").as("shl"),
        size(col("sd.shl")).cast("long").as("n_sh"))
      .filter(size(col("sigs")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bands = bandsFromArrays(base.select("doc_id", "sigs"), numHashes, numBands)
    val verified = bucketPairs(bands, Seq("band", "band_sig"), "doc_id")
      .toDF("doc_a", "doc_b")
      .distinct()
      .join(
        base.select(col("doc_id").as("doc_a"), col("shl").as("shl_a"), col("n_sh").as("n_a")),
        Seq("doc_a"))
      .join(
        base.select(col("doc_id").as("doc_b"), col("shl").as("shl_b"), col("n_sh").as("n_b")),
        Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("shl_a"), col("shl_b"))).cast("long"))
      .withColumn(
        "jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"), col("jaccard"))
    (verified, base)
  }

  /** Connected-component clustering of near-duplicate PAIRS into canonical
    * groups — the step production dedup needs after [[lshVerifiedPairs]] /
    * [[jaccardPairs]]: transitive near-dups (A≈B, B≈C) must collapse to
    * ONE kept document even when A and C never co-occurred in a bucket.
    *
    * Algorithm: hash-min label propagation with pointer doubling. Every
    * doc starts labeled with itself; each round takes the min of its own
    * and its neighbors' labels (one equi-join + one map-side-combined min
    * aggregate), then COMPRESSES paths by following the label one more
    * hop — `label(v) ← label(label(v))` — via a second self-join on the
    * freshly-propagated labels. Doubling makes the propagation distance
    * grow geometrically, so rounds needed = O(log diameter) instead of
    * O(diameter): a 1000-link chain of borderline near-dups (the
    * pathological shape for plain min-propagation) converges in ~10
    * rounds, not ~1000. No driver-side graph state; labels are the only
    * iterated data, and convergence is detected with a limit-1 probe, not
    * a full count. A component whose diameter outruns even the doubled
    * schedule would leave labels mid-propagation — silently splitting one
    * true cluster — so non-convergence THROWS rather than returning
    * partial clusters.
    *
    * Output: (doc_id, canonical_id, cluster_size, is_canonical) for every
    * doc that appears in some pair — `is_canonical` rows are the keep
    * set, sized for survivor joins.
    *
    * Hub skew: a giant component concentrates its hub vertex's key in
    * the per-round label-lookup join (every edge into the hub lands in
    * one `dst` partition) and, late in convergence, the shared canonical
    * label in the doubling self-join and the sizes join. AQE's
    * `OptimizeSkewedJoin` does NOT rescue these joins: the lookup side's
    * upstream partitioning (the label aggregate's hash on `src` ≡
    * `doc_id`, or the cached frame's layout) already satisfies the join
    * requirement after the rename, so that side has no fresh
    * `ENSURE_REQUIREMENTS` shuffle stage — and the rule only fires when
    * BOTH children are sort-over-shuffle-stage (verified empirically:
    * the star-graph plan shows `AQEShuffleRead coalesced`, never
    * `skew=true`). So the skew is bounded explicitly: keys whose row
    * count reaches `hotKeyThreshold` — vertex degree for the edge join
    * (static, computed once), per-round label counts for the doubling
    * join (from a map-side-combined agg whose shuffle volume is
    * #distinct (partition, label) pairs), and the already-computed
    * cluster sizes for the final join — are routed through a broadcast
    * join whose build side is tiny by construction (≤ 2|E|/threshold
    * keys, one lookup row each), while the cold remainder takes the
    * normal sort-merge path and is skew-free by definition. The min
    * aggregates themselves are map-side-combined, so no reduce task
    * ever sees a component's full membership. A blanket salt would
    * replicate the |V|-sized lookup table ×S every round; the hot/cold
    * split ships only the hot keys' single-row lookups.
    *
    * The split only engages when it can matter: every key's row count in
    * all three guarded joins is bounded by the symmetrized edge count
    * (degree ≤ |Eₛ|; label multiplicity ≤ |V| ≤ |Eₛ| since every vertex
    * heads at least one symmetrized row; cluster size ≤ |V|), so when
    * one `count()` of the already-persisted edges frame comes back below
    * the threshold, no hot key can exist and the loop runs the plain
    * sort-merge joins with zero added plan nodes or per-round detection
    * aggregates — the small-input fast path is exact, not heuristic.
    * DedupSkewSpec pins the behavior with task metrics on a star graph:
    * with the threshold at test scale no task's shuffle read comes near
    * the hub degree; the default-threshold control (hot set empty)
    * shows the full-degree concentration the split exists to avoid.
    */
  def dedupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame =
    dedupClustersWithIters(pairs, maxIters)._1

  /** One lookup row per hot key, broadcast; everything else sort-merge.
    *
    * `big` ⋈ `lookup` on `key`, where `lookup` has at most one row per
    * key and `big` may concentrate arbitrarily many rows on a few keys.
    * `hotKeys` (single-column, ≤ 2|E|/threshold rows by construction)
    * is broadcast three times in the same stage as `big`'s scan — semi
    * to carve the hot slice, anti for the cold — so the split itself
    * adds no shuffle; only the cold remainder reaches the sort-merge
    * exchange, and the hot slice meets its (tiny) lookup rows in a
    * broadcast hash join.
    */
  private def hotColdJoin(
      big: DataFrame,
      lookup: DataFrame,
      key: String,
      hotKeys: DataFrame,
      joinType: String): DataFrame = {
    val hk = broadcast(hotKeys.toDF("_hot_key"))
    val hot = big.join(hk, col(key) === col("_hot_key"), "left_semi")
      .join(
        broadcast(lookup.join(hk, lookup(key) === col("_hot_key"), "left_semi")),
        Seq(key), joinType)
    val cold = big.join(hk, col(key) === col("_hot_key"), "left_anti")
      .join(lookup, Seq(key), joinType)
    hot.unionByName(cold)
  }

  /** [[dedupClusters]] plus the number of rounds the label loop ran —
    * exposed so convergence-rate claims (the O(log d) doubling schedule)
    * are testable instead of asserted. `hotKeyThreshold` is the per-key
    * row count at which a join key is routed through the broadcast hot
    * path (see the skew note on [[dedupClusters]]); the default keeps a
    * hot key's worst-case single-task slice at ~100 MB of join input
    * while bounding the broadcast side at ≤ 2|E|/4M keys.
    */
  private[graft] def dedupClustersWithIters(
      pairs: DataFrame, maxIters: Int = 20,
      hotKeyThreshold: Long = 4000000L): (DataFrame, Int) = {
    // Symmetrize with one explode, not a self-union: a union would evaluate
    // the (possibly expensive) pairs subtree once per branch.
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Exact skew gate (see the scaladoc): any key of the three guarded
    // joins repeats at most |Eₛ| times, so a below-threshold edge count
    // proves the hot sets empty. ONE materialization pass serves both
    // the gate and the static hot-vertex set: the symmetric-degree
    // aggregate is map-side combined (shuffles ≤ |V| rows), its sum IS
    // the symmetrized edge count, and the hot filter over it is free —
    // a standalone edges.count() would pay a second full pass over the
    // cached edges for a number the degrees already carry.
    val degrees = edges.groupBy(col("dst")).agg(count(lit(1)).as("_deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = Option(degrees.agg(sum(col("_deg"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val splitNeeded = edgeCount >= hotKeyThreshold
    // Static hot-vertex set for the per-round edge⋈labels join: symmetric
    // degree is the exact per-key row count of that join's streamed side
    // and never changes across rounds. ≤ 2|E|/threshold rows — always
    // broadcastable. Materialize the FILTERED set and drop the |V|-row
    // degree table before the loop starts: pinning degrees across up to
    // maxIters rounds would hold |V|-scale cache hostage for a lookup
    // of at most a handful of rows.
    val hotV =
      if (!splitNeeded) { degrees.unpersist(); None }
      else {
        val hv = degrees.filter(col("_deg") >= hotKeyThreshold).select(col("dst"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        hv.count()
        degrees.unpersist()
        Some(hv)
      }
    // Initialization IS the first propagation round: label₀(v) =
    // min(v, neighbors(v)) from the same aggregation that enumerates the
    // vertex set — one groupBy instead of distinct + a full loop
    // iteration (for the common quasi-clique components this halves the
    // rounds to convergence).
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("src").as("doc_id"), least(col("src"), col("nbr")).as("label"))
    var prevCache: Option[DataFrame] = None
    var converged = false
    var it = 0
    // Scoped round width (r21, the Graphs-loop standard): each round's
    // label join flows ≤ |Eₛ| rows (already counted above for the skew
    // gate) — cluster-width exchanges on fixture-sized graphs are pure
    // task-scheduling overhead; the width returns to session scale at
    // ≥ 64k·parallelism edge rows. When the EXACT SKEW GATE is armed
    // (splitNeeded), the loop keeps the full session width regardless:
    // skew mitigation needs width to spread the cold remainder, and the
    // per-task read bound DedupSkewSpec pins is a width-dependent
    // guarantee (narrowing would re-concentrate uniform keys into
    // hub-degree-sized tasks at exactly the scales the split protects).
    Graphs.withRoundWidth(edges, if (splitNeeded) Long.MaxValue / 2 else edgeCount) {
    while (!converged && it < maxIters) {
      val roundStart = System.nanoTime()
      val dstLabels = labels.select(col("doc_id").as("dst"), col("label"))
      val nbrMin = hotV
        .map(hv => hotColdJoin(edges, dstLabels, "dst", hv, "inner"))
        .getOrElse(edges.join(dstLabels, Seq("dst")))
        .groupBy(col("src"))
        .agg(min(col("label")).as("nbr_min"))
      // Neighbor-min hop, cached: the doubling join below reads it twice
      // (as both sides), and re-evaluating it would re-run the join+agg.
      val prop = labels
        .join(nbrMin.select(col("src").as("doc_id"), col("nbr_min")), Seq("doc_id"), "left_outer")
        .select(
          col("doc_id"),
          col("label").as("_old"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Pointer doubling: label(v) ← label(label(v)). Every label value is
      // itself a vertex id (labels start as ids and only ever take mins of
      // ids), so the lookup side covers all labels; left_outer + coalesce
      // only guards the final, already-converged round.
      // Hot labels move round to round (a giant component converges to
      // one shared label with no high-degree vertex required — a long
      // path does it), so they are re-detected per round; the agg is
      // map-side-combined over the cached `prop`, shuffling only
      // #distinct (partition, label) pairs.
      val glLookup = prop.select(col("doc_id").as("label"), col("label").as("_gl"))
      val next = (if (splitNeeded) {
          val hotL = prop.groupBy(col("label")).agg(count(lit(1)).as("_c"))
            .filter(col("_c") >= hotKeyThreshold)
            .select(col("label"))
          hotColdJoin(prop, glLookup, "label", hotL, "left_outer")
        } else prop.join(glLookup, Seq("label"), "left_outer"))
        .select(
          col("doc_id"),
          col("_old"),
          least(col("label"), coalesce(col("_gl"), col("label"))).as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      converged = next.filter(col("label") =!= col("_old")).isEmpty
      prop.unpersist()
      prevCache.foreach(_.unpersist())
      prevCache = Some(next)
      // Reset the SQL plan each round: the fixpoint loop otherwise stacks
      // three joins of logical plan PER ITERATION, so Catalyst re-analyzes
      // the whole history every round (compile time grows superlinearly
      // and deep trees overflow the tree printer around ~10 rounds).
      // Rebuilding the frame from the cached RDD keeps RDD lineage — an
      // executor loss still recomputes blocks — while giving each round a
      // constant-depth plan. (localCheckpoint would also flatten the plan
      // but severs lineage, trading fault tolerance for nothing here.)
      val slim = next.select("doc_id", "label")
      labels = slim.sparkSession.createDataFrame(slim.rdd, slim.schema)
      it += 1
      // Convergence telemetry: an 11.5× wall-clock swing on a data refresh
      // is indistinguishable from a depth blow-up without per-round
      // numbers, and at 100 TB an unbounded round count IS the bottleneck.
      log.info(f"dedupClusters round $it: ${(System.nanoTime() - roundStart) / 1e9}%.2fs converged=$converged")
    }
    }
    log.info(s"dedupClusters: rounds=$it edges=$edgeCount skewSplit=$splitNeeded maxIters=$maxIters")
    // edges is only read inside the loop; lineage survives unpersist, so
    // dropping the blocks now is safe (and keeps long-lived sessions from
    // accumulating storage). The final labels cache stays — the returned
    // plan reads it twice (labels + sizes) — and is one small row per doc.
    edges.unpersist()
    hotV.foreach(_.unpersist())
    if (!converged) {
      prevCache.foreach(_.unpersist())
      throw new IllegalStateException(
        s"dedupClusters did not converge within maxIters=$maxIters " +
          "(a component's diameter exceeds it); partial labels would " +
          "silently split true clusters — raise maxIters")
    }
    val sz = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    // The sizes themselves are the hot detector here — a giant component
    // IS a hot `label` key in this join, and sz already counted it.
    val out = (if (splitNeeded)
        hotColdJoin(
          labels, sz, "label",
          sz.filter(col("cluster_size") >= hotKeyThreshold).select(col("label")),
          "inner")
      else labels.join(sz, Seq("label")))
      .select(
        col("doc_id"),
        col("label").as("canonical_id"),
        col("cluster_size"),
        (col("doc_id") === col("label")).as("is_canonical"))
    (out, it)
  }

  /** Per-document signature-PLUS-digest index
    * `(doc_id, sigs: array<long>, shl: array<long>, n_sh: long)` — the
    * [[signatureArrays]] shape extended with the distinct 60-bit
    * shingle-digest set, from the SAME fused one-md5-per-shingle pass
    * ([[graft.expressions.MinHashSigDigests]]), so carrying exact-verify
    * capability in a persisted kept-corpus index is nearly free: no extra
    * scan, no extra shuffle, ~|shingles| extra longs per doc at rest.
    */
  def signatureDigestIndex(docs: DataFrame, k: Int = 3, numHashes: Int = 8): DataFrame = {
    val bridge = org.apache.spark.sql.graft.bridge
    TextAnalysis.spread(docs)
      .select(
        col("doc_id"),
        bridge.column(graft.expressions.MinHashSigDigests(
          bridge.expression(TextAnalysis.wordsCol), k, numHashes)).as("sd"))
      .select(
        col("doc_id"),
        col("sd.sigs").as("sigs"),
        col("sd.shl").as("shl"),
        size(col("sd.shl")).cast("long").as("n_sh"))
      .filter(size(col("sigs")) > 0)
  }

  /** A kept-corpus signature index minus tombstoned documents — the
    * deletion path for the incremental near-dup index
    * ([[nearDupAgainst]]'s persisted `keptSignatures`): anti-join the
    * removed doc ids, so a taken-down kept document stops suppressing
    * future snapshots' near-duplicates WITHOUT re-shingling the kept
    * corpus. Exactly equals the from-scratch index over the surviving
    * corpus — the index is per-document, so unlike the graph-ANN edge
    * state there is no cross-document selection to repair and no slack
    * bound to respect. `tombstones` carries `doc_id` (extra columns
    * ignored) — a [[graft.streaming.StreamingOps.mergedTombstones]]
    * frame with its `vec_id` renamed.
    */
  def signatureIndexWithout(index: DataFrame, tombstones: DataFrame): DataFrame =
    index.join(tombstones.select(col("doc_id")), Seq("doc_id"), "left_anti")

  /** Incremental NEAR-dup dedup: keep only the snapshot documents with no
    * verified near-duplicate in an already-kept corpus — the MinHash
    * complement of [[graft.operators.Curation.dedupAgainst]] (which is
    * exact-digest only and misses jaccard≈0.98 rewordings).
    *
    * The kept corpus is represented purely by its signature index (pass a
    * persisted one via `keptSignatures`; text is never read from the kept
    * side), the shape that makes daily incremental dedup viable at
    * 100 TB: band-join the snapshot's bands against the kept index for
    * candidates, then verify each candidate pair. Shuffles are keyed on
    * band keys and doc ids only; candidate pairs are bounded by banding,
    * never all-pairs.
    *
    * Two verification modes:
    *   - `exactVerify = true` (default): exact jaccard over the distinct
    *     shingle-digest sets carried in the [[signatureDigestIndex]]
    *     shape, thresholded at `minJaccard`. Deterministic — a pair at
    *     true jaccard 0.74 vs 0.76 always classifies correctly.
    *   - `exactVerify = false`: signature agreement (fraction of matching
    *     MinHash components — an unbiased jaccard estimate) ≥
    *     `minSigAgreement`. Cheaper per pair and the index is smaller
    *     (`numHashes` longs, no digest set), but the estimate is
    *     quantized to 1/numHashes: with the default 8 hashes a borderline
    *     pair near the threshold admits/rejects on what is effectively a
    *     coin flip. Use only when the kept index cannot carry digests.
    *
    * Cache lifecycle: index frames THIS CALL builds stay persisted after
    * return — the result plan reads each several times (bands +
    * verification) — and are owned by the caller's evaluation of the
    * result; one-shot callers should use [[withNearDupAgainst]], which
    * unpersists them after the action. A caller-provided `keptSignatures`
    * is NOT persisted here (its lifecycle — typically persist once, reuse
    * across daily snapshots, unpersist at rotation — belongs to whoever
    * built it; that is the 100 TB incremental path).
    */
  def nearDupAgainst(
      kept: DataFrame,
      snapshot: DataFrame,
      k: Int = 3,
      numHashes: Int = 8,
      numBands: Int = 4,
      minSigAgreement: Double = 0.75,
      keptSignatures: Option[DataFrame] = None,
      exactVerify: Boolean = true,
      minJaccard: Double = 0.75,
      snapshotBounded: Boolean = false): DataFrame =
    nearDupAgainstPlan(kept, snapshot, k, numHashes, numBands, minSigAgreement,
      keptSignatures, exactVerify, minJaccard, snapshotBounded)._1

  /** [[nearDupAgainst]] as a caller-owned-lifecycle bracket: runs the
    * action `f` over the survivors frame, then unpersists every index
    * this call persisted (never a caller-provided `keptSignatures`).
    * Use for one-shot admissions so long-lived sessions don't
    * accumulate session-lifetime caches.
    */
  def withNearDupAgainst[T](
      kept: DataFrame,
      snapshot: DataFrame,
      k: Int = 3,
      numHashes: Int = 8,
      numBands: Int = 4,
      minSigAgreement: Double = 0.75,
      keptSignatures: Option[DataFrame] = None,
      exactVerify: Boolean = true,
      minJaccard: Double = 0.75,
      snapshotBounded: Boolean = false)(f: DataFrame => T): T = {
    val (result, cached) = nearDupAgainstPlan(kept, snapshot, k, numHashes,
      numBands, minSigAgreement, keptSignatures, exactVerify, minJaccard,
      snapshotBounded)
    try f(result) finally cached.foreach(_.unpersist())
  }

  /** [[withNearDupAgainst]]'s complement: the action runs over the
    * DROPPED ids (snapshot docs WITH a verified kept near-duplicate)
    * instead of the survivors. Callers holding the full snapshot frame
    * anti-join the dropped set away directly — one join and one
    * broadcast fewer per call than building the survivor list and
    * semi-joining it, which is the admission sink's per-micro-batch
    * steady state (ISO_r17: the gate-scale cost of that DAG is
    * plan-count-dominated, so removed subtrees are the honest lever).
    */
  private[graft] def withNearDupDropped[T](
      kept: DataFrame,
      snapshot: DataFrame,
      k: Int = 3,
      numHashes: Int = 8,
      numBands: Int = 4,
      minSigAgreement: Double = 0.75,
      keptSignatures: Option[DataFrame] = None,
      exactVerify: Boolean = true,
      minJaccard: Double = 0.75,
      snapshotBounded: Boolean = false)(f: DataFrame => T): T = {
    val (dropped, cached) = nearDupDroppedPlan(kept, snapshot, k, numHashes,
      numBands, minSigAgreement, keptSignatures, exactVerify, minJaccard,
      snapshotBounded)
    try f(dropped) finally cached.foreach(_.unpersist())
  }

  private def nearDupAgainstPlan(
      kept: DataFrame,
      snapshot: DataFrame,
      k: Int,
      numHashes: Int,
      numBands: Int,
      minSigAgreement: Double,
      keptSignatures: Option[DataFrame],
      exactVerify: Boolean,
      minJaccard: Double,
      snapshotBounded: Boolean): (DataFrame, Seq[DataFrame]) = {
    val (dropped, cached) = nearDupDroppedPlan(kept, snapshot, k, numHashes,
      numBands, minSigAgreement, keptSignatures, exactVerify, minJaccard,
      snapshotBounded)
    val out = snapshot.select(col("doc_id")).join(
      if (snapshotBounded) broadcast(dropped) else dropped,
      Seq("doc_id"), "left_anti")
    (out, cached)
  }

  private def nearDupDroppedPlan(
      kept: DataFrame,
      snapshot: DataFrame,
      k: Int,
      numHashes: Int,
      numBands: Int,
      minSigAgreement: Double,
      keptSignatures: Option[DataFrame],
      exactVerify: Boolean,
      minJaccard: Double,
      snapshotBounded: Boolean): (DataFrame, Seq[DataFrame]) = {
    // `snapshotBounded`: the snapshot is bounded-small by construction
    // (a streaming micro-batch, a per-trigger delta) — hint every
    // snapshot-derived side into a BROADCAST so the kept index NEVER
    // shuffles: band probe and verification run as map-side joins over
    // the (persisted) kept index partitions. This is the steady-state
    // incremental shape at 100 TB kept; leave false when the snapshot
    // is a full crawl (both sides large, shuffle co-partitioning wins).
    def bounded(df: DataFrame): DataFrame =
      if (snapshotBounded) broadcast(df) else df
    def index(df: DataFrame) =
      if (exactVerify) signatureDigestIndex(df, k, numHashes)
      else signatureArrays(df, k, numHashes)
    val keptArr = keptSignatures.getOrElse(
      index(kept).persist(StorageLevel.MEMORY_AND_DISK))
    val snapArr = index(snapshot)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ownedCaches = (if (keptSignatures.isEmpty) Seq(keptArr) else Nil) :+ snapArr
    val keptBands = bandsFromArrays(keptArr.select("doc_id", "sigs"), numHashes, numBands)
      .select(col("band"), col("band_sig"), col("doc_id").as("kept_doc"))
    val cands = bounded(bandsFromArrays(snapArr.select("doc_id", "sigs"), numHashes, numBands))
      .join(keptBands, Seq("band", "band_sig"))
      .select(col("doc_id").as("new_doc"), col("kept_doc"))
      .distinct()
    val dropped = (if (exactVerify) {
      // Exact verify: intersect the 8-byte digest sets — same jaccard as
      // re-shingling both texts (up to md5-collision odds ~n²/2⁶⁰), but
      // the kept side stays an index: no text ever moves.
      val nCommon = size(array_intersect(col("shl_a"), col("shl_b"))).cast("long")
      bounded(cands
        .join(
          snapArr.select(
            col("doc_id").as("new_doc"), col("shl").as("shl_a"), col("n_sh").as("n_a")),
          Seq("new_doc")))
        .join(
          keptArr.select(
            col("doc_id").as("kept_doc"), col("shl").as("shl_b"), col("n_sh").as("n_b")),
          Seq("kept_doc"))
        .filter(
          nCommon.cast("double") / (col("n_a") + col("n_b") - nCommon).cast("double")
            >= minJaccard)
    } else {
      // Estimate verify on the ARRAY shape: one zip_with per candidate
      // pair instead of exploding both sides to (doc, j, sig) and
      // re-aggregating — the agreement count never shuffles, only the
      // bounded candidate set does.
      val minAgree = math.ceil(minSigAgreement * numHashes).toInt
      val nAgree = aggregate(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v)
      bounded(cands
        .join(snapArr.select(col("doc_id").as("new_doc"), col("sigs").as("sig_a")), Seq("new_doc")))
        .join(keptArr.select(col("doc_id").as("kept_doc"), col("sigs").as("sig_b")), Seq("kept_doc"))
        .filter(nAgree >= minAgree)
    })
      .select(col("new_doc").as("doc_id"))
      .distinct()
    (dropped, ownedCaches)
  }

  /** Benchmark/eval-set contamination scan: every (corpus doc, benchmark
    * doc) pair sharing at least `minOverlap` distinct k-gram shingles,
    * with the exact overlap count — the decontamination pass an LLM
    * training pipeline runs so evaluation prompts don't leak into
    * training data (n-gram overlap is the standard published criterion).
    *
    * The benchmark side is eval-set-sized by nature, so its shingle
    * digests BROADCAST: the corpus is scanned exactly once, never
    * shuffled by shingle, and the only shuffle is the per-(doc, bench)
    * overlap count over rows that already matched — contaminated pairs,
    * not the corpus. Shingles come from the same fused
    * [[graft.expressions.ShingleDigests]] pass as [[jaccardPairs]]
    * (per-doc DISTINCT 60-bit digests, no string construction), so
    * `count` over join hits IS the distinct-shingle overlap.
    */
  def benchmarkContamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = 3,
      minOverlap: Int = 2): DataFrame = {
    val bridge = org.apache.spark.sql.graft.bridge
    def digests(df: DataFrame) = TextAnalysis.spread(df)
      .select(
        col("doc_id"),
        bridge.column(graft.expressions.ShingleDigests(
          bridge.expression(TextAnalysis.wordsCol), k)).as("ds"))
      .select(col("doc_id"), explode(col("ds")).as("shh"))
    val bench = digests(benchmark).select(col("doc_id").as("bench_id"), col("shh"))
    digests(corpus)
      .join(broadcast(bench), Seq("shh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minOverlap)
  }

  /** Per-document k-shingle coverage against a reference corpus — the
    * GRADED companion to [[benchmarkContamination]]'s thresholded flag:
    * for each corpus document, the fraction of its distinct shingles
    * that appear ANYWHERE in the reference. Decontamination pipelines
    * threshold this directly ("drop documents with > 80% eval-set
    * coverage"); pairwise attribution stays [[benchmarkContamination]]'s
    * job, per-pair similarity stays [[lshVerifiedPairs]]'s.
    *
    * Documents with fewer than `k` words have no shingles and emit no
    * row (coverage of an empty set is undefined — same no-row semantics
    * as [[hybridNearDupPairs]]).
    *
    * Scale: the reference digest set broadcasts (eval/reference sets
    * are small by nature — for corpus-sized references use the bloom
    * path); the corpus explodes to distinct (doc, digest) pairs NARROWLY
    * off one fused expression pass, and the only shuffle is the
    * (doc_id, two counts) aggregate. Text never shuffles.
    */
  /** Per-doc DISTINCT k-shingle digest rows `(keyCols..., shh)` — the
    * shared first stage of every exact-similarity join in this file
    * (jaccard, prefix-filter, containment, coverage, source overlap):
    * ONE fused [[graft.expressions.ShingleDigests]] pass, so text never
    * reaches an exchange and the digesting/threshold semantics cannot
    * drift between operators.
    */
  private def shingleDigestRows(
      docs: DataFrame, k: Int, keyCols: Seq[String] = Seq("doc_id")): DataFrame = {
    val bridge = org.apache.spark.sql.graft.bridge
    TextAnalysis.spread(docs)
      .select(
        keyCols.map(col) :+
          bridge.column(graft.expressions.ShingleDigests(
            bridge.expression(TextAnalysis.wordsCol), k)).as("ds"): _*)
      .select(keyCols.map(col) :+ explode(col("ds")).as("shh"): _*)
  }

  /** Each document's (df asc, digest)-ordered PREFIX of length
    * `n − ⌈pct·n/100⌉ + 1` — the AllPairs candidate index shared by
    * [[prefixFilterPairs]] (both sides) and [[containmentPairs]] (source
    * side only), so the global order and the prefix-length formula live
    * in exactly one place. Output: `(doc_id, shh, n_sh)`.
    */
  private def dfOrderedPrefix(shAll: DataFrame, pct: Long): DataFrame = {
    val dfTab = shAll.groupBy(col("shh")).agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val wRank = wDoc.orderBy(col("df"), col("shh"))
    shAll.join(dfTab, Seq("shh"))
      .withColumn("n_sh", count(lit(1)).over(wDoc))
      .withColumn("r", row_number().over(wRank))
      .filter(col("r") <=
        col("n_sh") - expr(s"CAST((n_sh * $pct + 99) DIV 100 AS BIGINT)") + 1L)
      .select(col("doc_id"), col("shh"), col("n_sh"))
  }

  def shingleCoverage(corpus: DataFrame, reference: DataFrame, k: Int = 3): DataFrame = {
    def digests(df: DataFrame) = shingleDigestRows(df, k)
    val ref = digests(reference).select(col("shh")).distinct()
      .withColumn("hit", lit(1L))
    digests(corpus)
      .join(broadcast(ref), Seq("shh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn(
        "coverage",
        col("n_hit").cast("double") / col("n_shingles").cast("double"))
  }

  /** Rare-shingle co-occurrence edges — the document graph whose
    * structure the graph operators ([[Graphs.pageRank]],
    * [[Graphs.triangleCounts]]) analyze: two documents connect iff they
    * share at least one k-shingle whose corpus document-frequency lies in
    * `[minDf, maxDf]`. Rare shared phrases are the contamination/
    * plagiarism signal (a df-2 shingle names exactly one borrowing); the
    * df CAP is also what makes the pair expansion scale-safe — a digest
    * at df ≤ maxDf emits at most C(maxDf, 2) pairs, so edges are linear
    * in distinct-digest volume with a constant factor, never the
    * quadratic blow-up an uncapped shared-token join hits on stopword
    * shingles. Output `(src, dst)` with `src < dst`, distinct.
    *
    * Scale: documents digest in place (text never shuffles), one
    * digest-keyed distinct + df count, and the bounded self-join on the
    * surviving digests.
    */
  def rareShingleEdges(
      docs: DataFrame,
      k: Int = 3,
      minDf: Long = 2L,
      maxDf: Long = 3L): DataFrame = {
    require(minDf >= 2L && maxDf >= minDf, s"df band [$minDf, $maxDf] invalid")
    val dig = shingleDigestRows(docs, k).distinct()
    val rare = dig.groupBy(col("shh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .select(col("shh"))
    val member = dig.join(rare, Seq("shh"))
    member.select(col("shh"), col("doc_id").as("src"))
      .join(member.select(col("shh"), col("doc_id").as("dst")), Seq("shh"))
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  /** Cross-source n-gram overlap matrix — the "which corpora share
    * content" QA dashboard a multi-source ingest runs before mixing
    * (template farms, syndicated text, and mirrored crawls show up as
    * high-jaccard source pairs). One row per source pair sharing at
    * least one distinct k-shingle: shared-shingle count, both sources'
    * distinct-shingle totals, and their exact jaccard.
    *
    * Scale: documents digest in place ([[graft.expressions.ShingleDigests]]
    * — text never shuffles), the one corpus shuffle is the
    * digest-keyed distinct + group, and the per-digest pair expansion is
    * bounded by the SOURCE count (a digest in s sources emits s(s−1)/2
    * pairs, never doc²); totals broadcast back over the sources-sized
    * pair table.
    */
  def sourceOverlapMatrix(docs: DataFrame, k: Int = 3): DataFrame = {
    val digests = shingleDigestRows(docs, k, keyCols = Seq("source")).distinct()
    val totals = digests.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val pairs = digests
      .groupBy(col("shh"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("srcs")) - 2),
        i => transform(
          slice(col("srcs"), i + lit(2), size(col("srcs")) - i - 1),
          b => struct(
            element_at(col("srcs"), i + 1).as("src_a"),
            b.as("src_b")))))).as("pr"))
      .groupBy(col("pr.src_a").as("src_a"), col("pr.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(totals.select(col("source").as("src_a"), col("n_sh").as("n_a"))), Seq("src_a"))
      .join(broadcast(totals.select(col("source").as("src_b"), col("n_sh").as("n_b"))), Seq("src_b"))
      .withColumn(
        "jaccard",
        col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
      .select(
        col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"), col("jaccard"))
  }

  /** Exact k-shingle Jaccard similarity for every pair of documents sharing
    * at least one shingle, thresholded. The join is on the shingle string,
    * so only co-shingled pairs are ever materialized; `jaccard` is a single
    * IEEE division of exact integers (deterministic across engines).
    *
    * `maxDocFreq` drops shingles present in more than that many documents
    * before the self-join — the standard exact-Jaccard-at-scale guard: a
    * boilerplate shingle (license header, template phrase) in m documents
    * would otherwise emit m²/2 join rows. Jaccard is then exact over the
    * filtered shingle universe (hot shingles leave both the intersection
    * and the per-doc counts, so near-identical boilerplate alone no longer
    * counts as similarity — usually the WANTED semantics for dedup).
    */
  def jaccardPairs(
      docs: DataFrame,
      k: Int = 3,
      minJaccard: Double = 0.2,
      maxDocFreq: Int = 100): DataFrame = {
    // The narrow pair expansion below materializes ≤ maxDocFreq²/2 rows
    // from ONE task's group — safe only while maxDocFreq is genuinely
    // small. Corpora needing a looser cap should use lshVerifiedPairs,
    // whose candidate generation never concentrates a key.
    require(maxDocFreq <= 1000, s"maxDocFreq=$maxDocFreq concentrates ~maxDocFreq²/2 " +
      "pair rows in one task; use lshVerifiedPairs for loosely-capped corpora")
    // Join on a 60-bit digest of the shingle, not the string (~3× less
    // shuffle volume, collisions ~n²/2^60); the exploded table is cached
    // once — both join sides and the per-doc counts reuse it. persist
    // keeps lineage (executor-loss-safe, unlike localCheckpoint).
    val shAll = shingleDigestRows(docs, k).persist(StorageLevel.MEMORY_AND_DISK)
    // ShingleDigests emits per-doc DISTINCT digests, so a plain count is
    // the document frequency. Hot digests are few — broadcast the
    // anti-join.
    val hot = shAll.groupBy(col("shh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("shh")
    // One aggregation groups each surviving shingle's docs into a sorted
    // list — bounded at maxDocFreq elements BECAUSE hot shingles are
    // already gone, so no group buffer can blow up. Pairs then expand
    // NARROWLY from each list (doc_a < doc_b for free from the sort)
    // instead of shuffling the shingle table through a second self-join
    // side and a sort-merge — one wide shuffle replaces three.
    val grp = shAll.join(broadcast(hot), Seq("shh"), "left_anti")
      .groupBy(col("shh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = grp.select(explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = grp
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "doc_a")))
      .select(col("doc_a"), explode(slice(col("ds"), col("i") + 2, size(col("ds")))).as("doc_b"))
      // ShingleDigests dedups per doc, so a doc_id cannot repeat within
      // `ds` anymore; the self-pair guard stays as a free invariant.
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(counts.select(col("doc_id"), col("n_sh").as("n_a")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(counts.select(col("doc_id"), col("n_sh").as("n_b")), col("doc_b") === col("doc_id"))
      .drop("doc_id")
      .withColumn(
        "jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"), col("jaccard"))
  }

  /** Exact set-similarity join by PREFIX FILTERING (Chaudhuri/Bayardo
    * AllPairs) — the third candidate-generation family next to banding
    * (LSH) and the hot-shingle-capped self-join ([[jaccardPairs]]), and
    * the only one of the three that is simultaneously EXACT and
    * uncapped: every pair with true jaccard ≥ t is found, no
    * `maxDocFreq` semantics change, no probabilistic recall. Each
    * document's distinct shingle digests are ordered by a GLOBAL total
    * order (document frequency asc, digest — rarest first, the standard
    * ordering that minimizes candidates); a document with n digests
    * indexes only its first `n − ⌈t·n⌉ + 1` ("prefix"). If J(A,B) ≥ t,
    * the globally smallest element of A∩B provably lies in BOTH
    * prefixes — were it outside A's, all of A∩B would fit in A's
    * ⌈t·n⌉−1 suffix slots, contradicting |A∩B| ≥ t·|A∪B| ≥ ⌈t·|A|⌉ —
    * so the prefix equi-join misses nothing. The threshold is an
    * integer percent and every admission test is integer arithmetic
    * (`100·common ≥ pct·(nₐ+n_b−common)`), so the operator is
    * engine-bit-identical with no float threshold edge.
    *
    * Scale: digests shuffle (never text); the df table and rank window
    * are digest-/doc-keyed aggregates; the candidate join runs on the
    * PREFIX table (≈ (1−t) of the digest volume, and rare-first keys
    * mean near-singleton join groups); verification counts matching
    * (pair, digest) rows against the cached digest table — the
    * pair-bounded candidate side broadcasts, so digests never ship as
    * per-pair arrays. The size filter
    * (`pct·nₐ ≤ 100·n_b` both ways) prunes before dedup. Cache
    * lifecycle: the digest table this call builds stays persisted — the
    * result plan reads it three times (df, prefix, verify sets) — and
    * is owned by the caller's evaluation of the result, like
    * [[jaccardPairs]]'s; one-shot callers should use
    * [[withPrefixFilterPairs]], which unpersists it after the action.
    */
  def prefixFilterPairs(
      docs: DataFrame,
      k: Int = 3,
      minJaccardPct: Int = 50): DataFrame =
    prefixFilterPairsPlan(docs, k, minJaccardPct)._1

  /** [[prefixFilterPairs]] as a caller-owned-lifecycle bracket: runs the
    * action `f` over the pairs frame, then unpersists the digest table
    * this call persisted. Use for one-shot joins (a bench sweep, a
    * one-off audit) so long-lived sessions don't accumulate
    * session-lifetime caches — the [[withNearDupAgainst]] convention.
    */
  def withPrefixFilterPairs[T](
      docs: DataFrame,
      k: Int = 3,
      minJaccardPct: Int = 50)(f: DataFrame => T): T = {
    val (result, cached) = prefixFilterPairsPlan(docs, k, minJaccardPct)
    try f(result) finally cached.unpersist()
  }

  /** Two interchangeable exact-verification strategies for the
    * prefix-filter family — same answer, different physical shape:
    *
    *  - `verifyByCounts = false` (default): per-doc sorted digest ARRAY
    *    aggregate, candidate pairs join both arrays, `array_intersect`
    *    counts the overlap. One digest-scale shuffle (the groupBy);
    *    array bytes ship through the pair joins. MEASURED FASTER at
    *    sf0.1 on this host (IsoBench q139 2.9 vs 4.5 s) — the pair set
    *    is small after prefix filtering, so the array traffic is noise
    *    while the count strategy's second digest-scale shuffle is not.
    *  - `verifyByCounts = true`: count matching (pair, digest) rows
    *    against the cached digest table — no arrays anywhere, but the
    *    (doc_b, shh) join re-shuffles the digest table. The shape that
    *    wins when candidate pairs × doc size outgrows executor memory
    *    (huge near-dup clusters), since no row ever carries a whole
    *    document's digest set.
    *
    * Both are exact; ISO_r19 records the measurements behind the
    * default.
    */
  private def prefixVerify(
      shAll: DataFrame,
      cand: DataFrame, // (doc_a, doc_b) — left < right or src/dst roles
      aCol: String,
      bCol: String,
      verifyByCounts: Boolean): DataFrame = {
    if (verifyByCounts) {
      val counts = shAll.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      shAll.select(col("doc_id").as(aCol), col("shh"))
        .join(cand, Seq(aCol))
        .join(shAll.select(col("doc_id").as(bCol), col("shh")), Seq(bCol, "shh"))
        .groupBy(col(aCol), col(bCol))
        .agg(count(lit(1)).as("n_common"))
        .join(counts.select(col("doc_id").as(aCol), col("n_sh").as("n_a")), Seq(aCol))
        .join(counts.select(col("doc_id").as(bCol), col("n_sh").as("n_b")), Seq(bCol))
    } else {
      val sets = shAll.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("shh"))).as("set"), count(lit(1)).as("n_sh"))
      cand
        .join(sets.select(col("doc_id").as(aCol), col("set").as("set_a"), col("n_sh").as("n_a")), Seq(aCol))
        .join(sets.select(col("doc_id").as(bCol), col("set").as("set_b"), col("n_sh").as("n_b")), Seq(bCol))
        .withColumn("n_common", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
        .select(col(aCol), col(bCol), col("n_common"), col("n_a"), col("n_b"))
    }
  }

  private[graft] def prefixFilterPairsPlan(
      docs: DataFrame,
      k: Int,
      minJaccardPct: Int,
      verifyByCounts: Boolean = false): (DataFrame, DataFrame) = {
    require(minJaccardPct >= 1 && minJaccardPct <= 100,
      s"minJaccardPct=$minJaccardPct outside [1, 100]")
    val pct = minJaccardPct.toLong
    val shAll = shingleDigestRows(docs, k).persist(StorageLevel.MEMORY_AND_DISK)
    val prefix = dfOrderedPrefix(shAll, pct)
    val cand = prefix.select(col("doc_id").as("doc_a"), col("shh"), col("n_sh").as("pn_a"))
      .join(
        prefix.select(col("doc_id").as("doc_b"), col("shh"), col("n_sh").as("pn_b")),
        Seq("shh"))
      .filter(col("doc_a") < col("doc_b") &&
        col("pn_a") * pct <= col("pn_b") * 100L &&
        col("pn_b") * pct <= col("pn_a") * 100L)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    val verified = prefixVerify(shAll, cand, "doc_a", "doc_b", verifyByCounts)
      .filter(lit(100L) * col("n_common") >= lit(pct) * (col("n_a") + col("n_b") - col("n_common")))
      .withColumn(
        "jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"), col("jaccard"))
    (verified, shAll)
  }

  /** Asymmetric CONTAINMENT join — quote/excerpt detection, the
    * direction jaccard is blind to: `C(A→B) = |A∩B| / |A| ≥ t` fires
    * when A's shingles sit inside B even if B is 100× larger (a long
    * page quoting a short doc scores jaccard ≈ 0 but containment ≈ 1).
    * One row per ORDERED pair (src quoted-in dst). Same prefix-filter
    * losslessness argument as [[prefixFilterPairs]], applied one-sided:
    * `|A∩B| ≥ ⌈t·|A|⌉` forces an intersection element into A's
    * `n − ⌈t·n⌉ + 1` prefix, so only the SOURCE side prefixes — the
    * containing side must stay fully indexed (containment puts no lower
    * bound on B's overlap share, so no B-prefix is sound). Integer
    * percent threshold; admission is exact integer arithmetic.
    *
    * Scale: the candidate join is (source-prefix × full digest table) —
    * digest-keyed, text never shuffles; the size filter
    * (`pct·n_src ≤ 100·n_dst`) prunes before dedup, and verification
    * counts matching (pair, digest) rows against the cached digest
    * table. Cache lifecycle:
    * the digest table this call builds stays persisted — the result
    * plan reads it four times (source prefix, candidate dst side, both
    * verify sets) — and is owned by the caller's evaluation of the
    * result; one-shot callers should use [[withContainmentPairs]],
    * which unpersists it after the action.
    */
  def containmentPairs(
      docs: DataFrame,
      k: Int = 3,
      minContainmentPct: Int = 80): DataFrame =
    containmentPairsPlan(docs, k, minContainmentPct)._1

  /** [[containmentPairs]] as a caller-owned-lifecycle bracket: runs the
    * action `f` over the ordered-pairs frame, then unpersists the
    * digest table this call persisted — the [[withPrefixFilterPairs]]
    * convention (VERDICT r18: the unbracketed gate leaked the digest
    * cache across the sweep and drifted 3.5× driver-vs-committed).
    */
  def withContainmentPairs[T](
      docs: DataFrame,
      k: Int = 3,
      minContainmentPct: Int = 80)(f: DataFrame => T): T = {
    val (result, cached) = containmentPairsPlan(docs, k, minContainmentPct)
    try f(result) finally cached.unpersist()
  }

  private[graft] def containmentPairsPlan(
      docs: DataFrame,
      k: Int,
      minContainmentPct: Int,
      verifyByCounts: Boolean = false): (DataFrame, DataFrame) = {
    require(minContainmentPct >= 1 && minContainmentPct <= 100,
      s"minContainmentPct=$minContainmentPct outside [1, 100]")
    val pct = minContainmentPct.toLong
    val shAll = shingleDigestRows(docs, k).persist(StorageLevel.MEMORY_AND_DISK)
    val srcPrefix = dfOrderedPrefix(shAll, pct)
      .select(col("doc_id").as("src_doc"), col("shh"), col("n_sh").as("pn_src"))
    val counts = shAll.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // Size filter BEFORE the candidate dedup (counts are per-doc scalars
    // — broadcastable — so the prune costs one cheap lookup per
    // candidate row and the distinct never sees size-infeasible pairs).
    val cand = srcPrefix
      .join(shAll.select(col("doc_id").as("dst_doc"), col("shh")), Seq("shh"))
      .filter(col("src_doc") =!= col("dst_doc"))
      .join(
        broadcast(counts.select(col("doc_id").as("dst_doc"), col("n_sh").as("n_dst"))),
        Seq("dst_doc"))
      .filter(col("pn_src") * pct <= col("n_dst") * 100L)
      .select(col("src_doc"), col("dst_doc"))
      .distinct()
    // Same dual-strategy verification as [[prefixFilterPairs]] (see
    // [[prefixVerify]]): every candidate shares >= 1 prefix digest, so
    // neither strategy loses a pair.
    val verified = prefixVerify(shAll, cand, "src_doc", "dst_doc", verifyByCounts)
      .withColumnRenamed("n_a", "n_src")
      .withColumnRenamed("n_b", "n_dst")
      .filter(lit(100L) * col("n_common") >= lit(pct) * col("n_src"))
      .withColumn(
        "containment",
        col("n_common").cast("double") / col("n_src").cast("double"))
      .select(
        col("src_doc"), col("dst_doc"), col("n_common"),
        col("n_src"), col("n_dst"), col("containment"))
    (verified, shAll)
  }

  /** Hybrid semantic+lexical near-dup detection — embedding recall,
    * lexical precision: candidate pairs come from the embedding space
    * (sign-LSH bucket mates at exact quantized cosine ≥ `minCosine` —
    * catches paraphrases lexical shingles miss), and every candidate is
    * verified with exact word-shingle jaccard on the TEXT (kills
    * topically-similar-but-distinct pairs a cosine threshold admits).
    * Both scores are emitted per pair with the `is_dup` verdict, so the
    * same output serves as a dup list (filter) and as a
    * threshold-calibration report (don't).
    *
    * Joins documents to embeddings positionally (`doc_id` = `vec_id` —
    * the testdata contract; real corpora carry the mapping explicitly).
    *
    * Scale design: candidate generation is bucket-confined (the
    * embedding table shuffles once on bucket keys); verification joins
    * the candidate PAIRS (LSH-bounded, not corpus-sized) to the per-doc
    * distinct shingle-digest arrays from one fused expression pass —
    * intersection on 60-bit longs, text itself never shuffles.
    *
    * Cache lifecycle: the bucketed-embedding and shingle-set tables this
    * call builds stay persisted (each feeds two consumers in the result
    * plan) and are owned by the caller's evaluation of the result;
    * one-shot callers should use [[withHybridNearDupPairs]], which
    * unpersists both after the action.
    */
  def hybridNearDupPairs(
      docs: DataFrame,
      embeddings: DataFrame,
      minCosine: Double = 0.2,
      minJaccard: Double = 0.5,
      k: Int = 3): DataFrame =
    hybridNearDupPairsPlan(docs, embeddings, minCosine, minJaccard, k)._1

  /** [[hybridNearDupPairs]] as a caller-owned-lifecycle bracket: runs
    * the action `f` over the scored-pairs frame, then unpersists the
    * two index tables this call persisted — the [[withNearDupAgainst]]
    * convention for one-shot callers.
    */
  def withHybridNearDupPairs[T](
      docs: DataFrame,
      embeddings: DataFrame,
      minCosine: Double = 0.2,
      minJaccard: Double = 0.5,
      k: Int = 3)(f: DataFrame => T): T = {
    val (result, cached) =
      hybridNearDupPairsPlan(docs, embeddings, minCosine, minJaccard, k)
    try f(result) finally cached.foreach(_.unpersist())
  }

  private def hybridNearDupPairsPlan(
      docs: DataFrame,
      embeddings: DataFrame,
      minCosine: Double,
      minJaccard: Double,
      k: Int): (DataFrame, Seq[DataFrame]) = {
    val bridge = org.apache.spark.sql.graft.bridge
    // Both self-join sides consume the quantize+bucket pass, and both
    // pair ends consume the digest pass — persist each so the embedding
    // and document corpora are scanned once, not once per consumer.
    val bq = Similarity
      .signBucketsQuantized(embeddings, Similarity.DefaultNumPlanes, 64)
      .select(col("vec_id"), col("_qe").as("qe"), col("bucket"))
      .withColumn("n2", Similarity.dot(col("qe"), col("qe")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hi = bq.select(
      col("vec_id").as("doc_b"), col("qe").as("qe_b"),
      col("n2").as("n2_b"), col("bucket"))
    val cand = bq.join(hi, Seq("bucket"))
      .filter(col("vec_id") < col("doc_b"))
      .withColumn("dp", Similarity.dot(col("qe"), col("qe_b")))
      .withColumn(
        "cosine",
        col("dp").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("n2_b").cast("double"))))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_id").as("doc_a"), col("doc_b"), col("cosine"))
    // Docs with < k words have NO shingles: keep no row for them (the
    // inner joins below then drop any candidate pair touching one),
    // which also makes the jaccard denominator ≥ 1 — no 0/0-NaN pair
    // can survive to the `is_dup` comparison.
    val sets = TextAnalysis.spread(docs).select(
      col("doc_id"),
      bridge.column(graft.expressions.ShingleDigests(
        bridge.expression(TextAnalysis.wordsCol), k)).as("ds"))
      .filter(size(col("ds")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val scored = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("ds").as("ds_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("ds").as("ds_b")), Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("ds_a"), col("ds_b"))).cast("long"))
      .withColumn("n_a", size(col("ds_a")).cast("long"))
      .withColumn("n_b", size(col("ds_b")).cast("long"))
      .withColumn(
        "jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .withColumn("is_dup", col("jaccard") >= minJaccard)
      .select(
        col("doc_a"), col("doc_b"), col("cosine"),
        col("n_common"), col("n_a"), col("n_b"), col("jaccard"), col("is_dup"))
    (scored, Seq(bq, sets))
  }

  /** Sub-document boilerplate removal (the RefinedWeb/CCNet "repeated
    * span" pass): each document is cut into fixed-width non-overlapping
    * token passages; a passage whose content digest appears in MORE than
    * `maxDocFreq` distinct documents is boilerplate (license headers,
    * navigation chrome, templated paragraphs), and every occurrence is
    * dropped from every document. Complements whole-document dedup
    * ([[exactDuplicates]]/[[lshVerifiedPairs]]): those decide which DOCS
    * to keep, this cleans the insides of the keepers.
    *
    * Output per document: `(doc_id, n_passages, n_dropped, clean_text)`
    * where `clean_text` is the surviving passages rejoined in document
    * order with single spaces (whitespace-normalized — the tokenizer
    * already collapses runs, see [[TextAnalysis.wordsCol]]).
    *
    * Scale design (100 TB): the document-frequency aggregate shuffles
    * ONLY 60-bit passage digests — text never leaves its scan partition
    * until the final doc_id join. The per-doc drop list (`chunk` indexes
    * of boilerplate passages) is bounded by the doc's own passage count,
    * and clean text is rebuilt NARROWLY from the original words array by
    * index-filtering — passages are never shuffled as strings. The one
    * text-bearing shuffle is the final doc_id equi-join against the
    * drop lists (only docs that HAVE boilerplate appear on the right
    * side; AQE broadcasts it when the boilerplate footprint is small).
    *
    * The ragged tail chunk (< `passageLen` tokens) participates like any
    * other passage: short boilerplate tails are real (signature lines),
    * and uniform treatment keeps the semantics one sentence long.
    */
  def passageDedup(
      docs: DataFrame,
      passageLen: Int = 8,
      maxDocFreq: Long = 1): DataFrame =
    passageDedupAgainst(docs, passageDigestCounts(docs, passageLen), passageLen, maxDocFreq)

  private def passagesOf(words: Column, passageLen: Int): Column =
    transform(
      sequence(lit(0), floor((size(words) + passageLen - 1) / passageLen).cast("int") - 1),
      i => array_join(slice(words, i * passageLen + 1, lit(passageLen)), " "))

  /** `(doc_id, chunk, dig)` — passage strings are hashed and DISCARDED
    * before any shuffle; only digests aggregate.
    */
  private def passageDigests(docs: DataFrame, passageLen: Int): DataFrame = {
    require(passageLen >= 1, s"passageLen=$passageLen must be >= 1")
    TextAnalysis.spread(docs)
      .select(
        col("doc_id"),
        posexplode(passagesOf(TextAnalysis.wordsCol, passageLen)).as(Seq("chunk", "p")))
      .select(col("doc_id"), col("chunk"), graft.functions.Hashing.md5Long60(col("p")).as("dig"))
  }

  /** [[passageDedup]]'s persisted/merge state: the passage-digest
    * document-frequency table `(dig, df)` for a corpus slice. Merge
    * DOC-DISJOINT slices (daily batches, shards) with
    * [[mergePassageCounts]] — df sums — and clean any batch against the
    * merged global state with [[passageDedupAgainst]]: cleaning batch B
    * against `merge(counts(A), counts(B))` equals running the batch
    * pipeline over A ∪ B restricted to B's documents (pinned by spec),
    * so yesterday's corpus is never re-chunked.
    */
  def passageDigestCounts(docs: DataFrame, passageLen: Int = 8): DataFrame =
    passageDigests(docs, passageLen)
      .groupBy(col("dig"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** Digest-wise sum of doc-disjoint slices' frequency tables. */
  def mergePassageCounts(counts: Seq[DataFrame]): DataFrame = {
    require(counts.nonEmpty, "nothing to merge")
    counts.reduce(_ unionByName _).groupBy(col("dig")).agg(sum(col("df")).as("df"))
  }

  /** Offset-robust sub-document boilerplate removal — the dense-window
    * complement of [[passageDedup]]. That operator cuts ALIGNED
    * fixed-width passages, so the same boilerplate shifted by even one
    * token across documents lands in differently-aligned chunks and is
    * missed. Here every document emits a digest for EVERY `windowLen`-
    * token window (stride 1, the Lee et al. "Deduplicating Training
    * Data" any-offset idea at word granularity): a window whose digest
    * occurs in more than `maxDocFreq` distinct documents is boilerplate
    * wherever it starts, and every token any boilerplate window covers
    * is dropped from every document.
    *
    * Stride 1 is load-bearing, not a tunable: windows sampled every
    * `s > 1` tokens only collide when the two occurrences' start
    * offsets agree mod `s` — the same aliasing that breaks the aligned
    * variant (`s = windowLen`), just with a smaller modulus. Dense
    * windows are the unique stride with the any-offset guarantee; the
    * price is `windowLen ×` the digest rows of the aligned pass (still
    * 12-byte digests, never text). Spans shorter than `windowLen` are
    * below the resolution — whole-document dedup and the aligned
    * variant's ragged tail cover the short-chrome cases.
    *
    * Output per document: `(doc_id, n_tokens, n_dropped, clean_text)` —
    * token granularity, because drops are unions of overlapping windows
    * rather than disjoint chunks. Clean text is rebuilt NARROWLY by
    * index-filtering the original words array (an O(n) hash
    * `array_except` of positions, not an O(n·drops) scan).
    *
    * Scale design (100 TB): identical shape to [[passageDedup]] — the
    * document-frequency aggregate shuffles only 60-bit digests, the
    * per-doc drop list is bounded by the doc's window count, and the
    * one text-bearing shuffle is the final doc_id join against docs
    * that actually contain boilerplate.
    */
  def rollingPassageDedup(
      docs: DataFrame,
      windowLen: Int = 8,
      maxDocFreq: Long = 1): DataFrame =
    rollingPassageDedupAgainst(
      docs, rollingDigestCounts(docs, windowLen), windowLen, maxDocFreq)

  /** `(doc_id, start, dig)` — window strings are hashed and DISCARDED
    * before any shuffle; only digests aggregate. One fused codegen pass
    * ([[graft.expressions.RollingDigests]]) per document: word bytes
    * extracted once, md5 per window with no per-window string/array
    * construction — digest-identical to
    * `graft_md5_60(array_join(slice(words, s+1, w), ' '))`, which is
    * what the DuckDB oracles replay.
    */
  private def rollingDigests(docs: DataFrame, windowLen: Int): DataFrame = {
    require(windowLen >= 1, s"windowLen=$windowLen must be >= 1")
    val bridge = org.apache.spark.sql.graft.bridge
    TextAnalysis.spread(docs)
      .select(
        col("doc_id"),
        posexplode(bridge.column(graft.expressions.RollingDigests(
          bridge.expression(TextAnalysis.wordsCol), windowLen))).as(Seq("start", "dig")))
  }

  /** [[rollingPassageDedup]]'s persisted/merge state, the twin of
    * [[passageDigestCounts]]: `(dig, df)` over dense windows. Merge
    * doc-disjoint slices with [[mergePassageCounts]] (df sums) and
    * clean a batch against global state with
    * [[rollingPassageDedupAgainst]] — merge-equals-batch is pinned by
    * spec exactly like the aligned variant.
    */
  def rollingDigestCounts(docs: DataFrame, windowLen: Int = 8): DataFrame =
    rollingDigests(docs, windowLen)
      .groupBy(col("dig"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** Strip offset-robust boilerplate from `batch` using a GLOBAL dense-
    * window frequency state (must already include the batch's own
    * counts). Same output shape as [[rollingPassageDedup]].
    */
  def rollingPassageDedupAgainst(
      batch: DataFrame,
      globalCounts: DataFrame,
      windowLen: Int = 8,
      maxDocFreq: Long = 1): DataFrame = {
    val boiler = globalCounts.filter(col("df") > maxDocFreq).select("dig")
    val drops = rollingDigests(batch, windowLen).join(boiler, Seq("dig"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("start"))).as("starts"))
    stripWindowSpans(batch, drops, windowLen)
  }

  /** Corpus-wide EXACT-substring dedup — the Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better")
    * ExactSubstr pass at word granularity, computed relationally instead
    * of with their single-node suffix array: every token covered by some
    * `windowLen`-token span occurring MORE THAN ONCE anywhere in the
    * corpus (another document OR the same one — occurrence count, not
    * document frequency, which is what separates this from
    * [[rollingPassageDedup]]) is stripped from every occurrence, the
    * paper's remove-all-copies semantics. A duplicated span longer than
    * `windowLen` is the union of its overlapping duplicated windows, so
    * it is found and removed in full at ANY length — the suffix-array
    * answer set, reached by the islands trick over marked window starts.
    *
    * Per document: token/drop counts, the longest maximal duplicated
    * REGION (`longest_dup_span` — contiguous union of duplicated
    * windows, the exact span the removal strips; adjacent distinct
    * repeats merge into one region), the region count, and the rebuilt
    * clean text.
    *
    * Scale: window text is digested per document and DISCARDED before
    * any shuffle ([[graft.expressions.RollingDigests]] — one fused
    * codegen pass); the occurrence count is a digest-only map-side-
    * combined aggregate, the mark-back join is digest-keyed, and
    * spans/strip are doc-keyed with per-doc array lambdas. Nothing
    * quadratic, no suffix array to shard.
    */
  def exactSubstrDedup(docs: DataFrame, windowLen: Int = 8): DataFrame =
    exactSubstrDedupOwned(docs, windowLen)._1

  /** [[exactSubstrDedup]] plus the release handle for the digest cache
    * the call persists — the bracket form long-lived sessions want
    * (call the second element once the returned frame is consumed; the
    * [[graft.streaming.StreamingOps.corpusAdmissionSinkOwned]]
    * convention). The plain wrapper leaves the cache to LRU eviction,
    * acceptable for bounded runs (bench/verify clear caches per block).
    *
    * Why not materialize-and-release inside the call: the dependents of
    * the digest frame are the RESULT (per-doc rebuilt clean text — a
    * corpus copy, strictly worse to pin than 3 longs per window) and
    * the occurrence counts (whose consumer, the mark-back join, reads
    * the digest frame again anyway) — so unlike the bounded-answer
    * operators (outlierRanks, graphAnnSearch) there is no small frame
    * that can own the cache.
    */
  def exactSubstrDedupOwned(
      docs: DataFrame, windowLen: Int = 8): (DataFrame, () => Unit) = {
    // Persist the fused digest scan: the one-shot pass reads it for the
    // occurrence count AND the mark-back join — unpersisted, the corpus
    // scan (and per-window md5 work) would execute once per consumer.
    // Bounded: 3 longs per window.
    val g = rollingDigests(docs, windowLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (exactSubstrFrom(g, docs, occurrenceCountsOf(g), windowLen),
      () => { g.unpersist(); () })
  }

  /** ExactSubstr's incremental state: corpus-wide window-digest
    * OCCURRENCE counts (not document frequencies — self-repeats must
    * count, see [[exactSubstrDedup]]). Additive over doc-disjoint
    * slices, so per-epoch streaming state merges by digest-wise sum
    * ([[graft.streaming.StreamingOps.exactSubstrCountsSink]]).
    */
  def rollingOccurrenceCounts(docs: DataFrame, windowLen: Int = 8): DataFrame =
    occurrenceCountsOf(rollingDigests(docs, windowLen))

  /** The ONE canonical digests→occurrence aggregation: the q231 gate's
    * merge-equals-batch identity depends on the one-shot pass and the
    * streaming state counting identically, so both call this.
    */
  private def occurrenceCountsOf(digests: DataFrame): DataFrame =
    digests.groupBy(col("dig")).agg(count(lit(1)).as("occ"))

  /** Strip `batch` against a GLOBAL occurrence-count state (which must
    * already include the batch's own windows). Same output shape and
    * semantics as [[exactSubstrDedup]] — with the global state the
    * one-shot batch pass and the merged streaming state are the same
    * frame, which is the q231 gate.
    */
  def exactSubstrDedupAgainst(
      docs: DataFrame,
      globalCounts: DataFrame,
      windowLen: Int = 8): DataFrame =
    exactSubstrFrom(rollingDigests(docs, windowLen), docs, globalCounts, windowLen)

  private def exactSubstrFrom(
      g: DataFrame,
      docs: DataFrame,
      globalCounts: DataFrame,
      windowLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dupDigs = globalCounts.filter(col("occ") > 1L).select(col("dig"))
    // `marked` feeds both the span aggregate and the drop set, but is
    // deliberately NOT persisted: both consumers live in ONE final plan,
    // where the planner reuses the join's exchange — measured: adding a
    // persist here cost q231 ~2 s (cache materialization + broken
    // pipelines) while saving nothing. The BATCH wrapper persists `g`
    // instead, which is what keeps the corpus scan single-pass.
    val marked = g.join(dupDigs, Seq("dig")).select(col("doc_id"), col("start"))
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    val spans = marked
      .withColumn("grp", col("start") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(
        max(col("run") + lit(windowLen - 1L)).as("longest_dup_span"),
        count(lit(1)).as("n_dup_spans"))
    val drops = marked.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("start"))).as("starts"))
    stripWindowSpans(docs, drops, windowLen)
      .join(spans, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"), col("n_dropped"),
        coalesce(col("longest_dup_span"), lit(0L)).as("longest_dup_span"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        col("clean_text"))
  }

  /** The act-on-it companion to [[substringDecontaminate]]: instead of
    * REPORTING the longest shared span, DROP every token covered by any
    * matched reference window — the PaLM/GPT-style "remove n-gram
    * overlap with the eval set" decontamination step, offset-exact and
    * span-shaped (a longer shared span is the union of its overlapping
    * matched windows, so it is removed in full). Output per document is
    * [[rollingPassageDedup]]'s shape: `(doc_id, n_tokens, n_dropped,
    * clean_text)` with clean text rebuilt narrowly from surviving
    * positions.
    *
    * Same scale posture as the report variant: digest-keyed probe join
    * against the (persistable, `maxDigFreq`-capped) [[substringIndex]];
    * the one text-bearing join is the final per-doc assembly.
    */
  def substringDecontaminateStrip(
      docs: DataFrame,
      reference: DataFrame,
      windowLen: Int = 8,
      maxDigFreq: Long = 256,
      referenceIndex: Option[DataFrame] = None): DataFrame = {
    val index = referenceIndex.getOrElse(substringIndex(reference, windowLen, maxDigFreq))
    val drops = rollingDigests(docs, windowLen)
      .join(index.select("dig").distinct(), Seq("dig"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("start"))).as("starts"))
    stripWindowSpans(docs, drops, windowLen)
  }

  /** Longest repeated substring WITHIN each document — the
    * self-similarity half of the Lee et al. exact-substring family
    * ([[substringDecontaminate]] is the cross-corpus half). A window
    * digest occurring at positions `s` and `s + off` of the same
    * document pairs up; consecutive `s` at the same `off` chain into a
    * TRUE internal repeat of `windowLen + run − 1` tokens occurring at
    * `best_start` and `best_start + best_gap` (possibly overlapping, as
    * in the classic suffix-array LRS). Per document: the longest such
    * repeat (total tie-break: length desc, start, gap), plus how many
    * window starts participate in any repeat — the graded signal
    * [[graft.functions.TextAnalysis]]'s q41 repetition ratio thresholds.
    *
    * `maxRepeat` drops digests occurring more than that many times in
    * one document before pairing (m occurrences would seed m²/2 pairs —
    * degenerate loops are q41's business, not this operator's); the cap
    * makes per-doc pair fan-out ≤ maxRepeat²/2 per digest. Shuffles
    * carry digests and positions only.
    */
  def selfRepeatedSubstrings(
      docs: DataFrame,
      windowLen: Int = 8,
      maxRepeat: Long = 64): DataFrame = {
    require(maxRepeat >= 2, s"maxRepeat=$maxRepeat must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val wins = rollingDigests(docs, windowLen)
    val occ = wins.groupBy(col("doc_id"), col("dig")).agg(count(lit(1)).as("occ"))
    val rep = wins.join(
      occ.filter(col("occ") >= 2 && col("occ") <= maxRepeat).select("doc_id", "dig"),
      Seq("doc_id", "dig"))
    // (doc, s1, off): s1 and dig determine s2 = s1 + off, so the pair
    // set is already duplicate-free — no distinct needed.
    val pairs = rep.select(col("doc_id"), col("dig"), col("start").as("s1"))
      .join(rep.select(col("doc_id"), col("dig"), col("start").as("s2")), Seq("doc_id", "dig"))
      .filter(col("s1") < col("s2"))
      .select(col("doc_id"), col("s1"), (col("s2") - col("s1")).as("off"))
    val byAlignment = Window.partitionBy("doc_id", "off").orderBy("s1")
    val runs = pairs
      .withColumn("grp", col("s1") - row_number().over(byAlignment))
      .groupBy(col("doc_id"), col("off"), col("grp"))
      .agg(min(col("s1")).as("start"), count(lit(1)).as("run"))
      .withColumn("repeat_len", col("run") + lit(windowLen - 1L))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("repeat_len").desc, col("start"), col("off"))
    val best = runs
      .withColumn("rn", row_number().over(byDoc)).filter(col("rn") === 1)
      .select(
        col("doc_id"), col("repeat_len"),
        col("start").as("best_start"), col("off").as("best_gap"))
    val coverage = rep.groupBy(col("doc_id"))
      .agg(countDistinct(col("start")).as("n_repeat_windows"))
    TextAnalysis.spread(docs)
      .select(col("doc_id"), size(TextAnalysis.wordsCol).cast("long").as("n_tokens"))
      .join(best, Seq("doc_id"), "left")
      .join(coverage, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("repeat_len"), lit(0L)).as("max_repeat_len"),
        col("best_start"), col("best_gap"),
        coalesce(col("n_repeat_windows"), lit(0L)).as("n_repeat_windows"),
        (coalesce(col("repeat_len"), lit(0L)) >= windowLen).as("has_repeat"))
  }

  /** Shared tail of the window-span removers: drop every token covered
    * by a window starting at any of `drops.starts`, rebuild clean text
    * narrowly by index-filtering the words array.
    */
  private def stripWindowSpans(
      batch: DataFrame, drops: DataFrame, windowLen: Int): DataFrame =
    batch
      .join(drops, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        TextAnalysis.wordsCol.as("words"),
        coalesce(col("starts"), array().cast("array<int>")).as("st"))
      .withColumn(
        "drop_pos",
        array_distinct(flatten(
          transform(col("st"), s => sequence(s, s + windowLen - 1)))))
      .withColumn(
        "keep_pos",
        array_except(
          when(size(col("words")) > 0, sequence(lit(0), size(col("words")) - 1))
            .otherwise(array().cast("array<int>")),
          col("drop_pos")))
      .select(
        col("doc_id"),
        size(col("words")).cast("long").as("n_tokens"),
        size(col("drop_pos")).cast("long").as("n_dropped"),
        array_join(
          transform(col("keep_pos"), p => element_at(col("words"), p + 1)),
          " ").as("clean_text"))

  /** Offset-exact VARIABLE-LENGTH substring decontamination against a
    * reference corpus — the Lee et al. ("Deduplicating Training Data
    * Makes Language Models Better") exact-substring family, computed
    * relationally instead of with a suffix array. [[rollingPassageDedup]]
    * answers "does any fixed-width window repeat?"; this answers "what is
    * the LONGEST exact token span this document shares with the
    * reference corpus, and where?" — the decontamination question
    * (benchmark text embedded in training documents at arbitrary offset
    * and arbitrary length).
    *
    * Mechanism: both sides emit dense width-`windowLen` rolling window
    * digests WITH their positions; probe windows join the reference
    * index on the digest, and each match carries
    * `(doc, start, ref_doc, ref_start)`. Digest equality of ONE window
    * proves only a `windowLen`-token match — but a run of matches with
    * consecutive `start`s at the SAME `(ref_doc, start - ref_start)`
    * alignment chains them: `doc[s .. s+w+r-2] = ref_doc[s-o ..]` for a
    * run of `r` windows, a TRUE exact common substring of
    * `windowLen + r - 1` tokens (the suffix-array answer, reached by the
    * islands trick `start - row_number()` per alignment group). Per
    * document the longest such span is reported with a total tie-break
    * (length desc, ref_doc, start, alignment), plus the matched-window
    * coverage count.
    *
    * Digests whose reference occurrence count exceeds `maxDigFreq` are
    * excluded from the index (and from the probe by construction of the
    * join): a window that occurs hundreds of times is corpus chrome, not
    * contamination — [[rollingPassageDedup]] is the operator for those —
    * and the cap bounds the join's fan-out, which is what makes the
    * operator safe at 100 TB (otherwise one hot digest × its reference
    * occurrence list is a cross-product seed). All shuffles carry 60-bit
    * digests and positions, never text; the reference index
    * `(dig, ref_doc, ref_start)` is the persistable incremental state,
    * exactly like [[rollingDigestCounts]].
    */
  /** The reference side of [[substringDecontaminate]] /
    * [[substringDecontaminateStrip]] as a standalone, PERSISTABLE frame:
    * `(dig, ref_doc, ref_start)` for every dense `windowLen`-token
    * window of the reference, with digests above `maxDigFreq` reference
    * occurrences excluded (corpus chrome + join-fan-out bound). This is
    * the incremental state — build once per benchmark/eval release,
    * persist, pass to every decontamination batch via `referenceIndex`,
    * exactly like `keptSignatures` for [[nearDupAgainst]].
    */
  def substringIndex(
      reference: DataFrame,
      windowLen: Int = 8,
      maxDigFreq: Long = 256): DataFrame = {
    require(maxDigFreq >= 1, s"maxDigFreq=$maxDigFreq must be >= 1")
    val refWins = rollingDigests(reference, windowLen)
      .select(col("dig"), col("doc_id").as("ref_doc"), col("start").as("ref_start"))
    val hot = refWins.groupBy(col("dig"))
      .agg(count(lit(1)).as("occ")).filter(col("occ") > maxDigFreq).select("dig")
    refWins.join(hot, Seq("dig"), "left_anti")
  }

  def substringDecontaminate(
      docs: DataFrame,
      reference: DataFrame,
      windowLen: Int = 8,
      maxDigFreq: Long = 256,
      referenceIndex: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val index = referenceIndex.getOrElse(substringIndex(reference, windowLen, maxDigFreq))
    val matches = rollingDigests(docs, windowLen)
      .join(index, Seq("dig"))
      .select(
        col("doc_id"), col("start"), col("ref_doc"),
        (col("start") - col("ref_start")).as("off"))
    val byAlignment = Window.partitionBy("doc_id", "ref_doc", "off").orderBy("start")
    val runs = matches
      .withColumn("grp", col("start") - row_number().over(byAlignment))
      .groupBy(col("doc_id"), col("ref_doc"), col("off"), col("grp"))
      .agg(min(col("start")).as("start"), count(lit(1)).as("run"))
      .withColumn("match_len", col("run") + lit(windowLen - 1L))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("match_len").desc, col("ref_doc"), col("start"), col("off"))
    val best = runs
      .withColumn("rn", row_number().over(byDoc)).filter(col("rn") === 1)
      .select(
        col("doc_id"), col("match_len"), col("ref_doc").as("best_ref_doc"),
        col("start").as("best_start"), (col("start") - col("off")).as("best_ref_start"))
    val coverage = matches.groupBy(col("doc_id"))
      .agg(countDistinct(col("start")).as("n_matched_windows"))
    TextAnalysis.spread(docs)
      .select(col("doc_id"), size(TextAnalysis.wordsCol).cast("long").as("n_tokens"))
      .join(best, Seq("doc_id"), "left")
      .join(coverage, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("match_len"), lit(0L)).as("max_match_len"),
        col("best_ref_doc"), col("best_start"), col("best_ref_start"),
        coalesce(col("n_matched_windows"), lit(0L)).as("n_matched_windows"),
        (coalesce(col("match_len"), lit(0L)) >= windowLen).as("contaminated"))
  }

  /** Strip boilerplate passages from `batch` using a GLOBAL digest
    * frequency state (which must already include the batch's own counts
    * — merge them in first). Same output shape as [[passageDedup]].
    */
  def passageDedupAgainst(
      batch: DataFrame,
      globalCounts: DataFrame,
      passageLen: Int = 8,
      maxDocFreq: Long = 1): DataFrame = {
    val boiler = globalCounts.filter(col("df") > maxDocFreq).select("dig")
    val drops = passageDigests(batch, passageLen).join(boiler, Seq("dig"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("chunk"))).as("drop_chunks"))
    batch
      .join(drops, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        TextAnalysis.wordsCol.as("words"),
        coalesce(col("drop_chunks"), array().cast("array<int>")).as("dc"))
      .select(
        col("doc_id"),
        floor((size(col("words")) + passageLen - 1) / passageLen).cast("long").as("n_passages"),
        size(col("dc")).cast("long").as("n_dropped"),
        array_join(
          filter(passagesOf(col("words"), passageLen), (_, i) => !array_contains(col("dc"), i)),
          " ").as("clean_text"))
  }

  /** LSH candidates verified by CHARACTER edit distance — the near-dup
    * check for OCR noise, typo farms, and template fills, where
    * shingle-set Jaccard under-scores small in-word edits (one character
    * flip kills k word-shingles but costs one edit). Verification runs on
    * a bounded prefix (`prefixLen` chars) so the quadratic Levenshtein DP
    * is capped at prefixLen² per candidate regardless of document size;
    * similarity is `1 − lev/max(len_a, len_b)` (two-empty-prefix pairs
    * are identical, sim 1). The division is one IEEE op on exact
    * integers; Spark and DuckDB both implement unit-cost character
    * Levenshtein, so the score is engine-identical.
    *
    * Scale: candidates come from [[lshCandidatePairs]] (bucket-confined,
    * never all-pairs); the verify join ships only the `prefixLen`-char
    * prefixes, not full documents, so per-pair network and CPU are both
    * constant-bounded.
    */
  def editVerifiedPairs(
      docs: DataFrame,
      k: Int = 3,
      numHashes: Int = 8,
      numBands: Int = 4,
      prefixLen: Int = 256,
      minSim: Double = 0.5): DataFrame = {
    val pre = TextAnalysis.spread(docs)
      .select(col("doc_id"), substring(col("text"), 1, prefixLen).as("pre"))
    lshCandidatePairs(docs, k, numHashes, numBands)
      .join(pre.select(col("doc_id").as("doc_a"), col("pre").as("pre_a")), Seq("doc_a"))
      .join(pre.select(col("doc_id").as("doc_b"), col("pre").as("pre_b")), Seq("doc_b"))
      .withColumn("lev", levenshtein(col("pre_a"), col("pre_b")).cast("long"))
      .withColumn(
        "max_len",
        greatest(length(col("pre_a")), length(col("pre_b"))).cast("long"))
      .withColumn(
        "sim",
        when(col("max_len") === 0L, lit(1.0))
          .otherwise(lit(1.0) - col("lev").cast("double") / col("max_len").cast("double")))
      .filter(col("sim") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("lev"), col("sim"))
  }

  /** Exact dedup after text canonicalization (lowercase, collapse every
    * non-alphanumeric run to one space, trim) — catches the
    * formatting-only duplicates exact hashing misses: case changes,
    * punctuation variants, whitespace reflow, markup residue. Per group
    * the output reports how many DISTINCT raw texts the canonical form
    * merged (`n_variants` > 1 ⟺ canonicalization found something
    * [[exactDuplicates]] could not). The canonicalization stays inside
    * the regex subset Java and RE2 interpret identically (one character
    * class, no backrefs), same discipline as [[TextAnalysis.redactPii]].
    *
    * Scale: identical shape to [[exactDuplicates]] — a narrow per-row
    * projection, then one digest-keyed shuffle of 16-byte hashes with
    * map-side combine; text never shuffles.
    */
  def canonicalDuplicates(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        md5(col("text")).as("raw_hash"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("canon"))
      .groupBy(md5(col("canon")).as("canon_hash"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_docs"),
        count_distinct(col("raw_hash")).as("n_variants"))

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): from each document's sequence
    * of `k`-gram digests, every window of `w` consecutive digests
    * contributes its RIGHTMOST MINIMUM, and the distinct selected
    * `(position, digest)` pairs are the document's fingerprints. The
    * published guarantee this buys over [[passageDedup]]'s aligned
    * chunks and [[rollingPassageDedup]]'s dense windows: any shared
    * run of `w + k − 1` tokens between two documents is CAUGHT by at
    * least one shared fingerprint, at an expected density of only
    * `2/(w+1)` of the gram stream — guaranteed-recall copy detection
    * at a fraction of the index size.
    *
    * Selection is computed relationally: per window start, the frame
    * minimum of `struct(digest, −position)` (rightmost among equal
    * minima — with 60-bit digests ties are negligible but the
    * tie-break keeps the engine bit-deterministic); window starts with
    * truncated frames (`start > n_grams − w`) select nothing, so a
    * document with fewer than `w` grams emits no fingerprints
    * (documented; whole-doc dedup covers the short cases).
    *
    * Output per document: gram/window/fingerprint counts, the selected
    * density in ppm of window starts, and the fingerprint set gated
    * exactly through order-free aggregates (XOR-fold plus min/max of
    * the 60-bit digests — XOR, unlike a sum, cannot overflow at any
    * fingerprint count).
    *
    * Scale: the digest stream is one fused codegen pass per document
    * (text never shuffles), the frame min is a per-doc window sharing
    * one doc-keyed exchange with the final aggregate, and fingerprints
    * are ~`2/(w+1)` of gram volume — the index a 100 TB corpus
    * actually stores.
    */
  def winnowingFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val sel = winnowingSelected(docs, k, w)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_fp"),
        expr("bit_xor(fh)").as("fp_xor"),
        min(col("fh")).as("fp_min"),
        max(col("fh")).as("fp_max"))
    rollingDigests(docs, k)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
      .filter(col("n_grams") >= w)
      .withColumn("n_windows", col("n_grams") - lit(w.toLong - 1L))
      .join(sel, Seq("doc_id"))
      .withColumn("density_ppm", expr("(1000000 * n_fp) div n_windows"))
      .select(
        col("doc_id"), col("n_grams"), col("n_windows"), col("n_fp"),
        col("density_ppm"), col("fp_xor"), col("fp_min"), col("fp_max"))
  }

  /** Cross-document fingerprint matches over [[winnowingFingerprints]]'
    * selection — the MOSS match step: document pairs sharing at least
    * `minShared` distinct selected digests, with the same
    * document-frequency cap as [[rareShingleEdges]] bounding the pair
    * expansion (a digest selected in m documents emits C(m, 2) pairs;
    * boilerplate digests above `maxDf` are excluded, which is also
    * MOSS's own "ignore ubiquitous fingerprints" rule). Output
    * `(src, dst, n_shared)` with `src < dst`.
    */
  def winnowingMatches(
      docs: DataFrame,
      k: Int = 3,
      w: Int = 4,
      maxDf: Long = 4L,
      minShared: Long = 2L): DataFrame = {
    val fps = winnowingSelected(docs, k, w)
      .select(col("doc_id"), col("fh")).distinct()
    val kept = fps.groupBy(col("fh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2L && col("df") <= maxDf)
      .select(col("fh"))
    val member = fps.join(kept, Seq("fh"))
    member.select(col("fh"), col("doc_id").as("src"))
      .join(member.select(col("fh"), col("doc_id").as("dst")), Seq("fh"))
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The distinct winnowing-selected `(doc_id, fpos, fh)` rows shared
    * by [[winnowingFingerprints]] and [[winnowingMatches]].
    */
  private def winnowingSelected(docs: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 2, s"k=$k, w=$w out of range (k >= 1, w >= 2)")
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val frame = wDoc.orderBy(col("start")).rowsBetween(0, w.toLong - 1L)
    rollingDigests(docs, k)
      .withColumn("n_grams", count(lit(1)).over(wDoc))
      .withColumn(
        "m",
        min(struct(col("dig").as("h"), (-col("start")).cast("long").as("np")))
          .over(frame))
      .filter(col("start") <= col("n_grams") - w.toLong)
      .select(col("doc_id"), (-col("m.np")).as("fpos"), col("m.h").as("fh"))
      .distinct()
  }

  /** All pairs within Hamming distance `maxDist` over a BIGINT
    * fingerprint column (`(doc_id, dhash)` rows — [[graft.operators
    * .Multimodal.pgmDHash]]'s output, a SimHash, any ≤63-bit signature):
    * the banded pigeonhole join. The `bits` fingerprint splits into
    * `maxDist + 1` equal-share bands (integer-div boundaries), so any
    * pair with ≤ maxDist differing bits agrees EXACTLY on at least one
    * band — candidates come from `maxDist + 1` hash-equi-joins, never
    * an all-pairs scan. Verification is one XOR + bit_count per
    * candidate; each surviving pair is emitted ONCE, by its LOWEST
    * agreeing band (every lower band must differ — a pure per-row
    * predicate, so no dedup shuffle; the q148 bucket-survival trick on
    * bit bands).
    *
    * The oracle is the brute-force all-pairs XOR-popcount join — the
    * hash match proves the banding lossless AND duplicate-free (the
    * q139 discipline).
    *
    * Scale: band values are near-uniform for fingerprint-grade hashes,
    * so each equi-join shuffles fingerprint rows `maxDist + 1` times
    * and meets ~n²/2^w candidates per band — pick `maxDist` ≪ bits so
    * band width `w` keeps that product small; text/pixels never move.
    */
  def hammingNearDupPairs(
      hashes: DataFrame,
      bits: Int = 32,
      maxDist: Int = 6): DataFrame = {
    require(bits >= 2 && bits <= 63, s"bits=$bits out of range [2, 63]")
    require(maxDist >= 0 && maxDist < bits, s"maxDist=$maxDist out of range [0, $bits)")
    val nb = maxDist + 1
    val bounds = (0 to nb).map(k => bits * k / nb)
    def bandVal(c: Column, k: Int): Column = {
      val lo = bounds(k)
      val w = bounds(k + 1) - lo
      shiftright(c, lo).bitwiseAND(lit((1L << w) - 1L))
    }
    val banded = hashes
      .select(col("doc_id"), col("dhash"))
      .select(
        col("doc_id"), col("dhash"),
        posexplode(array((0 until nb).map(k => bandVal(col("dhash"), k)): _*))
          .as(Seq("band", "bv")))
    val lowerBandsDiffer = (0 until nb).map { k =>
      val cond =
        if (k == 0) lit(true)
        else (0 until k)
          .map(j => bandVal(col("x"), j) =!= 0L)
          .reduce(_ && _)
      col("band") === k && cond
    }.reduce(_ || _)
    banded.select(col("doc_id").as("ida"), col("dhash").as("ha"), col("band"), col("bv"))
      .join(
        banded.select(col("doc_id").as("idb"), col("dhash").as("hb"), col("band"), col("bv")),
        Seq("band", "bv"))
      .filter(col("ida") < col("idb"))
      .withColumn("x", col("ha").bitwiseXOR(col("hb")))
      .withColumn("dist", expr("CAST(bit_count(x) AS BIGINT)"))
      .filter(col("dist") <= maxDist.toLong)
      .filter(lowerBandsDiffer)
      .select(col("ida"), col("idb"), col("dist"))
  }

  /** Deletion-neighborhood expression for [[editDistancePairs]]: the
    * distinct set of strings reachable from `colName` by deleting up to
    * `maxDist` characters (the string itself included). Pure per-row
    * array arithmetic — stays in whole-stage codegen.
    */
  private def deletionNeighborhood(colName: String, maxDist: Int): Column = {
    def del1(s: String): String =
      s"CASE WHEN length($s) = 0 THEN CAST(array() AS ARRAY<STRING>) " +
        s"ELSE transform(sequence(0, length($s) - 1), " +
        s"_i -> concat(substring($s, 1, _i), substring($s, _i + 2, length($s)))) END"
    maxDist match {
      case 1 =>
        expr(s"array_distinct(concat(array($colName), ${del1(colName)}))")
      case 2 =>
        expr(
          s"array_distinct(concat(array($colName), ${del1(colName)}, " +
            s"flatten(transform(${del1(colName)}, _x -> ${del1("_x")}))))")
    }
  }

  /** All pairs of vocabulary strings within Levenshtein distance
    * `maxDist` — the spelling-variant / fuzzy-key join — WITHOUT an
    * all-pairs scan: SymSpell-style deletion-neighborhood blocking. Any
    * edit script of length ≤ d can be replayed as ≤ d deletions on each
    * side landing on a common string (substitution → delete the edited
    * position from both; insert/delete → delete from the longer side),
    * so two strings within distance d ALWAYS share an element of their
    * ≤d-deletion neighborhoods — candidates come from one equi-join on
    * exploded neighborhood keys, verified with one `levenshtein` call
    * each. A pair sharing several keys is emitted ONCE, by its
    * lexicographically-least shared key — `array_min(array_intersect(
    * nbhd(wa), nbhd(wb)))`, a pure per-row predicate recomputable from
    * the two words alone, so no dedup shuffle (the q201 lowest-band
    * trick on delete keys).
    *
    * The oracle is the brute-force all-pairs levenshtein join — the
    * hash match proves the blocking lossless AND duplicate-free (the
    * q139/q201 discipline).
    *
    * Scale: input is a VOCABULARY (distinct words — vocab-bounded, not
    * corpus-bounded; build it with a map-side-combined distinct so raw
    * text never shuffles). Each word emits O(len^maxDist) keys; the key
    * space is near-uniform for natural vocabularies, so candidates per
    * key stay small. `maxDist` ∈ {1, 2} — the range where the
    * neighborhood stays polynomial and spelling variance lives.
    *
    * Input: one string column `w` (pre-distinct). Output: (wa, wb,
    * dist) with wa < wb, dist ≤ maxDist.
    */
  def editDistancePairs(vocab: DataFrame, maxDist: Int = 2): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist=$maxDist not in {1, 2}")
    val keyed = vocab
      .select(col("w"))
      .filter(length(col("w")) > 0)
      .select(col("w"), explode(deletionNeighborhood("w", maxDist)).as("k"))
    keyed.select(col("w").as("wa"), col("k"))
      .join(keyed.select(col("w").as("wb"), col("k")), Seq("k"))
      .filter(col("wa") < col("wb"))
      .withColumn("dist", levenshtein(col("wa"), col("wb")).cast("long"))
      .filter(col("dist") <= maxDist.toLong)
      .filter(col("k") === array_min(array_intersect(
        deletionNeighborhood("wa", maxDist), deletionNeighborhood("wb", maxDist))))
      .select(col("wa"), col("wb"), col("dist"))
  }

  /** Content-defined chunking at token granularity — the storage-dedup
    * idea (Rabin/FastCDC boundaries) relationalized: a chunk boundary
    * falls after every word whose 60-bit digest ≡ 0 (mod `modulus`), so
    * boundaries are a pure function of LOCAL content and survive
    * insertions/deletions anywhere else in the document — unlike
    * [[passageDedup]]'s fixed windows (which shift) and like
    * [[rollingPassageDedup]] but with VARIABLE-length chunks whose
    * expected length is `modulus` words. Shared boilerplate then lands
    * in identical chunks regardless of its offset in each document.
    *
    * Entirely per-document array computation — boundary positions by a
    * higher-order `filter` over word positions, chunk spans by
    * `zip_with(starts, ends)`, one `md5` per chunk — so the document
    * text NEVER shuffles; the only exchange is the digest-level
    * aggregate a caller puts on top. The final (no-op) boundary after
    * the last word is dropped so chunks are always nonempty; an empty
    * document is one chunk of the empty token.
    *
    * Output: `(doc_id, chunk_idx, start_pos, n_words, dig)` — 1-based
    * `start_pos`, 0-based `chunk_idx`, `dig` = 60-bit md5 slice of the
    * space-joined chunk text.
    */
  def contentDefinedChunks(docs: DataFrame, modulus: Int = 8): DataFrame = {
    require(modulus >= 2, s"modulus=$modulus must be >= 2")
    // One fused codegen pass per document ([[graft.expressions.CdcChunks]]
    // — boundary md5s and chunk digests together); digest-identical to the
    // earlier filter/zip_with/slice HigherOrderFunction chain the DuckDB
    // oracles replay, but never interpreted and never re-evaluated per
    // consumer (the per-word md5 lambda was duplicated by CollapseProject:
    // ~3.9 s → sub-second for the 5,000-doc scan).
    val bridge = org.apache.spark.sql.graft.bridge
    TextAnalysis.spread(docs)
      .select(
        col("doc_id"),
        posexplode(bridge.column(graft.expressions.CdcChunks(
          bridge.expression(TextAnalysis.wordsCol), modulus))).as(Seq("chunk_idx", "c")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.start_pos").as("start_pos"),
        col("c.n_words").as("n_words"),
        col("c.dig").as("dig"))
  }

  /** Cross-document duplicate-chunk summary over
    * [[contentDefinedChunks]]: every chunk digest occurring more than
    * once, with how many documents and occurrences share it — the
    * offset-robust boilerplate inventory. One digest-keyed aggregate
    * (counter state per distinct digest); text never shuffles.
    */
  def chunkDuplicates(docs: DataFrame, modulus: Int = 8): DataFrame =
    contentDefinedChunks(docs, modulus)
      .groupBy(col("dig"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("n_words")).as("n_words"))
      .filter(col("n_occ") > 1L)

  /** Chunk-digest document frequencies — the CDC family's incremental
    * state, shaped exactly like [[passageDigestCounts]] (`dig, df`) so
    * [[mergePassageCounts]] and the per-epoch streaming machinery apply
    * unchanged to variable content-defined chunks.
    */
  def chunkDigestCounts(docs: DataFrame, modulus: Int = 8): DataFrame =
    contentDefinedChunks(docs, modulus)
      .groupBy(col("dig"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** Chunk-level cross-document boilerplate removal against a global
    * chunk-frequency table — [[passageDedupAgainst]]'s content-defined
    * sibling: the grid is CDC boundaries instead of a fixed stride, so
    * shared spans are caught at ANY byte offset (the q210 property)
    * while each document sheds whole chunks, never mid-chunk slivers
    * like the dense-window pass. Output `(doc_id, n_chunks, n_dropped,
    * clean_text)` — the passage family's exact surface.
    *
    * Scale: the batch re-derives its chunk spans per document (narrow
    * array lambdas); only digests and chunk INDEXES shuffle — the
    * boiler join and the per-doc drop set are digest/index-sized, and
    * the text rebuild is a per-row lambda over the original words.
    */
  def cdcDedupAgainst(
      batch: DataFrame,
      globalCounts: DataFrame,
      modulus: Int = 8,
      maxDocFreq: Long = 1): DataFrame = {
    val bridge = org.apache.spark.sql.graft.bridge
    val boiler = globalCounts.filter(col("df") > maxDocFreq).select("dig")
    val drops = contentDefinedChunks(batch, modulus).join(boiler, Seq("dig"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("chunk_idx"))).as("drop_chunks"))
    batch
      .join(drops, Seq("doc_id"), "left")
      .select(
        col("doc_id"), TextAnalysis.wordsCol.as("ws"),
        coalesce(col("drop_chunks"), array().cast("array<long>")).as("dc"))
      .withColumn(
        "spans",
        bridge.column(graft.expressions.CdcChunks(
          bridge.expression(col("ws")), modulus)))
      .select(
        col("doc_id"),
        size(col("spans")).cast("long").as("n_chunks"),
        size(col("dc")).cast("long").as("n_dropped"),
        array_join(
          transform(
            filter(col("spans"), (_, i) => !array_contains(col("dc"), i.cast("long"))),
            sp => array_join(
              slice(col("ws"), sp.getField("start_pos").cast("int"),
                sp.getField("n_words").cast("int")), " ")),
          " ").as("clean_text"))
  }

  /** One-shot chunk-level dedup of a whole corpus ([[passageDedup]]'s
    * content-defined sibling).
    */
  def cdcDedup(docs: DataFrame, modulus: Int = 8, maxDocFreq: Long = 1): DataFrame =
    cdcDedupAgainst(docs, chunkDigestCounts(docs, modulus), modulus, maxDocFreq)
}
