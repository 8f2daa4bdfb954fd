package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Exact dedup: group by content digest, keep the smallest doc_id as
    * canonical. The shuffle key is the md5 digest, not the document text.
    */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** MinHash signatures: for each of `numHashes` hash functions j, the
    * signature is the lexicographic min over the document's k-shingles of
    * md5(j ++ ":" ++ shingle) — a seeded-permutation MinHash family built
    * entirely from codegen'd built-ins.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 3, numHashes: Int = 8): DataFrame =
    TextAnalysis.shingles(docs, k)
      .select(
        col("doc_id"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("j"),
        col("sh"))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(md5(concat(col("j").cast("string"), lit(":"), col("sh")))).as("sig"))

  /** LSH banding: concatenate the signatures of each band of
    * `numHashes / numBands` consecutive hash functions and digest them into
    * one 32-byte band key. Documents sharing any (band, band_sig) are
    * near-duplicate candidates.
    */
  def minhashBands(docs: DataFrame, k: Int = 3, numHashes: Int = 8, numBands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / numBands
    minhashSignatures(docs, k, numHashes)
      .withColumn("band", expr(s"CAST(j DIV $rowsPerBand AS INT)"))
      .groupBy(col("doc_id"), col("band"))
      .agg(
        md5(array_join(
          transform(
            sort_array(collect_list(struct(col("j"), col("sig")))),
            x => x.getField("sig")),
          "")).as("band_sig"))
  }

  /** Candidate near-duplicate pairs: bucket-join on (band, band_sig).
    * Output is distinct (doc_a < doc_b) pairs. At scale this is a
    * self-equi-join on a 36-byte key — no cross product anywhere.
    */
  def lshCandidatePairs(docs: DataFrame, k: Int = 3, numHashes: Int = 8, numBands: Int = 4): DataFrame = {
    val bands = minhashBands(docs, k, numHashes, numBands)
    bands.alias("a")
      .join(
        bands.alias("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact k-shingle Jaccard similarity for every pair of documents sharing
    * at least one shingle, thresholded. The join is on the shingle string,
    * so only co-shingled pairs are ever materialized; `jaccard` is a single
    * IEEE division of exact integers (deterministic across engines).
    */
  def jaccardPairs(docs: DataFrame, k: Int = 3, minJaccard: Double = 0.2): DataFrame = {
    val sh = TextAnalysis.shingles(docs, k)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.alias("a")
      .join(sh.alias("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
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
}
