package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact (content-hash group-by), MinHash+LSH near-dup, SimHash near-dup.
  *
  * Scale design (the non-negotiables at 100 TB):
  *   - candidate generation is ALWAYS a hash-bucket equi-join (LSH bands /
  *     SimHash chunks) — never an all-pairs crossJoin;
  *   - signatures are computed in one scan with codegen'd array functions,
  *     shuffled once on the band key;
  *   - pathological buckets (boilerplate/empty docs collapsing into one key)
  *     are capped so a single hot key cannot go quadratic.
  */
object Dedup {

  /** dedup_exact — exact duplicate groups by content hash. At 100 TB this is
    * the canonical first pass: one shuffle keyed on a 128-bit digest, never
    * on the raw text (bytes stay columnar at the scan).
    */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(
        min("doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** dedup_exact_dups — just the duplicate clusters (n_copies > 1) with the
    * surviving id; what a pipeline actually acts on.
    */
  def exactDups(s: SparkSession, dir: String): DataFrame =
    exact(s, dir).filter(col("n_copies") > 1)

  // ---------------------------------------------------------------- MinHash

  /** Number of hash functions in the MinHash signature. */
  val NumHashes = 64
  /** LSH banding: Bands × RowsPerBand == NumHashes. b=16, r=4 puts the S-curve
    * threshold near j ≈ (1/16)^(1/4) ≈ 0.50.
    */
  val Bands = 16
  val RowsPerBand = 4
  /** Hot-bucket cap: a band bucket larger than this is dropped from pairing
    * (boilerplate black hole; at web scale one such key would emit O(n²)
    * pairs). Docs this common are handled by the exact pass anyway.
    */
  val MaxBucket = 1000

  /** Distinct word-3-gram shingles as an array column — all codegen'd array
    * functions, no UDF (shingling at the scan, one pass).
    */
  def shingles(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val grams = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array(concat_ws(" ", toks)))
    array_distinct(grams)
  }

  /** MinHash signature: shingles are hashed once (xxhash64), then each of the
    * k signature slots takes the min of a per-slot re-mix. k passes over an
    * in-memory long array per row — no shuffle, no UDF.
    */
  private def signature(shingleCol: Column): Column = {
    val hashes = transform(shingleCol, sh => xxhash64(sh))
    array((0 until NumHashes).map { k =>
      array_min(transform(hashes, h => xxhash64(h, lit(k))))
    }: _*)
  }

  /** docs with (doc_id, shingles, sig) — shared prep for the LSH stages. */
  private def signed(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", signature(col("sh")))

  /** Candidate pairs via LSH banding: explode 16 band keys per doc, shuffle
    * once on (band, key), pair within buckets (skew-capped), dedup pairs.
    */
  private def candidatePairs(docs: DataFrame): DataFrame = {
    val banded = docs.select(
      col("doc_id"),
      posexplode(array((0 until Bands).map { b =>
        xxhash64((0 until RowsPerBand).map(r => element_at(col("sig"), b * RowsPerBand + r + 1)) :+ lit(b): _*)
      }: _*)).as(Seq("band", "bkey")))
    val capped = banded
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .filter(col("bucket_n") <= MaxBucket)
    val l = capped.select(col("band"), col("bkey"), col("doc_id").as("doc1"))
    val r = capped.select(col("band"), col("bkey"), col("doc_id").as("doc2"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("doc1") < col("doc2"))
      .select("doc1", "doc2")
      .distinct()
  }

  /** dedup_minhash — near-duplicate pairs: LSH candidates verified with the
    * EXACT shingle-set Jaccard (so output is deterministic given recall ≈ 1
    * at j ≥ threshold), filtered at `threshold`.
    */
  def minhash(s: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = signed(s, dir).cache()
    val pairs = candidatePairs(docs)
    val withSets = pairs
      .join(docs.select(col("doc_id").as("doc1"), col("sh").as("sh1")), "doc1")
      .join(docs.select(col("doc_id").as("doc2"), col("sh").as("sh2")), "doc2")
    withSets
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** dedup_ngram — EXACT token-set (1-gram) Jaccard similarity join at
    * `threshold`, via prefix filtering (the PPJoin principle): order each
    * doc's tokens by ascending global document frequency, keep only the
    * first `n - ceil(t*n) + 1` (the "prefix"); two sets with J >= t MUST
    * share a prefix token, so the inverted-index equi-join over prefix
    * tokens is a complete candidate generator — recall is exactly 1, unlike
    * MinHash LSH, while still never going all-pairs. Candidates are then
    * verified with the exact Jaccard.
    *
    * 100 TB: the df table is tiny relative to the corpus (vocabulary-sized)
    * and broadcast; the prefix join shuffles on the rarest tokens only, so
    * bucket sizes stay bounded by df of rare tokens rather than corpus size.
    */
  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(split(trim(col("text")), "\\s+")).as("toks"))
    val df = docs.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val exploded = docs
      .select(col("doc_id"), size(col("toks")).as("n"), explode(col("toks")).as("tok"))
      .join(broadcast(df), "tok")
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("tok").asc)
    val prefix = exploded.withColumn("r", row_number().over(w))
      .filter(col("r") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("tok", "doc_id")
    val cand = prefix.select(col("tok"), col("doc_id").as("doc1"))
      .join(prefix.select(col("tok"), col("doc_id").as("doc2")), "tok")
      .filter(col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
    val sets = docs
    cand
      .join(sets.select(col("doc_id").as("doc1"), col("toks").as("t1")), "doc1")
      .join(sets.select(col("doc_id").as("doc2"), col("toks").as("t2")), "doc2")
      .withColumn("jaccard",
        size(array_intersect(col("t1"), col("t2"))).cast("double") /
          size(array_union(col("t1"), col("t2"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document from token hashes: per bit, sum ±1 over
    * tokens, sign → bit. Expressed as 64 aggregate() folds over the token-hash
    * array (one scan, no shuffle).
    */
  def simhashCol(text: Column): Column = {
    val hashes = transform(split(trim(text), "\\s+"), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** dedup_simhash — per-doc 64-bit SimHash plus near-dup pairs at Hamming
    * distance ≤ `maxHamming`, blocked on 4×16-bit chunks (a pair within
    * Hamming 3 of 64 bits must agree exactly on ≥1 of 4 chunks — pigeonhole),
    * so candidate generation is again an equi-join, not all-pairs.
    */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), simhashCol(col("text")).as("simhash"))
    val chunked = docs.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ckey")))
    val l = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("doc1"), col("simhash").as("h1"))
    val r = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("doc2"), col("simhash").as("h2"))
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** dedup_simhash_sigs — the per-document signatures themselves (the
    * artifact a pipeline persists for incremental dedup).
    */
  def simhashSigs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), simhashCol(col("text")).as("simhash"))
}
