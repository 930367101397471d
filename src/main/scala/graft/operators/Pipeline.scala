package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs, as one declarative plan: a document is KEPT iff it passes
  * the [[TextOps.textQuality]] gate AND it is the surviving representative
  * (cluster minimum) of its [[Dedup.clusters]] near-duplicate component.
  *
  * Everything upstream is the already-verified operators; this layer is pure
  * composition (filter + equi-join on doc_id), so at 100 TB it adds one
  * broadcast/shuffle join to the dedup cost and nothing else.
  */
object Pipeline {

  /** Per-language keep thresholds for [[mix]]: a doc survives iff the first
    * 8 hex chars of md5(doc_id) are lexicographically below its language's
    * threshold — "ffffffff" ≈ keep all, "80000000" ≈ 50%, "1a000000" ≈ 10%.
    */
  val MixRates: Map[String, String] = Map(
    "en" -> "ffffffff",
    "de" -> "80000000",
    "fr" -> "80000000",
    "es" -> "80000000",
    "zh" -> "40000000")

  /** pipeline_mix — reproducible data mixing: down-sample per language with
    * a DETERMINISTIC content-free coin (md5 of the doc id vs a hex
    * threshold). No RNG state, no seed plumbing: any engine, any rerun, any
    * partitioning selects the identical subset — which is what makes a
    * 100 TB training mix auditable and resumable. Unlisted languages drop.
    */
  def mix(s: SparkSession, dir: String,
      rates: Map[String, String] = MixRates): DataFrame = {
    val threshold = rates.foldLeft(lit("00000000")) { case (acc, (lang, t)) =>
      when(col("lang") === lang, lit(t)).otherwise(acc)
    }
    graft.sources.Tables.documents(s, dir)
      .withColumn("coin", substring(md5(col("doc_id").cast("string")), 1, 8))
      .filter(col("coin") < threshold)
      .select(col("doc_id"), col("lang"), col("coin"))
  }

  /** mix_temperature — temperature-flattened language mixing, the
    * DATA-DERIVED sibling of [[mix]]'s static rate table: per-language
    * keep-rate √(n_min / n_lang) (α = 0.5 temperature sampling anchored at
    * the smallest language, which survives whole), so expected kept volume
    * per language is √(n_min · n_lang) — the geometric-mean flattening that
    * up-weights low-resource languages in a multilingual training mix
    * without a hand-maintained table.
    *
    * Exactness contract: n_min/n_lang divides two exact integers in one
    * IEEE double op, √ is correctly rounded by IEEE-754, and the coin
    * fraction is an integer < 2³² divided by 2³² (exact) — every double is
    * the same bits on any engine, so the keep decision (and the emitted
    * rate) replays bit-for-bit in the oracle. The coin is salted
    * ("mix_t:") for independence from [[mix]]'s bare-id coin and
    * split_assign's "split:" coin.
    *
    * 100 TB plan: one map-side-combined count per language (broadcast
    * back — languages are few), then a stateless filter scan. No window,
    * no per-doc shuffle.
    */
  def mixTemperature(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(s, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val nMin = counts.agg(min(col("n_lang")).as("n_min"))
    docs.select(col("doc_id"), col("lang"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(nMin))
      .withColumn("rate",
        sqrt(col("n_min").cast("double") / col("n_lang").cast("double")))
      .withColumn("coin_frac",
        conv(substring(md5(concat(lit("mix_t:"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long").cast("double") / lit(4294967296.0))
      .filter(col("coin_frac") < col("rate"))
      .select(col("doc_id"), col("lang"), col("n_lang"), col("rate"))
  }

  /** pipeline_curate — the WHOLE curation pipeline as one declarative
    * plan: a document survives iff it (a) passes the quality gate,
    * (b) is its near-dup cluster's elected survivor, (c) is not
    * benchmark-contaminated, and (d) wins the temperature-mix coin.
    * Benchmark stand-in docs (`doc_id % BenchmarkMod = 0`) never reach the
    * training set at all. Every per-dimension audit flag is emitted, so a
    * data card can report WHY each document dropped, not just that it did.
    *
    * Pure composition over the four already-verified operators (equi-joins
    * on doc_id) — the mix decision deliberately reuses [[mixTemperature]]'s
    * standalone coin (a deterministic pure function of the full corpus), so
    * the same document keeps the same fate whether the steps run fused or
    * as separate jobs with materialized intermediates. At 100 TB this plan
    * is the dedup cost plus three broadcast/shuffle joins; Catalyst fuses
    * the scans each flag shares.
    */
  def curate(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, Dedup}
    val base = graft.sources.Tables.documents(s, dir)
      .filter(col("doc_id") % Curation.BenchmarkMod =!= 0)
      .select(col("doc_id"), col("lang"))
    val quality = TextOps.textQuality(s, dir)
      .select(col("doc_id"), col("keep").as("quality_ok"))
    val survivors = Dedup.clusters(s, dir)
      .select(col("doc_id"), (col("doc_id") === col("cluster_id")).as("is_survivor"))
    val decon = Curation.decontam(s, dir).select(col("doc_id"), col("contaminated"))
    val mixKept = mixTemperature(s, dir).select(col("doc_id"), lit(true).as("mix_keep"))
    base.join(quality, "doc_id").join(survivors, "doc_id").join(decon, "doc_id")
      .join(mixKept, Seq("doc_id"), "left")
      .withColumn("mix_keep", coalesce(col("mix_keep"), lit(false)))
      .withColumn("keep",
        col("quality_ok") && col("is_survivor") && !col("contaminated") && col("mix_keep"))
      .select("doc_id", "lang", "quality_ok", "is_survivor", "contaminated",
        "mix_keep", "keep")
  }

  /** pipeline_keep — the curated keep-set with its audit columns. */
  def keep(s: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.textQuality(s, dir)
      .select(col("doc_id"), col("keep").as("quality_ok"))
    val survivors = Dedup.clusters(s, dir)
      .withColumn("is_survivor", col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("is_survivor"))
    quality.join(survivors, "doc_id")
      .withColumn("keep", col("quality_ok") && col("is_survivor"))
      .select("doc_id", "cluster_id", "quality_ok", "is_survivor", "keep")
  }
}
