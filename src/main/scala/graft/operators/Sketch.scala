package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumnShim
import org.apache.spark.sql.types.BinaryType

import graft.sources.Tables

/** Sketch-accelerated operators: the two mergeable-summary patterns a
  * 100 TB pipeline leans on when exact answers are either unnecessary
  * (distinct counts for sizing decisions) or necessary-but-expensive to
  * co-locate (join pruning before a shuffle).
  *
  * Both sketches here are ASSOCIATIVE AND COMMUTATIVE summaries: each
  * executor builds a partial over its partition, partials merge on the
  * driver (bloom) or in a partial-aggregate tree (HLL) — no raw rows cross
  * the wire for the summary itself. That mergeability is the entire scale
  * story; the reference engine has no sketch tier (its only aggregate
  * shapes are exact per-key folds, `src/mrapps/wc.go:40-44`), so this file
  * is part of the brief-mandated extension surface, not parity.
  */
object Sketch {

  /** bloom_prune — Bloom-filter join pruning: revenue by order priority for
    * one customer segment, with the fact-side scan pre-filtered by a
    * broadcast Bloom filter built over the qualifying dim keys.
    *
    * Why this exists at 100 TB: a fact⋈dim join where the dim predicate
    * keeps ~20% of customers still shuffles (or at best scans) EVERY fact
    * row before the join discards 80% of them. Shipping a Bloom filter of
    * the qualifying keys to the fact scan drops non-joining rows at the
    * scan, so the join (and any shuffle above it) sees only
    * `selectivity + fpp` of the fact table. This is exactly Spark's own
    * row-level runtime filter (`spark.sql.optimizer.runtime.bloomFilter.*`,
    * auto-injected only between shuffle stages of one query); the operator
    * form matters when the build side is computed in a SEPARATE job — a
    * curated denylist, yesterday's dim snapshot — where the optimizer can't
    * see it.
    *
    * Correctness contract: a Bloom filter has no false NEGATIVES, so
    * pruning never drops a joining row; false POSITIVES (1% here) pass
    * extra rows that the exact join below removes. The result is therefore
    * bit-identical to the unpruned join — the DuckDB oracle replays the
    * plain join, which is the point: the sketch buys shuffle volume, never
    * answer quality.
    *
    * Plan shape: one tiny dim aggregation builds the filter driver-side
    * (`stat.bloomFilter` merges per-partition partials; ~1.2 MB for 1 M
    * keys at 1% fpp — compare broadcasting the key SET: 8 MB+ and a hash
    * probe that misses cache). The probe is Spark's own codegen'd
    * [[BloomFilterMightContain]] carried as a binary literal (the same
    * wire form the injected runtime filter uses), NOT a Scala UDF — it
    * stays inside the fact scan's WholeStageCodegen span. The exact join
    * then broadcasts the dim (it is small post-filter); the aggregate is
    * exact-cents integral so the oracle compare is bitwise.
    */
  def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // Size the filter from the actual build cardinality (one tiny job on
    // the already-filtered dim): 1% fpp at n keys. A fixed guess risks
    // either fpp blow-up (undersized) or wasted broadcast bytes.
    val nKeys = math.max(dim.count(), 1L)
    val bloom = dim.stat.bloomFilter("c_custkey", nKeys, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = GraftColumnShim.column(
      BloomFilterMightContain(
        Literal(bytes, BinaryType),
        GraftColumnShim.expression(col("o_custkey"))))
    val prunedOrders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_cents"))
      .filter(mightContain)
    prunedOrders
      .join(broadcast(Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("total_cents")).as("sum_cents"))
  }

  /** hll_counts — mergeable distinct-user counts: per-event-type HLL
    * sketches of `user_id`, unioned into an ALL rollup row WITHOUT
    * re-touching the raw events.
    *
    * The 100 TB problem this solves: "distinct users per type AND overall"
    * computed exactly needs either two scans or an Expand (rows ×2) feeding
    * two exact distinct aggregations whose exchanges carry full key
    * cardinality. HLL sketches are unionable, so the per-type aggregation
    * is computed once (partial sketches merge map-side; the exchange
    * carries K sketches of ≤ 2^lgK bytes, not keys) and every coarser
    * grain — here the grand total, in production a cube of them — is a
    * sketch union over the FINISHED per-type rows. Precompute per-partition
    * sketches daily, answer any rollup later without rescanning: the
    * pattern exact distinct counts structurally cannot do.
    *
    * Why this is oracle-able despite being a sketch: the Datasketches HLL
    * sketch is EXACT below its promotion threshold — it buffers raw coupons
    * (LIST then SET mode) and only switches to the lossy HLL array once
    * coupons exceed 3/4 · 2^lgK (= 3072 at the lgK=12 used here). The
    * fixture's distinct-user cardinalities (150 per type and overall at the
    * sf0.01 gate) sit far below that, so `hll_sketch_estimate` returns the
    * exact integer count and the DuckDB `count(DISTINCT ...)` replay
    * hash-matches. SketchSpec additionally pins estimate == exact on a
    * planted corpus; at true scale the estimate degrades gracefully to
    * ±1.6% RSE (lgK=12) — the documented trade, with lgK the dial.
    */
  def hllCounts(s: SparkSession, dir: String): DataFrame = {
    val lgK = 12
    val perType = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        hll_sketch_agg(col("user_id"), lgK).as("sk"))
    val total = perType
      .agg(sum(col("n_events")).as("n_events"), hll_union_agg(col("sk")).as("sk"))
      .select(lit("ALL").as("event_type"), col("n_events"), col("sk"))
    perType.unionByName(total)
      .select(col("event_type"), col("n_events"),
        hll_sketch_estimate(col("sk")).as("nd_users"))
  }
}
