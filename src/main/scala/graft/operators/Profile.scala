package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dataset profiling — the "what is actually in this table" pass every
  * ingest pipeline runs before trusting a new drop: per column, row count,
  * null count, EXACT distinct cardinality, and min/max. Profiles are how
  * partition strategies get chosen (distinct counts size shuffles, min/max
  * bound range partitions), so the numbers must be exact, not sketched —
  * the approx sibling for quick looks is q19_approx.
  *
  * Plan shape: ONE scan of the three profiled columns feeds a single
  * aggregate computing every metric; the multi-`count(distinct)` expands
  * the aggregate buffer per distinct column (Spark's Expand — rows ×3) but
  * each distinct is still partially aggregated map-side, so the exchange
  * carries near-distinct cardinality, not raw rows. The per-column layout
  * is then a 3-row `stack` of the one-row aggregate — no second pass.
  */
object Profile {

  /** profile_events — profile of the events table's integral columns
    * (event_id, user_id, and the JSON-extracted props.k).
    */
  def profileEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k").as("k"))
    val cols = Seq("event_id", "user_id", "k")
    val metrics = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).as(s"mn_$c"),
      max(col(c)).as(s"mx_$c")))
    val stackArgs = cols
      .map(c => s"'$c', n_rows, n_rows - nn_$c, nd_$c, mn_$c, mx_$c")
      .mkString(", ")
    ev.agg(metrics.head, metrics.tail: _*)
      .select(expr(s"stack(${cols.length}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_v, max_v)"))
  }

  /** value_histogram — fixed-width ($5) histogram of the events `value`
    * column, computed in EXACT integer cents: the doubles carry two
    * decimals, so `round(value·100)` recovers the integral cents (the
    * stored double sits within ε of it, far from any .5 boundary — both
    * engines round to the same integer), and from there bucketing and the
    * per-bucket sum are pure BIGINT arithmetic, order-free and exact.
    * One map-side-combined shuffle on the bucket id; bucket count is
    * value-range/width regardless of row count.
    */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(expr("cents DIV 500").as("bucket"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .withColumn("lo_cents", col("bucket") * 500)
      .select("bucket", "lo_cents", "n", "sum_cents")

  /** Winsorization quantile numerator/denominator: clip at the nearest-rank
    * p99 (rank = ⌈0.99·n⌉, the same discrete-order-statistic convention as
    * source_quantiles — the quantile is a VALUE FROM THE DATA, never an
    * interpolation, so the compare stays exact).
    */
  val WinsorNum = 99L
  val WinsorDen = 100L

  /** winsorize — per-event-type p99 clipping of the `value` column (the
    * robust-statistics tail tamer run before any mean-based feature): each
    * event row is re-emitted with `clipped` = min(value, that type's p99).
    *
    * Execution shape: the naive plan — a rank window partitioned by
    * event_type — serializes each type's FULL row set through one
    * partition's sort (event_type has ~5 values; at 100 TB that is 20 TB
    * per window partition — the skew non-starter). Instead the quantile is
    * computed on the (type, cents) HISTOGRAM: exact integer cents (the
    * value_histogram trick) make (type, cents) a bounded-cardinality key —
    * value-range × types, independent of row count — so the count
    * aggregation is map-side combined, the cumulative rank walks only the
    * tiny histogram (a window over thousands of rows, not billions), and
    * the per-type thresholds broadcast back onto the scan. Two scans of
    * `value`, zero large sorts, no skewed exchange.
    */
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val hist = ev.groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
    val cum = hist.select(col("event_type"), col("cents"), col("c"),
      sum(col("c")).over(Window.partitionBy("event_type").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
      sum(col("c")).over(Window.partitionBy("event_type")).as("n"))
    // nearest-rank p99: the smallest cents whose cumulative count reaches
    // ⌈0.99·n⌉ = (99·n + 99) DIV 100 in integer arithmetic
    val thresh = cum
      .filter(col("cum") >= expr(s"($WinsorNum * n + $WinsorDen - 1) DIV $WinsorDen"))
      .groupBy("event_type").agg(min(col("cents")).as("p99_cents"))
    ev.join(broadcast(thresh), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        (col("p99_cents").cast("double") / lit(100.0)).as("p99"),
        when(col("cents") > col("p99_cents"),
          col("p99_cents").cast("double") / lit(100.0))
          .otherwise(col("value")).as("clipped"))
  }

  /** rank_normalize — per-event-type percentile-rank transform of `value`
    * (the rank-based feature normalization that is immune to outliers,
    * sibling of [[winsorize]]'s clipping): each event is re-emitted with
    * its value's min-rank and `pct = (rank − 1) / (n − 1)` in [0, 1]
    * (single-row groups pin pct to 0 — n = 1 has no spread). Ties share
    * the min-rank, so the transform is a pure function of the value, not
    * of row order.
    *
    * Execution shape: same skew-proof kernel as [[winsorize]] — ranks are
    * computed once per DISTINCT (type, cents) on the exact-cents histogram
    * (min-rank of a value = 1 + count of smaller values = the cumulative
    * count up to the PREVIOUS bucket, a lag-free subtraction off the same
    * cumulative window), then broadcast back onto the scan. The raw stream
    * is never sorted or windowed; the one float op, (rank−1)/(n−1), is
    * the identical IEEE division on both engines.
    */
  def rankNormalize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val hist = ev.groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
    val ranked = hist.select(col("event_type"), col("cents"),
      (sum(col("c")).over(Window.partitionBy("event_type").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("c") + lit(1L))
        .as("rnk"),
      sum(col("c")).over(Window.partitionBy("event_type")).as("n"))
    ev.join(broadcast(ranked), Seq("event_type", "cents"))
      .select(col("event_id"), col("event_type"), col("value"), col("rnk"),
        when(col("n") === 1L, lit(0.0))
          .otherwise((col("rnk") - lit(1L)).cast("double") /
            (col("n") - lit(1L)).cast("double")).as("pct"))
  }
}
