package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-series regularization over the events table: the gap-fill +
  * forward-fill resample every metrics warehouse runs before charting or
  * feature-engineering an irregular event stream onto a fixed grid.
  *
  * The reference's engine has no time axis at all (its one dataflow is
  * tokenize→shuffle→count, `src/mr/worker.go:83-90,200-223`); this extends
  * the event-time family (q15 windows, q16 sessions, funnel/cohort) with
  * the remaining standard member: a per-key DENSE calendar, including the
  * days on which nothing happened — the rows an aggregation can never
  * produce because there is no input row to aggregate.
  */
object TimeSeries {

  /** ts_resample — per-user daily resample of the event stream with
    * forward fill. For every user and every calendar day in the user's
    * [first event, last event] span (inclusive, UTC):
    *
    *   - `n_events`  — events that day (0 on gap days),
    *   - `day_value` — the `value` of the day's LAST event by
    *     (ts, event_id) order, null on gap days,
    *   - `filled_value` — `day_value` forward-filled from the most recent
    *     non-gap day: the "last observation carried forward" series.
    *
    * Execution shape: one shuffle on `user_id` builds the per-(user, day)
    * aggregate AND the per-user span (the day aggregate re-groups to
    * user without leaving the exchange's partitioning); `sequence()`
    * explodes the span into the grid — generation, not a join against a
    * calendar table — and the grid left-joins the day rows back on the
    * SAME (user-partitioned) layout before one linear window pass does the
    * forward fill. At 100 TB the grid is bounded by users × span-days (a
    * few-thousand-row fan-out per user even for decade-long histories,
    * independent of the user's EVENT count — a power user's 10⁸ events
    * collapse to their day aggregate before any fan-out), and the window
    * never sorts more than one user's days.
    *
    * Determinism: the day's last event is the max of (ts, event_id) — the
    * same total order every fold in this repo uses — so `day_value` is a
    * pure function of the data; `value` doubles are carried, never
    * combined, so the gate compare is exact.
    */
  def tsResample(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
    // per-(user, day): count + last value by (ts, event_id); max over a
    // struct keeps the reduction a map-side-combinable agg, not a window
    val daily = ev.groupBy("user_id", "day").agg(
      count(lit(1)).as("n_events"),
      max(struct(col("ts_us"), col("event_id"), col("value")))
        .getField("value").as("day_value"))
    val span = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
  }

  /** Trailing window width for [[rollingActive]], in days (the WAU
    * convention).
    */
  val RollingDays = 7

  /** rolling_active — trailing-7-day distinct active users per day (the
    * DAU/WAU family): for every day d, the number of distinct users with at
    * least one event in [d−6, d]. Days up to 6 past the last event are
    * included (the trailing window is still defined there) — the consumer
    * truncates to its reporting range.
    *
    * Execution shape: rolling COUNT DISTINCT is the classic window
    * non-starter — distinct doesn't decompose over sliding frames, and a
    * global day-ordered window would serialize on one partition. Instead
    * the kernel inverts the window: dedup to (user, active-day) — a
    * map-side-combinable distinct that collapses a power user's 10⁸ events
    * to their ≤365 active days — then fan each active day out to the ≤7
    * days it covers (a bounded ×7 generate, NOT a range join), dedup
    * (user, covered-day), and count. Every step is a hash aggregate on a
    * bounded-growth key set; nothing global, nothing sorted, no per-day
    * scan of a 7-day range at 100 TB.
    */
  /** latency_quantiles — per-event-type nearest-rank p50/p90/p99 of the
    * INTER-EVENT gap (seconds between a user's consecutive events, keyed by
    * the later event's type): the "time since last activity" SLO readout.
    * Gaps are bucketed to integral seconds, which is what makes the
    * quantile computable on a BOUNDED histogram — distinct gap-seconds are
    * capped by the maximum gap (value range), not by row count, the same
    * argument as the cents kernel in `Profile.winsorize`; sub-second SLOs
    * would bucket to millis, same shape. One user_id window pass builds
    * the gaps, one map-side-combined count builds the histogram, and the
    * cumulative walk + nearest-rank picks run over histogram rows only.
    */
  def latencyQuantiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(col("event_type"),
        expr("(ts_us - prev_us) DIV 1000000").as("gap_s"))
    val hist = gaps.groupBy("event_type", "gap_s").agg(count(lit(1)).as("c"))
    val cum = hist.select(col("event_type"), col("gap_s"),
      sum(col("c")).over(Window.partitionBy("event_type").orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
      sum(col("c")).over(Window.partitionBy("event_type")).as("n"))
    cum.groupBy("event_type").agg(
      max(col("n")).as("n_gaps"),
      min(when(col("cum") >= expr("(50 * n + 99) DIV 100"), col("gap_s"))).as("p50_s"),
      min(when(col("cum") >= expr("(90 * n + 99) DIV 100"), col("gap_s"))).as("p90_s"),
      min(when(col("cum") >= expr("(99 * n + 99) DIV 100"), col("gap_s"))).as("p99_s"))
  }

  def rollingActive(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d0"))
      .distinct()
      .select(col("user_id"),
        explode(sequence(col("d0"), date_add(col("d0"), RollingDays - 1))).as("day"))
      .distinct()
      .groupBy("day")
      .agg(count(lit(1)).as("n_active_7d"))

  /** EWMA decay factor. ½ is deliberate: multiplying an IEEE double by 0.5
    * only decrements the exponent (exact), so each smoothing step
    * `0.5·v + 0.5·e` performs exactly ONE rounding operation (the add) —
    * and an identical ordered replay lands on bit-identical doubles.
    */
  val EwmaAlpha = 0.5

  /** ts_ewma — per-user exponentially-weighted moving average of `value`
    * over the event sequence: e₁ = v₁, eᵢ = α·vᵢ + (1−α)·eᵢ₋₁ in the
    * repo's (ts_us, event_id) total order — the standard smoothing /
    * online-baseline signal (monitoring EWMAs, anomaly baselines, the
    * momentum term of a training loop all share this fold).
    *
    * Unlike every other float in the gate (which travels as exact cents or
    * rank-only), the EWMA is irreducibly a float RECURRENCE — it cannot be
    * integerized without changing the operator. It stays oracle-exact
    * anyway because the fold is order-pinned and each step rounds once
    * (see [[EwmaAlpha]]): DuckDB replaying the same recurrence over the
    * same sequence performs the same IEEE operations in the same order.
    *
    * Execution shape: one (user_id) exchange with secondary sort — the
    * same hot-key-safe typed sorted fold as `Behavior.debounce` (O(1)
    * state: the running average; a 10⁸-event key streams through without
    * buffering). No window function: `avg` has no decayed form, and a
    * window would buffer frames for what is a strict left fold.
    */
  def tsEwma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val alpha = EwmaAlpha
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts_us", $"event_id") { case (u, rows) =>
        var ewma = 0.0
        var first = true
        rows.map { case (_, us, id, v) =>
          ewma = if (first) { first = false; v }
                 else alpha * v + (1.0 - alpha) * ewma
          (u, id, us, ewma)
        }
      }
      .toDF("user_id", "event_id", "ts_us", "ewma")
  }
}
