package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Behavioral event analytics: funnel conversion and cohort retention — the
  * two queries every product-events warehouse runs daily, and the natural
  * batch complement of the event-time operators (q15 windows, q16 sessions,
  * q25/q33 streaming).
  *
  * Both share one execution shape, the same hot-key-safe secondary sort the
  * KV replay uses (`core/KvStore.scala`): repartition on `user_id`, sort
  * each partition by (user_id, ts, event_id), then stream a single fold
  * over the partition iterator with O(1) state per user — a user's events
  * arrive contiguous and time-ordered, so neither operator ever buffers a
  * user's history. At 100 TB that is the difference between "a power user
  * with 10⁸ events is a slowdown" and "is an OOM": `groupByKey` +
  * sort-in-memory dies on the hot user; the streaming fold does not. The
  * per-user results are tiny (a depth, a handful of week offsets), and the
  * final aggregation over them is a second, trivially small shuffle.
  *
  * Determinism: folds consume events in (ts, event_id) order, all step
  * arithmetic is integral microseconds / epoch days, and the emitted rows
  * are pure functions of the data — identical under any partitioning, and
  * replayable in ANSI-ish SQL (see the funnel / cohort_retention oracles in
  * `SparkEntry`).
  */
object Behavior {

  /** The funnel step sequence over the fixture's event types. */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** Conversion window: every later step must land within 7 days of the
    * FIRST step's event (and strictly after the previous step).
    */
  val FunnelWindowMicros: Long = 7L * 86400L * 1000000L

  /** Per-user funnel depth: the number of steps completed, where step k+1
    * is the user's EARLIEST `FunnelSteps(k+1)` event strictly after the
    * step-k event and within [[FunnelWindowMicros]] of step 1. Earliest-
    * qualifying-event chaining makes the depth a pure function of the data
    * (no greedy ambiguity): it is exactly the min-chaining the SQL oracle
    * computes, evaluated in one streaming pass because events arrive in
    * time order.
    *
    * Users with none of the step event types emit nothing; users whose
    * qualifying events never start the funnel emit depth 0.
    */
  private[graft] def funnelDepths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nSteps = FunnelSteps.length
    val stepOf = FunnelSteps.zipWithIndex.toMap
    // filter + projection reach the parquet scan: only funnel-step events
    // (and three narrow columns) enter the exchange
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin(FunnelSteps: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
    ev.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
      .as[(Long, Long, Long, String)]
      .mapPartitions { rows =>
        var curUser = 0L
        var started = false
        var depth = 0
        var t1 = 0L // first-step time (window anchor)
        var tStep = 0L // last completed step's time
        def advance(tpe: String, ts: Long): Unit = {
          val k = stepOf(tpe)
          if (depth == 0) {
            if (k == 0) { depth = 1; t1 = ts; tStep = ts }
          } else if (depth < nSteps && k == depth &&
            ts > tStep && ts <= t1 + FunnelWindowMicros) {
            depth += 1; tStep = ts
          }
        }
        val main = rows.flatMap { case (u, ts, _, tpe) =>
          val emit = if (started && u != curUser) Iterator.single((curUser, depth))
          else Iterator.empty
          if (!started || u != curUser) { curUser = u; started = true; depth = 0 }
          advance(tpe, ts)
          emit
        }
        // lazy suffix: evaluated only after `main` exhausts, closing the
        // final user
        main ++ (if (started) Iterator.single((curUser, depth)) else Iterator.empty)
      }
      .toDF("user_id", "depth")
  }

  /** funnel — the registered query: users reaching each step of
    * view → click → purchase under the window rule above. Three integral
    * rows (step, step_name, n_users); conversion ratios are a downstream
    * division away and would only add float noise to the gate.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val d = funnelDepths(s, dir)
    val counts = FunnelSteps.indices.map(i =>
      count(when(col("depth") >= i + 1, true)).as(s"n${i + 1}"))
    val agg = d.agg(counts.head, counts.tail: _*)
    val stackArgs = FunnelSteps.zipWithIndex
      .map { case (name, i) => s"${i + 1}, '$name', n${i + 1}" }
      .mkString(", ")
    agg.select(expr(
      s"stack(${FunnelSteps.length}, $stackArgs) AS (step, step_name, n_users)"))
  }

  /** Per-user active weeks: the user's cohort day (epoch day of their first
    * event) plus every distinct week offset (floor((day − cohort_day)/7))
    * they were active in. Offsets are nondecreasing in time order, so
    * streaming dedupe is one comparison — no per-user set.
    */
  private[graft] def userWeeks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
    ev.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        val MicrosPerDay = 86400L * 1000000L
        var curUser = 0L
        var started = false
        var cohortDay = 0L
        var lastOff = -1L
        rows.flatMap { case (u, ts, _) =>
          val day = ts / MicrosPerDay // fixture timestamps are post-epoch
          if (!started || u != curUser) {
            curUser = u; started = true; cohortDay = day; lastOff = 0L
            Iterator.single((u, cohortDay, 0L))
          } else {
            val off = (day - cohortDay) / 7L
            if (off != lastOff) { lastOff = off; Iterator.single((u, cohortDay, off)) }
            else Iterator.empty
          }
        }
      }
      .toDF("user_id", "cohort_day", "week_offset")
  }

  /** cohort_retention — the registered query: the classic retention matrix.
    * Rows (cohort_day, week_offset, n_users): of the users whose FIRST
    * event fell on `cohort_day`, how many were active `week_offset` weeks
    * later. Each user contributes at most once per (cohort, offset) by
    * construction of [[userWeeks]], so a plain count is the distinct-user
    * count — no count(distinct) shuffle amplification.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    userWeeks(s, dir)
      .groupBy(
        date_add(lit(java.sql.Date.valueOf("1970-01-01")),
          col("cohort_day").cast("int")).as("cohort_day"),
        col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
}
