package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** dq_violations — the declarative data-quality rule pass every ingest
    * runs before publishing a drop: referential integrity, temporal sanity,
    * and domain checks over the order tables, one row per rule with
    * (rule, n_checked, n_violations, sample_key) — `sample_key` the MIN
    * violating key (deterministic, and the first thing an on-call engineer
    * asks for), NULL when the rule is clean. Zero-violation rows are part
    * of the report: "checked and clean" is the signal, absence is not.
    *
    * Execution shape: all six rules ride TWO joined scans. The lineitem
    * rules (FK to orders, ship-before-order, non-positive quantity,
    * discount domain) share one lineitem⋈orders LEFT join — the FK check
    * is the null side of the SAME join the temporal rule needs, so
    * integrity does not cost its own anti-join pass — and the order rules
    * (FK to customer, non-positive total) share one orders⋈customer LEFT
    * join. Each pass is one map-side-combinable aggregate (conditional
    * counts + conditional mins); the six rule rows are a `stack` of the
    * two one-row aggregates. Dimension sides broadcast when small; at
    * 100 TB the joins shuffle on the FK — the partitioning the fact
    * tables already use.
    */
  /** robust_scale — the third histogram-kernel normalizer (clip =
    * [[winsorize]], rank = [[rankNormalize]], robust-z = this): per
    * event_type, scaled = (cents − median) / IQR with nearest-rank
    * p25/p50/p75 — the outlier-immune standardization (mean/stddev moves
    * with the tail; the median and quartiles don't). Quartiles are VALUES
    * FROM THE DATA (nearest-rank, integral cents), the division is the one
    * float op — same IEEE expression on both engines — and a degenerate
    * IQR of 0 (constant-ish type) pins scaled to 0 explicitly.
    *
    * Same skew-proof shape as its siblings: quartiles from the bounded
    * (type, cents) histogram's cumulative walk, broadcast back onto the
    * scan; the raw stream is never sorted.
    */
  def robustScale(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val hist = ev.groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
    val cum = hist.select(col("event_type"), col("cents"), col("c"),
      sum(col("c")).over(Window.partitionBy("event_type").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
      sum(col("c")).over(Window.partitionBy("event_type")).as("n"))
    def rank(q: Int): Column = expr(s"($q * n + 99) DIV 100")
    val quart = cum.groupBy("event_type").agg(
      min(when(col("cum") >= rank(25), col("cents"))).as("p25_cents"),
      min(when(col("cum") >= rank(50), col("cents"))).as("med_cents"),
      min(when(col("cum") >= rank(75), col("cents"))).as("p75_cents"))
    ev.join(broadcast(quart), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        (col("med_cents").cast("double") / lit(100.0)).as("median"),
        ((col("p75_cents") - col("p25_cents")).cast("double") / lit(100.0)).as("iqr"),
        when(col("p75_cents") === col("p25_cents"), lit(0.0))
          .otherwise((col("cents") - col("med_cents")).cast("double") /
            (col("p75_cents") - col("p25_cents")).cast("double")).as("scaled"))
  }

  /** Short-document threshold for [[corpusReport]] (chars). */
  val ShortDocChars = 50L

  /** drift_psi — Population-Stability-Index drift monitor over the events
    * `value` distribution: the stream is split at its time midpoint
    * (reference = first half, current = second half — the
    * week-over-week comparison a production pipeline runs on every
    * ingest), the REFERENCE half defines decile bin edges (the exact
    * ceil-rank order statistics, [[robustScale]]'s formula, over integer
    * cents), and each bin reports both populations' exact counts plus its
    * Laplace-smoothed PSI contribution (p−q)·ln(p/q) with
    * p=(n_ref+1)/(D_ref+10), q=(n_cur+1)/(D_cur+10). Σ contributions ≥
    * 0.2 is the standard "distribution moved, re-examine the mix" alarm.
    * Counts and bin edges are exact BIGINTs (cents discipline); the
    * contribution is rounded to 4 decimals — the one ln() in the gate, on
    * identical exact-derived doubles both sides, so only a sub-ulp libm
    * disagreement landing exactly on a 5·10⁻⁵ boundary could diverge
    * (the exact count columns pin the row regardless).
    *
    * 100 TB plan: two scans collapse to histograms immediately — the
    * decile derivation runs on the (distinct cents)-sized reference
    * histogram (value-range-bounded, like value_histogram: the unusual
    * unpartitioned window is over that bounded histogram, never rows),
    * edges broadcast back as one row, and the per-bin counts are one
    * map-side-combined aggregate onto 10 rows. Nothing driver-side,
    * nothing row-scale past the first aggregate.
    */
  def driftPsi(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.TransientCache.cache(
      Tables.events(s, dir).select(
        unix_micros(col("ts")).as("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents")))
    val bounds = ev.agg(min("ts_us").as("mn"), max("ts_us").as("mx"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .select(col("cents"), expr("ts_us <= (mn + mx) DIV 2").as("is_ref"))
    val edges = decileEdges(tagged.filter(col("is_ref")).select("cents"))
    val binned = tagged.crossJoin(broadcast(edges))
      .select(col("is_ref"),
        DecileQs.map(q => when(col("cents") > col(s"e$q"), 1L).otherwise(0L))
          .reduce(_ + _).as("bin"))
    val counts = binned.groupBy("bin").agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
    psiFromCounts(s, counts, edges)
  }

  /** The decile grid shared by [[driftPsi]], its streaming twin and the
    * edge/bin helpers below.
    */
  private[graft] val DecileQs: Seq[Int] = 10 to 90 by 10

  /** Reference decile bin edges (one row, e10..e90) from a (cents) frame —
    * the exact ceil-rank order statistics over the integer-cents histogram
    * ([[robustScale]]'s formula). The window runs over the (distinct
    * cents)-sized histogram, never rows.
    */
  private[graft] def decileEdges(refCents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = refCents.groupBy("cents").agg(count(lit(1)).as("c"))
    val cum = hist.select(col("cents"),
      sum(col("c")).over(Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
      sum(col("c")).over(Window.partitionBy()).as("n"))
    val edgeAggs = DecileQs.map(q =>
      min(when(col("cum") >= expr(s"($q * n + 99) DIV 100"), col("cents")))
        .as(s"e$q"))
    cum.agg(edgeAggs.head, edgeAggs.tail: _*)
  }

  /** PSI tail shared by [[driftPsi]] and the streaming twin: spine-fill the
    * per-bin (n_ref, n_cur) counts to all 10 bins, derive the Laplace-
    * smoothed contribution, and attach bin boundaries from the 1-row
    * `edges` frame. Everything here is constant-size (≤10 rows, broadcast
    * one-row aggregates).
    */
  private[graft] def psiFromCounts(s: SparkSession, counts: DataFrame,
      edges: DataFrame): DataFrame = {
    val spine = s.range(10).select(col("id").as("bin"))
    val filled = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = filled.agg(sum("n_ref").as("d_ref"), sum("n_cur").as("d_cur"))
    val edgeArr = array(DecileQs.map(q => col(s"e$q")): _*)
    val p = (col("n_ref") + lit(1L)).cast("double") /
      (col("d_ref") + lit(10L)).cast("double")
    val q = (col("n_cur") + lit(1L)).cast("double") /
      (col("d_cur") + lit(10L)).cast("double")
    filled.crossJoin(broadcast(totals)).crossJoin(broadcast(edges))
      .select(col("bin"),
        when(col("bin") >= 1L, element_at(edgeArr, col("bin").cast("int")))
          .as("lo_cents"),
        when(col("bin") <= 8L, element_at(edgeArr, (col("bin") + 1L).cast("int")))
          .as("hi_cents"),
        col("n_ref"), col("n_cur"),
        round((p - q) * log(p / q), 4).as("psi_contrib4"))
  }

  /** corpus_report — the one-glance corpus health summary a curation
    * pipeline publishes with every drop: document/source/language
    * cardinalities, exact-duplicate pressure, short-doc pressure, and
    * total volume in chars and whitespace tokens, as (metric, value) rows
    * — every value an exact BIGINT (rates are a downstream division).
    * `n_dup_docs` counts documents whose md5 digest is shared (all
    * members, not just the surplus), the number dedup_exact would inspect;
    * `n_surplus_docs` is what it would drop.
    *
    * Execution shape: one scan feeds a single multi-metric aggregate
    * (cardinalities map-side partial, sums combinable); the duplicate
    * pressure rides the SAME md5-digest shuffle dedup_exact uses, reduced
    * to two scalars before joining the report. Output is a `stack` of the
    * two one-row aggregates — constant-size regardless of corpus.
    */
  def corpusReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_chars")).as("total_chars"),
      sum(when(col("n_chars") < ShortDocChars, 1L).otherwise(0L)).as("n_short_docs"),
      sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("total_ws_tokens"))
    val dup = docs.select(md5(col("text")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("c"))
      .agg(
        sum(when(col("c") > 1L, col("c")).otherwise(0L)).as("n_dup_docs"),
        sum(when(col("c") > 1L, col("c") - 1L).otherwise(0L)).as("n_surplus_docs"))
    base.crossJoin(dup).select(expr(
      """stack(8,
        |  'n_docs', n_docs,
        |  'n_sources', n_sources,
        |  'n_langs', n_langs,
        |  'total_chars', total_chars,
        |  'n_short_docs', n_short_docs,
        |  'total_ws_tokens', total_ws_tokens,
        |  'n_dup_docs', n_dup_docs,
        |  'n_surplus_docs', n_surplus_docs) AS (metric, value)""".stripMargin))
  }

  /** corr_stats — exact correlation sufficient statistics for every pair of
    * lineitem's numeric measures: n, Σx, Σy, Σxy, Σx², Σy² per (x, y)
    * column pair, all in EXACT integer arithmetic over cents (the
    * value_histogram trick: the doubles carry ≤2 decimals, so round(v·100)
    * recovers the integral value losslessly). Pearson r, covariance, and
    * regression slopes are all pure functions of these six sums — computing
    * THEM here would force a libm sqrt whose last bit the two engines may
    * disagree on, while the sums are order-free integers, exact under any
    * partitioning. This is how a distributed profiler actually ships
    * correlation: sufficient statistics partial-aggregate map-side, one
    * scalar row crosses the wire per partition, and the final division
    * happens once at the consumer.
    *
    * Sums of squares of 10⁷-cent prices exceed int64 at fixture scale
    * already (Σprice² ≈ 6·10¹⁹ at sf0.1), so accumulation is DECIMAL(38,0)
    * on the Spark side and HUGEINT in the oracle — both exact integers.
    * The FINAL projection casts every statistic to its exact decimal
    * STRING: wide-decimal outputs are hash-unstable across gate paths
    * (DuckDB int128 vs parquet fixed_len_byte_array(16) vs Python
    * `Decimal` canonicalization), while the digit string is
    * representation-proof under any hash and loses nothing — scale-0
    * decimals stringify identically ("123", no point, no exponent) in
    * Spark, DuckDB, and Python.
    *
    * Plan: ONE scan, ONE global aggregate (map-side partials reduce each
    * partition to a single 15-number row), then the 6 pair rows unfold from
    * the scalar aggregate via explode — no second pass, no shuffle beyond
    * the partial-aggregate gather.
    */
  def corrStats(s: SparkSession, dir: String): DataFrame = {
    val measures = Seq("qty" -> "l_quantity", "price" -> "l_extendedprice",
      "disc" -> "l_discount", "tax" -> "l_tax")
    val names = measures.map(_._1)
    val cents = Tables.lineitem(s, dir).select(
      measures.map { case (n, c) =>
        expr(s"CAST(CAST(round($c * 100) AS BIGINT) AS DECIMAL(38,0))").as(n)
      }: _*)
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    val aggCols =
      count(lit(1)).cast("decimal(38,0)").as("n") +:
      (names.flatMap(c => Seq(
        sum(col(c)).as(s"s_$c"),
        sum(col(c) * col(c)).as(s"ss_$c"))) ++
       pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") })
    val one = cents.agg(aggCols.head, aggCols.tail: _*)
    val pairStructs = pairs.map { case (a, b) =>
      struct(lit(a).as("x"), lit(b).as("y"), col("n"),
        col(s"s_$a").as("sum_x"), col(s"s_$b").as("sum_y"),
        col(s"sp_${a}_$b").as("sum_xy"),
        col(s"ss_$a").as("sum_xx"), col(s"ss_$b").as("sum_yy"))
    }
    val stats = Seq("n", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy")
    one.select(explode(array(pairStructs: _*)).as("p")).select("p.*")
      .select(col("x") +: col("y") +:
        stats.map(c => col(c).cast("string").as(c)): _*)
  }

  /** cogroup_fill — order-header vs line-item reconciliation through the
    * typed COGROUP operator: per order key, the header's total (exact
    * cents) next to the count and sum of its line items — the "does the
    * invoice match its lines" accounting pass. Semantically a left join +
    * aggregate (which the oracle replays), but expressed through
    * `KeyValueGroupedDataset.cogroup` deliberately: it is the Dataset API's
    * asymmetric-merge primitive — both sides arrive grouped on the same
    * key in one function call — and the one typed-API member the engine
    * had not yet exercised. The right plan shape for logic that needs BOTH
    * sides' groups at once (here each side folds independently, so a join
    * would also do; when the merge logic interleaves sides — e.g. matching
    * line sequences against header amendments — cogroup is the only
    * non-UDF home for it).
    *
    * Scale shape: one hash exchange per side on the shared key, NO join
    * node; each group streams through its iterator (the fold is O(1)
    * state, so a 10⁶-line order never buffers). Headerless line groups
    * are surfaced with a null total — the reconciliation rows a left join
    * would drop silently on the other side.
    */
  def cogroupFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_cents"))
      .as[(Long, Long)]
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("item_cents"))
      .as[(Long, Long)]
    ord.groupByKey(_._1).cogroup(li.groupByKey(_._1)) { (k, os, ls) =>
      var nItems = 0L; var itemCents = 0L
      ls.foreach { case (_, v) => nItems += 1L; itemCents += v }
      val headers = os.map(_._2).toList
      if (headers.isEmpty)
        // lines without a header: surface, don't drop
        Iterator.single((k, Option.empty[Long], nItems, itemCents))
      else headers.iterator.map(t => (k, Some(t), nItems, itemCents))
    }.toDF("o_orderkey", "total_cents", "n_items", "items_cents")
  }

  def dqViolations(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        col("l_shipdate"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
    val cust = Tables.customer(s, dir).select(col("c_custkey"))
    val liJoined = li.join(ord.select(col("o_orderkey"), col("o_orderdate")),
      li("l_orderkey") === col("o_orderkey"), "left")
    val liAgg = liJoined.agg(
      count(lit(1)).as("li_n"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("fk_li_v"),
      min(when(col("o_orderkey").isNull, col("l_orderkey"))).as("fk_li_k"),
      sum(when(col("o_orderkey").isNotNull &&
        col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L)).as("ship_v"),
      min(when(col("o_orderkey").isNotNull &&
        col("l_shipdate") < col("o_orderdate"), col("l_orderkey"))).as("ship_k"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("qty_v"),
      min(when(col("l_quantity") <= 0, col("l_orderkey"))).as("qty_k"),
      sum(when(col("l_discount") < 0 || col("l_discount") > lit(0.1), 1L)
        .otherwise(0L)).as("disc_v"),
      min(when(col("l_discount") < 0 || col("l_discount") > lit(0.1),
        col("l_orderkey"))).as("disc_k"))
    val ordAgg = ord.join(cust, ord("o_custkey") === col("c_custkey"), "left")
      .agg(
        count(lit(1)).as("o_n"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("fk_o_v"),
        min(when(col("c_custkey").isNull, col("o_orderkey"))).as("fk_o_k"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("price_v"),
        min(when(col("o_totalprice") <= 0, col("o_orderkey"))).as("price_k"))
    liAgg.crossJoin(ordAgg).select(expr(
      """stack(6,
        |  'fk_lineitem_orders',  li_n, fk_li_v, fk_li_k,
        |  'ship_before_order',   li_n, ship_v,  ship_k,
        |  'nonpositive_quantity', li_n, qty_v,  qty_k,
        |  'discount_domain',     li_n, disc_v,  disc_k,
        |  'fk_orders_customer',  o_n,  fk_o_v,  fk_o_k,
        |  'nonpositive_total',   o_n,  price_v, price_k)
        | AS (rule, n_checked, n_violations, sample_key)""".stripMargin))
  }
}
