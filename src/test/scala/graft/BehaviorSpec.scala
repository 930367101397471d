package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

/** Funnel and cohort-retention semantics: hand-computed depths on planted
  * event sequences (window cutoffs, strict-after ties, out-of-order types),
  * plus a fixture differential against a driver-side brute-force replay of
  * the min-chaining rule.
  */
class BehaviorSpec extends AnyFunSuite {
  import TestSpark._

  private val Day = 86400L * 1000000L // micros

  /** Temp events.parquet with the fixture's shape — `ts` a raw NANOSECOND
    * long, as `Tables.events` expects from the driver's TIMESTAMP(NANOS)
    * parquet. Offsets supplied in micros since a 2024-01-01 UTC base so
    * window arithmetic reads naturally.
    */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val s = spark
    import s.implicits._
    val baseUs = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val dir = java.nio.file.Files.createTempDirectory("behavior").toString
    rows.map { case (eid, us, uid, tpe) =>
      (eid, (baseUs + us) * 1000L, uid, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def depths(dir: String): Map[Long, Int] =
    Behavior.funnelDepths(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("depth")).toMap

  test("funnelDepths: planted sequences hit the documented rule") {
    val dir = writeEvents(Seq(
      // user 1: clean view -> click -> purchase inside the window
      (1L, 0L, 1L, "view"), (2L, Day, 1L, "click"), (3L, 2 * Day, 1L, "purchase"),
      // user 2: purchase without a click never advances past the view
      (4L, 0L, 2L, "view"), (5L, Day, 2L, "purchase"),
      // user 3: pre-view click ignored; purchase lands outside the 7-day
      // window anchored at the FIRST view
      (6L, 0L, 3L, "click"), (7L, Day, 3L, "view"),
      (8L, Day + 3600L * 1000000L, 3L, "click"), (9L, 9 * Day, 3L, "purchase"),
      // user 4: no view at all -> depth 0
      (10L, 0L, 4L, "purchase"),
      // user 5: click at the same microsecond as the view fails strict
      // AFTER; the next click one microsecond later advances
      (11L, 0L, 5L, "view"), (12L, 0L, 5L, "click"), (13L, 1L, 5L, "click"),
      // user 6: second view does NOT re-anchor the window — purchase at
      // day 8 is outside the window of the FIRST view
      (14L, 0L, 6L, "view"), (15L, 2 * Day, 6L, "view"),
      (16L, Day, 6L, "click"), (17L, 8 * Day, 6L, "purchase")))
    assert(depths(dir) == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> 2, 6L -> 2))
  }

  test("funnel: step counts stack the depth distribution") {
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "view"), (2L, Day, 1L, "click"), (3L, 2 * Day, 1L, "purchase"),
      (4L, 0L, 2L, "view"), (5L, Day, 2L, "click"),
      (6L, 0L, 3L, "view"),
      (7L, 0L, 4L, "error")))
    val got = Behavior.funnel(spark, dir).collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("step_name"), r.getAs[Long]("n_users")))
      .toSet
    assert(got == Set((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelDepths: fixture matches a driver-side min-chaining replay") {
    val events = graft.sources.Tables.events(spark, Sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"), r.getAs[String]("event_type")))
    val byUser = events.groupBy(_._1)
    val expected = byUser.flatMap { case (u, evs) =>
      def minAfter(tpe: String, after: Long, anchor: Long): Option[Long] = {
        val c = evs.filter(e => e._3 == tpe && e._2 > after &&
          e._2 <= anchor + Behavior.FunnelWindowMicros).map(_._2)
        if (c.isEmpty) None else Some(c.min)
      }
      val views = evs.filter(_._3 == "view").map(_._2)
      if (evs.forall(e => !Behavior.FunnelSteps.contains(e._3))) None
      else if (views.isEmpty) Some(u -> 0)
      else {
        val t1 = views.min
        minAfter("click", t1, t1) match {
          case None => Some(u -> 1)
          case Some(t2) => minAfter("purchase", t2, t1) match {
            case None => Some(u -> 2)
            case Some(_) => Some(u -> 3)
          }
        }
      }
    }
    assert(depths(Sf0001) == expected)
  }

  test("cohort_retention: planted users land in hand-computed cells") {
    val dir = writeEvents(Seq(
      // user 1: first event day 0 -> cohort 2024-01-01; active weeks 0 and 2
      (1L, 0L, 1L, "view"), (2L, 15 * Day, 1L, "click"), (3L, 16 * Day, 1L, "view"),
      // user 2: first event day 1 -> cohort 2024-01-02; offsets relative to
      // the user's OWN first day: day 1 -> 0, day 8 -> 1
      (4L, Day, 2L, "error"), (5L, 8 * Day, 2L, "purchase"),
      // user 3: same cohort day as user 1, week-0 only
      (6L, Day / 2, 3L, "signup")))
    val got = Behavior.cohortRetention(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_users"))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L)))
  }

  test("userWeeks: fixture emits each (user, offset) exactly once, matching brute force") {
    val events = graft.sources.Tables.events(spark, Sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us")))
    val expected = events.groupBy(_._1).iterator.flatMap { case (u, evs) =>
      val d0 = evs.map(_._2).min / Day
      evs.map(e => (u, d0, (e._2 / Day - d0) / 7L)).distinct
    }.toSet
    val got = Behavior.userWeeks(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cohort_day"),
        r.getAs[Long]("week_offset")))
    assert(got.length == got.distinct.length)
    assert(got.toSet == expected)
  }

  test("anomalyDays: fixture flags exactly the brute-force 2-sigma set") {
    val events = graft.sources.Tables.events(spark, Sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us") / Day))
    val expected = events.groupBy(_._1).iterator.flatMap { case (u, evs) =>
      val daily = evs.groupBy(_._2).map { case (d, es) => (d, es.size.toLong) }
      val n = daily.size.toLong
      val s = daily.values.sum
      val ss = daily.values.map(c => c * c).sum
      // exact BigInt evaluation of (c·n − s)² > 4·(n·ss − s²)
      daily.collect {
        case (d, c) if n >= 7 &&
          BigInt(c * n - s).pow(2) > BigInt(4) * (BigInt(n) * ss - BigInt(s) * s) =>
          (u, d, c)
      }
    }.toSet
    val got = Behavior.anomalyDays(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"),
        r.getAs[Long]("cnt"))).toSet
    assert(got == expected)
  }

  test("anomalyDays: constant-volume users flag nothing; one spike day flags") {
    // user 1: 8 days of exactly 1 event -> sigma 0, no day deviates
    val flat = (0 until 8).map(d => ((d + 10).toLong, d * Day, 1L, "view"))
    // user 2: 7 quiet days + one 10-event burst on day 7
    val quiet = (0 until 7).map(d => ((d + 50).toLong, d * Day, 2L, "view"))
    val burst = (0 until 10).map(j => ((j + 80).toLong, 7 * Day + j, 2L, "click"))
    val got = Behavior.anomalyDays(spark, writeEvents(flat ++ quiet ++ burst))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cnt"))).toSet
    val day0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond / 86400L
    assert(got == Set((2L, 10L)))
    val full = Behavior.anomalyDays(spark, writeEvents(flat ++ quiet ++ burst))
      .collect().map(r => r.getAs[Long]("day")).toSet
    assert(full == Set(day0 + 7))
  }

  test("stateIntervals: planted runs collapse with half-open validity") {
    // user 1: view view click view  -> runs (view,2) (click,1) (view,1)
    val dir = writeEvents(Seq(
      (1L, 0L, 1L, "view"), (2L, 10L, 1L, "view"), (3L, 20L, 1L, "click"),
      (4L, 30L, 1L, "view"),
      // user 2: a single state, valid_to stays NULL
      (5L, 0L, 2L, "signup")))
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val got = Behavior.stateIntervals(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("valid_from_us"),
        Option(r.getAs[Any]("valid_to_us")).map(_.asInstanceOf[Long]),
        r.getAs[Long]("n_events"))).toSet
    assert(got == Set(
      (1L, 1L, "view", base, Some(base + 20L), 2L),
      (1L, 2L, "click", base + 20L, Some(base + 30L), 1L),
      (1L, 3L, "view", base + 30L, None, 1L),
      (2L, 1L, "signup", base, None, 1L)))
  }

  test("stateIntervals: fixture intervals tile each user's event span") {
    val rows = Behavior.stateIntervals(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id"),
        r.getAs[Long]("valid_from_us"),
        Option(r.getAs[Any]("valid_to_us")).map(_.asInstanceOf[Long]),
        r.getAs[Long]("n_events")))
    val nEvents = graft.sources.Tables.events(spark, Sf0001).count()
    assert(rows.map(_._5).sum == nEvents) // every event is in exactly one run
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq)
      // each run's valid_to is the successor's valid_from; only the last is open
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
      assert(ordered.last._4.isEmpty)
    }
  }

  test("eventTransitions: fixture bigrams match brute force in (ts, event_id) order") {
    val events = graft.sources.Tables.events(spark, Sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val expected = events.groupBy(_._1).iterator.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.iterator.zip(ordered.iterator.drop(1))
    }.toSeq.groupBy(identity).map { case (p, ps) => (p._1, p._2, ps.size.toLong) }
      .toSet
    val got = Behavior.eventTransitions(spark, Sf0001).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"))).toSet
    assert(got == expected)
  }
}
