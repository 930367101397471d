package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.streaming.EventStreams

/** Pins the adaptive state-backend switch in
  * `EventStreams.runStagedViaFiles` (round 15 — the sf1000 probe's q58 fix,
  * specced round 16 per the r15 verdict):
  *
  *   (a) an ENTITY-KEYED stream (boundedState = false) whose staged input
  *       crosses the byte threshold runs with the RocksDB provider conf set
  *       (and actually completes through RocksDB);
  *   (b) `boundedState = true` keeps the in-heap default at ANY input size
  *       (the q57 lesson: the first byte-only cut taxed a 10-row histogram
  *       28.2 → 150.1 s at sf1000);
  *   (c) the provider conf is restored to its pre-call value after
  *       completion AND after a mid-stream failure.
  *
  * The threshold is driven through its session-conf override
  * (`RocksDbStagedBytesConf`) so a KB-scale fixture exercises both sides of
  * the comparison the 12.5 GB sf1000 file hit for real.
  *
  * Note `spark.conf.getOption` on a SQLConf-REGISTERED key returns the
  * key's DEFAULT, not None — so "in-heap" is observed as the HDFS-backed
  * default class and "restored" is before/after equality of `conf.get`,
  * the value every subsequent stream in the session actually resolves.
  */
class StateBackendSpec extends AnyFunSuite {
  import TestSpark._

  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val InHeapProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Runs `runStagedViaFiles` over the sf0.001 events fixture, recording the
    * provider conf observed at BUILD time (after the switch decides, before
    * the stream starts — the value the stream is constructed under).
    */
  private def runObserving(boundedState: Boolean,
      failing: Boolean = false): (String, Option[DataFrame]) = {
    var seen: String = null
    val build: String => DataFrame = { staged =>
      seen = spark.conf.get(EventStreams.StateProviderConf)
      val ev = EventStreams.readEvents(spark, staged)
      val src = if (failing) {
        val boom = udf { (l: Long) =>
          if (l >= 0L) throw new RuntimeException("mid-stream boom"); true
        }
        ev.filter(boom(col("user_id")))
      } else ev
      EventStreams.windowedCounts(src)
    }
    val out =
      if (failing) {
        intercept[Exception] {
          EventStreams.runStagedViaFiles(spark, Sf0001, "sbs-fail", build,
            boundedState = boundedState)
        }
        None
      } else Some(EventStreams.runStagedViaFiles(spark, Sf0001, "sbs-ok",
        build, boundedState = boundedState))
    (seen, out)
  }

  private def withThreshold(bytes: Long)(body: => Unit): Unit = {
    spark.conf.set(EventStreams.RocksDbStagedBytesConf, bytes.toString)
    try body
    finally spark.conf.unset(EventStreams.RocksDbStagedBytesConf)
  }

  test("entity-keyed stream past the threshold runs under RocksDB and restores the default") {
    val before = spark.conf.get(EventStreams.StateProviderConf)
    assert(before == InHeapProvider, s"unexpected session default: $before")
    withThreshold(1L) {
      val (seen, out) = runObserving(boundedState = false)
      assert(seen == RocksDbProvider,
        s"provider conf at stream build was $seen — the switch did not fire")
      assert(out.get.count() > 0, "stream produced no rows through RocksDB")
    }
    assert(spark.conf.get(EventStreams.StateProviderConf) == before,
      "provider conf leaked past the run")
  }

  test("boundedState keeps the in-heap default at any input size") {
    withThreshold(1L) {
      val (seen, out) = runObserving(boundedState = true)
      assert(seen == InHeapProvider,
        s"boundedState=true still switched the provider: $seen")
      assert(out.get.count() > 0)
    }
  }

  test("below the threshold the entity-keyed stream stays in-heap") {
    // no override: the default threshold is 4 GB, the fixture is KBs
    val (seen, out) = runObserving(boundedState = false)
    assert(seen == InHeapProvider,
      s"KB-scale input switched the provider: $seen")
    assert(out.get.count() > 0)
  }

  test("provider conf is restored after a mid-stream failure") {
    val before = spark.conf.get(EventStreams.StateProviderConf)
    withThreshold(1L) {
      val (seen, _) = runObserving(boundedState = false, failing = true)
      assert(seen == RocksDbProvider)
      assert(spark.conf.get(EventStreams.StateProviderConf) == before,
        "provider conf leaked past a failed run")
    }
  }

  test("an explicitly-set prior provider conf is restored, not clobbered") {
    // a VALID prior (streams genuinely run under whatever is set here):
    // explicit in-heap — distinguishable from the switch's RocksDB value
    spark.conf.set(EventStreams.StateProviderConf, InHeapProvider)
    try withThreshold(1L) {
      val (seen, _) = runObserving(boundedState = false)
      assert(seen == RocksDbProvider,
        "switch must overwrite DURING the run even with a caller-set conf")
      assert(spark.conf.get(EventStreams.StateProviderConf) == InHeapProvider,
        "caller's explicit provider conf not restored after the run")
    } finally spark.conf.unset(EventStreams.StateProviderConf)
  }
}
