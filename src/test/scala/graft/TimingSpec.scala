package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{MapReduceJob, Workloads}

/** mtiming/rtiming parallelism probes (reference `src/mrapps/mtiming.go:19-90`,
  * `rtiming.go:62-83`; harness asserts ≥2 concurrent tasks,
  * `test-mr.sh:102-150`). On local[4] the probe is a JVM-global high-water
  * concurrency counter instead of pid marker files.
  */
class TimingSpec extends AnyFunSuite {
  import TestSpark._

  /** AQE correctly coalesces the probe's tiny shuffle into ONE partition,
    * which serializes the reduce and defeats the parallelism measurement —
    * pin it off for the probe, analogous to the reference hardcoding 10
    * reduce tasks (`mrmaster.go:25`).
    */
  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("mtiming: >= 2 concurrent map tasks observed") {
    val name = "mtiming-spec"
    Workloads.ConcurrencyProbe.reset(name)
    val job = new MapReduceJob(Workloads.mtimingMap(name), Workloads.mtimingReduce)
    val out = job.run(spark, PgGlob).collect()
    assert(out.length == 16) // 8 files x (times-, parallel-) keys
    assert(Workloads.ConcurrencyProbe.maxSeen(name) >= 2,
      s"map parallelism ${Workloads.ConcurrencyProbe.maxSeen(name)} < 2")
  }

  test("rtiming: >= 2 concurrent reduce tasks observed") { withoutAqe {
    val name = "rtiming-spec"
    Workloads.ConcurrencyProbe.reset(name)
    val job = new MapReduceJob(Workloads.rtimingMap, Workloads.rtimingReduce(name))
    val out = job.run(spark, PgGlob).collect()
    assert(out.map(_.key).sorted.toSeq == ('a' to 'j').map(_.toString))
    assert(Workloads.ConcurrencyProbe.maxSeen(name) >= 2,
      s"reduce parallelism ${Workloads.ConcurrencyProbe.maxSeen(name)} < 2")
  } }
}
