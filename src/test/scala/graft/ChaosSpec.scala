package graft

import org.apache.spark.TaskContext
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{MapReduceJob, Workloads}

/** The crash workload (reference `src/mrapps/crash.go:20-54` + harness loop
  * `test-mr.sh:160-203`): inject task-attempt failures and assert the output
  * still equals the fault-free golden — Spark's task retry + output committer
  * supply the reference's watchdog/re-queue/atomic-rename semantics.
  *
  * The injector fails EVERY task once (attempt 0) — stronger than the
  * reference's p=1/3 coin, and deterministic. `local[4, 3]` in TestSpark
  * allows up to 3 attempts.
  */
class ChaosSpec extends AnyFunSuite {
  import TestSpark._

  private val failFirstAttempt: () => Unit = () => {
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0)
      throw new RuntimeException("chaos: injected failure on attempt 0")
  }

  test("crash: output equals nocrash golden despite every task failing once") {
    val s = spark
    import s.implicits._
    val pairs = s.sparkContext.wholeTextFiles(PgGlob)
      .map { case (p, c) => ("../" + p.substring(p.lastIndexOf('/') + 1), c) }
      .toDS()
    val job = new MapReduceJob(
      Workloads.crashMap(failFirstAttempt),
      Workloads.crashReduce(failFirstAttempt))
    val got = MapReduceJob.toOutputLines(job.runOn(pairs))
    val golden = scala.io.Source.fromFile(NocrashGolden)
      .getLines().filter(_.nonEmpty).toSeq.sorted
    assert(got == golden)
  }
}
