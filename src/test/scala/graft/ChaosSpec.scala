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

  test("declarative path: dedup agg survives every task failing once") {
    // same retry contract on the Dataset/aggregation surface the extension
    // operators use: a fail-once typed map upstream of a hash aggregate
    // must not change the result (retries recompute the partition whole)
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val chaos = failFirstAttempt // local val: don't capture the spec class
    val chaotic = graft.sources.Tables.documents(s, Sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it => chaos(); it }
      .toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val clean = graft.operators.Dedup.exact(s, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(chaotic == clean)
    assert(chaotic.nonEmpty)
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
