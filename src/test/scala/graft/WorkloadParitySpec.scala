package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{KeyValue, MapReduceJob, Workloads}

/** The reference's own correctness methodology, ported (SURVEY.md §5):
  * differential distributed-vs-sequential equality on the pg corpus, plus
  * byte-equality against the committed goldens (`mr-indexer-all`,
  * `mr-correct-crash.txt` — reference `src/main/test-mr.sh:59-67,195-203`).
  */
class WorkloadParitySpec extends AnyFunSuite {
  import TestSpark._

  /** pg files keyed exactly as the reference harness names them (`../pg-x.txt`,
    * relative to src/main/mr-tmp) so golden `a`/`b` values match.
    */
  private def refNamedPairs = {
    val s = spark
    import s.implicits._
    s.sparkContext.wholeTextFiles(PgGlob)
      .map { case (p, c) => ("../" + p.substring(p.lastIndexOf('/') + 1), c) }
      .toDS()
  }

  private def lines(ds: org.apache.spark.sql.Dataset[KeyValue]): Seq[String] =
    MapReduceJob.toOutputLines(ds)

  test("wc: distributed == sequential oracle (differential, test-mr.sh:59-67)") {
    val job = new MapReduceJob(Workloads.wcMap, Workloads.wcReduce)
    val dist = lines(job.run(spark, PgGlob))
    val seq = lines(job.runSequential(spark, PgGlob))
    assert(dist.size > 1000)
    assert(dist == seq)
  }

  test("indexer: matches the committed reference golden mr-indexer-all") {
    val job = new MapReduceJob(Workloads.indexerMap, Workloads.indexerReduce)
    val got = lines(job.runOn(refNamedPairs))
    val golden = scala.io.Source.fromFile(IndexerGolden).getLines().filter(_.nonEmpty).toSeq.sorted
    assert(got.size == golden.size)
    assert(got == golden)
  }

  test("nocrash: matches the committed reference golden mr-correct-crash.txt") {
    val job = new MapReduceJob(Workloads.nocrashMap, Workloads.nocrashReduce)
    val got = lines(job.runOn(refNamedPairs))
    val golden = scala.io.Source.fromFile(NocrashGolden).getLines().filter(_.nonEmpty).toSeq.sorted
    assert(got == golden)
  }

  test("wc via typed Aggregator (map-side combine) == holistic mapGroups wc") {
    val s = spark
    import s.implicits._
    val mapped = s.sparkContext.wholeTextFiles(PgGlob)
      .flatMap { case (n, c) => Workloads.wcMap(n, c) }.toDS()
    val agg = Workloads.wcViaAggregator(mapped)
    val holistic = new MapReduceJob(Workloads.wcMap, Workloads.wcReduce)
      .reduce(s, mapped)
    assert(lines(agg) == lines(holistic))
  }

  test("indexer doc lists are distinct and sorted (per-document dedup)") {
    val job = new MapReduceJob(Workloads.indexerMap, Workloads.indexerReduce)
    val out = job.runOn(refNamedPairs).collect()
    out.foreach { kv =>
      val Array(_, docs) = kv.value.split(" ", 2)
      val ds = docs.split(",").toSeq
      assert(ds == ds.sorted, s"unsorted doc list for ${kv.key}")
      assert(ds == ds.distinct, s"duplicate docs for ${kv.key}")
    }
  }
}
