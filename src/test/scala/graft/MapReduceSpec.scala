package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{KeyValue, MapReduceJob, Workloads}

/** Core MapReduceJob mechanics: line-split vs whole-file equivalence for
  * line-local mapfs, and the distributed sorted text sink.
  */
class MapReduceSpec extends AnyFunSuite {
  import TestSpark._

  private val oneFile = "/root/reference/src/main/pg-being_ernest.txt"

  test("runLines == run for a line-local mapf (wc)") {
    val job = new MapReduceJob(Workloads.wcMap, Workloads.wcReduce)
    val whole = MapReduceJob.toOutputLines(job.run(spark, oneFile))
    val lines = MapReduceJob.toOutputLines(job.runLines(spark, oneFile))
    assert(whole == lines)
    assert(whole.size > 100)
  }

  test("writeSortedText produces a totally ordered text sink, no driver collect") {
    val s = spark
    import s.implicits._
    val ds = s.createDataset(Seq(
      KeyValue("b", "2"), KeyValue("a", "1"), KeyValue("c", "3"),
      KeyValue("a", "0"), KeyValue("z", "9")))
    val out = Files.createTempDirectory("mr-sink").toString + "/out"
    MapReduceJob.writeSortedText(ds, out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    val lines = files.flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq).toSeq
    assert(lines == Seq("a 0", "a 1", "b 2", "c 3", "z 9"))
  }

  test("reduce sees the complete multiset of values per key") {
    val s = spark
    import s.implicits._
    val pairs = s.createDataset(
      (1 to 100).map(i => (s"f$i", s"k${i % 7}"))).map { case (f, k) => (k, f) }
    val job = new MapReduceJob(
      (_, _) => Nil, // unused: we call reduce directly
      (_, values) => values.size.toString)
    val mapped = pairs.map { case (k, v) => KeyValue(k, v) }
    val out = job.reduce(s, mapped).collect().map(kv => kv.key -> kv.value.toInt).toMap
    assert(out.values.sum == 100)
    assert(out.keySet == (0 to 6).map(i => s"k$i").toSet)
  }
}
