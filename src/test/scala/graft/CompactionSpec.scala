package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** Small-file compaction: the mechanical claim (64 small files in, exactly
  * CompactTarget files out) plus content invariance at row granularity —
  * the registered gate fingerprints groups; this pins individual rows.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  test("compaction: 64 files in, CompactTarget out, rows bit-identical") {
    val (small, compacted) = Compaction.compactDocuments(spark, Sf0001)
    assert(Compaction.dataFiles(small).length == Compaction.SmallFiles)
    assert(Compaction.dataFiles(compacted).length == Compaction.CompactTarget)
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"))).toSet
    val orig = rows(s"$Sf0001/documents.parquet")
    assert(rows(small) === orig, "staging lost rows")
    assert(rows(compacted) === orig, "compaction lost rows")
    // balanced output: round-robin repartition spreads rows near-evenly
    val perFile = Compaction.dataFiles(compacted).map(f =>
      spark.read.parquet(f.getAbsolutePath).count())
    assert(perFile.max - perFile.min <= perFile.sum / Compaction.CompactTarget / 2,
      s"compacted files skewed: ${perFile.mkString(",")}")
  }
}
