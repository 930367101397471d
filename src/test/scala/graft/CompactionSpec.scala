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

  test("byte-sized compaction: file count derives from input bytes; content invariant") {
    val (small, compacted, n) =
      Compaction.compactDocumentsBySize(spark, Sf0001)
    val inputBytes = Compaction.dataFiles(small).map(_.length).sum
    // the derivation is the claim: ceil(bytes / target), floored at 1 —
    // recomputed here from the staged files themselves
    val expected = math.max(1L,
      (inputBytes + Compaction.TargetBytesPerFile - 1) /
        Compaction.TargetBytesPerFile).toInt
    assert(n == expected, s"derived count $n != ceil($inputBytes/target)")
    assert(Compaction.dataFiles(compacted).length == n)
    // non-degenerate at fixture scale: the byte rule must actually bite
    // (not collapse to 1 file or echo the input count)
    assert(n > 1 && n < Compaction.SmallFiles, s"degenerate derived count $n")
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"))).toSet
    assert(rows(compacted) === rows(s"$Sf0001/documents.parquet"),
      "byte-sized compaction lost rows")
  }
}
