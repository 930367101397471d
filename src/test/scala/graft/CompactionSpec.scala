package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** Small-file compaction: the mechanical claim (64 small files in, exactly
  * CompactTarget files out) plus content invariance at row granularity —
  * the registered gate fingerprints groups; this pins individual rows.
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  test("fileSkipStats: manifest matches the physical layout and prunes the predicate") {
    val got = Compaction.fileSkipStats(spark, Sf0001).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("min_id"),
          r.getAs[Long]("max_id"), r.getAs[Boolean]("would_scan"))).toMap
    val ids = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val w = ids.max / Compaction.SkipBuckets + 1
    val expect = ids.groupBy(_ / w).map { case (b, bs) =>
      b -> (bs.length.toLong, bs.min, bs.max,
        !(bs.max < 2 * w || bs.min > 5 * w - 1))
    }
    assert(got.view.mapValues(v => (v._1, v._2, v._3, v._4)).toMap == expect)
    // the predicate genuinely prunes: some partitions scan, some skip
    val flags = got.values.map(_._4).toSet
    assert(flags == Set(true, false), s"prune flag must discriminate: $got")
  }

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
