package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Corpus

/** Corpus-statistics operators: vocabulary build + dictionary encode,
  * bigram collocation mining, and exact per-source order statistics —
  * hand-computed semantics on planted corpora.
  */
class CorpusSpec extends AnyFunSuite {
  import TestSpark._

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpus").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars") // fixture n_chars is BIGINT
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // --------------------------------------------------------- vocabEncode

  test("vocabEncode: ids follow frequency rank with lexicographic ties, OOV -> -1") {
    // freqs: b=3, a=2, c=2, z=1. k=3 vocab: b->0, a->1 (ties a<c), c->2; z OOV
    val dir = writeDocs(Seq(
      (1L, "b a c b", "en", "s0"),
      (2L, "b c a z", "en", "s0")))
    val byId = Corpus.vocabEncode(spark, dir, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[String]("ids") == "0,1,2,0")
    assert(byId(1L).getAs[Long]("n_toks") == 4L)
    assert(byId(1L).getAs[Long]("oov_count") == 0L)
    assert(byId(2L).getAs[String]("ids") == "0,2,1,-1")
    assert(byId(2L).getAs[Long]("oov_count") == 1L)
  }

  test("vocabEncode: id order is position order, not value order") {
    // single doc, descending-frequency prefix ensures ids are NOT sorted
    val dir = writeDocs(Seq((7L, "x y x", "en", "s0")))
    val r = Corpus.vocabEncode(spark, dir, k = 2).collect().head
    // x freq 2 -> id 0, y freq 1 -> id 1; positions x y x -> "0,1,0"
    assert(r.getAs[String]("ids") == "0,1,0")
  }

  // ---------------------------------------------------------- collocLift

  test("collocLift: hand-computed lift on a planted fixed phrase") {
    // tokens: "new york" always adjacent; "big" scattered.
    // doc1: new york big        doc2: big new york
    // stream: N=6 tokens, pairs: (new,york) (york,big) (big,new) (new,york) -> np=4
    // counts: new=2 york=2 big=2; pair (new,york)=2
    // lift(new,york) = (2*6*6)/(4*2*2) = 72/16 = 4.5
    val dir = writeDocs(Seq(
      (1L, "new york big", "en", "s0"),
      (2L, "big new york", "en", "s0")))
    val rows = Corpus.collocLift(spark, dir, k = 10).collect()
    val ny = rows.find(r =>
      r.getAs[String]("w1") == "new" && r.getAs[String]("w2") == "york").get
    assert(ny.getAs[Long]("pair_cnt") == 2L)
    assert(ny.getAs[Long]("c1") == 2L && ny.getAs[Long]("c2") == 2L)
    assert(ny.getAs[Double]("lift") == 4.5)
    // the fixed phrase outranks every incidental pair
    assert(rows.head.getAs[String]("w1") == "new")
    assert(rows.head.getAs[String]("w2") == "york")
  }

  test("collocLift: single-token docs contribute unigrams but no pairs") {
    val dir = writeDocs(Seq(
      (1L, "solo", "en", "s0"),
      (2L, "a b", "en", "s0")))
    val rows = Corpus.collocLift(spark, dir, k = 10).collect()
    // only pair is (a,b): lift = (1*3*3)/(1*1*1) = 9 — N counts "solo" too
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("lift") == 9.0)
  }

  // ----------------------------------------------------- sourceQuantiles

  test("sourceQuantiles: discrete p50/p90 are the ceil-rank order statistics") {
    // source s0: lengths 1..10 (doc_id = length for tiebreak determinism)
    // p50 -> rank ceil(10*0.5)=5 -> value 5; p90 -> rank 9 -> value 9
    val docs = (1 to 10).map(i => (i.toLong, "x" * i, "en", "s0")) :+
      (99L, "yyy", "en", "s1") // singleton source: all stats = 3
    val dir = writeDocs(docs)
    val bysrc = Corpus.sourceQuantiles(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s0 = bysrc("s0")
    assert(s0.getAs[Long]("n_docs") == 10L)
    assert(s0.getAs[Long]("min_chars") == 1L && s0.getAs[Long]("max_chars") == 10L)
    assert(s0.getAs[Long]("p50_chars") == 5L)
    assert(s0.getAs[Long]("p90_chars") == 9L)
    val s1 = bysrc("s1")
    assert(s1.getAs[Long]("n_docs") == 1L)
    assert(s1.getAs[Long]("p50_chars") == 3L && s1.getAs[Long]("p90_chars") == 3L)
  }

  test("sourceQuantiles: duplicate lengths keep ranks unique via doc_id tiebreak") {
    // four docs all length 2: every rank formula still hits exactly one row
    val dir = writeDocs((1 to 4).map(i => (i.toLong, "ab", "en", "s0")))
    val r = Corpus.sourceQuantiles(spark, dir).collect().head
    assert(r.getAs[Long]("p50_chars") == 2L && r.getAs[Long]("p90_chars") == 2L)
  }
}
