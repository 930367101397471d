package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Sketch aggregates: bounded relative error against the exact answers
  * (sketch internals are engine-specific, so no SQL oracle).
  */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("q19: HLL distinct within 5%, approx median within 5%") {
    val r = Relational.q19Approx(spark, Sf0001).collect()(0)
    val approxParts = r.getAs[Long]("approx_parts").toDouble
    val exactParts = r.getAs[Long]("exact_parts").toDouble
    assert(math.abs(approxParts - exactParts) / exactParts < 0.05,
      s"HLL: $approxParts vs $exactParts")
    val q50 = r.getSeq[Double](r.fieldIndex("price_q50_q95")).head
    val exactQ50 = r.getAs[Double]("exact_q50")
    assert(math.abs(q50 - exactQ50) / exactQ50 < 0.05,
      s"median: $q50 vs $exactQ50")
  }
}
