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
    val exact = graft.sources.Tables.lineitem(spark, Sf0001)
      .agg(
        org.apache.spark.sql.functions.countDistinct("l_partkey").as("parts"),
        org.apache.spark.sql.functions.expr("percentile(l_extendedprice, 0.5)").as("q50"))
      .collect()(0)
    val approxParts = r.getAs[Long]("approx_parts").toDouble
    val exactParts = exact.getAs[Long]("parts").toDouble
    assert(math.abs(approxParts - exactParts) / exactParts < 0.05,
      s"HLL: $approxParts vs $exactParts")
    val q50 = r.getSeq[Double](r.fieldIndex("price_q50_q95")).head
    val exactQ50 = exact.getAs[Double]("q50")
    assert(math.abs(q50 - exactQ50) / exactQ50 < 0.05,
      s"median: $q50 vs $exactQ50")
  }
}
