package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Sketch aggregates: bounded relative error against the exact answers
  * (sketch internals are engine-specific, so no SQL oracle).
  */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("q19: HLL distinct within 5%, approx percentiles within 5%") {
    val r = Relational.q19ApproxRaw(spark, Sf0001).collect()(0)
    val exact = graft.sources.Tables.lineitem(spark, Sf0001)
      .agg(
        org.apache.spark.sql.functions.countDistinct("l_partkey").as("parts"),
        org.apache.spark.sql.functions
          .expr("percentile(l_extendedprice, array(0.5, 0.95))").as("qs"))
      .collect()(0)
    val approxParts = r.getAs[Long]("approx_parts").toDouble
    val exactParts = exact.getAs[Long]("parts").toDouble
    assert(math.abs(approxParts - exactParts) / exactParts < 0.05,
      s"HLL: $approxParts vs $exactParts")
    val exactQs = exact.getSeq[Double](exact.fieldIndex("qs"))
    val q50 = r.getAs[Double]("price_q50")
    val q95 = r.getAs[Double]("price_q95")
    assert(q50 < q95)
    assert(math.abs(q50 - exactQs(0)) / exactQs(0) < 0.05, s"median: $q50 vs ${exactQs(0)}")
    assert(math.abs(q95 - exactQs(1)) / exactQs(1) < 0.05, s"p95: $q95 vs ${exactQs(1)}")
  }

  test("q19 bound report: every sketch-contract flag is 1 at both SFs") {
    for (dir <- Seq(Sf0001, Sf001)) {
      val r = Relational.q19Approx(spark, dir).collect()(0)
      assert(r.getAs[Long]("n_rows") > 0)
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Long]("parts_in_bounds") == 1L, s"HLL out of bounds at $dir")
      assert(r.getAs[Long]("q50_cdf_in_bounds") == 1L, s"q50 rank off at $dir")
      assert(r.getAs[Long]("q95_cdf_in_bounds") == 1L, s"q95 rank off at $dir")
    }
  }
}
