package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

/** Sketch tier: bloom join pruning must be answer-invariant vs the plain
  * join, and the HLL rollup must be exact below the sketch's coupon
  * promotion threshold (the regime the oracle gate relies on).
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("bloomPrune == plain join (pruning is answer-invariant)") {
    val out = Sketch.bloomPrune(spark, Sf0001)
    val expected = {
      val o = spark.read.parquet(s"$Sf0001/orders.parquet")
      val c = spark.read.parquet(s"$Sf0001/customer.parquet")
        .filter("c_mktsegment = 'BUILDING'")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .selectExpr("o_orderpriority",
          "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"),
          org.apache.spark.sql.functions.sum("cents").as("sum_cents"))
    }
    val got = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = expected.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("bloomPrune plan: codegen'd might_contain probe, broadcast dim join") {
    val plan = Sketch.bloomPrune(spark, Sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$plan")
  }

  test("hllCounts: estimates exact below promotion; ALL row unions sketches") {
    val rows = Sketch.hllCounts(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = spark.read.parquet(s"$Sf0001/events.parquet")
    val exact = ev.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.countDistinct("user_id").as("nd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((t, (n, nd)) <- exact) assert(rows(t) == ((n, nd)), s"type $t")
    val allNd = ev.select("user_id").distinct().count()
    assert(rows("ALL") == ((ev.count(), allNd)))
    assert(rows.size == exact.size + 1)
  }
}
