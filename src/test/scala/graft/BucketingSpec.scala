package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Bucketed co-located join: same results as the plain join, and the
  * physical plan contains NO shuffle exchange — the write-once-shuffle-never
  * property the 100 TB design leans on.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed join elides the shuffle and matches the plain join") {
    val orders = Tables.orders(spark, Sf0001)
      .withColumnRenamed("o_custkey", "custkey")
    val cust = Tables.customer(spark, Sf0001)
      .withColumnRenamed("c_custkey", "custkey")
    Bucketing.writeBucketed(orders, "orders_b", "custkey", 4)
    Bucketing.writeBucketed(cust, "customer_b", "custkey", 4)

    // force the sort-merge path (at fixture size the planner would rather
    // broadcast — the co-location property under test is about the SMJ both
    // sides are too big for at real scale)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "orders_b", "customer_b", "custkey")
        .select("o_orderkey", "c_mktsegment")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed read not used:\n$plan")

      val got = joined.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val plain = orders.join(cust, "custkey")
        .select("o_orderkey", "c_mktsegment")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == plain)
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
