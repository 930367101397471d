package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

/** Salting correctness: the skew-mitigated plans must produce exactly the
  * unsalted answers.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("saltedCount == plain groupBy count on a skewed key") {
    val li = Tables.lineitem(spark, Sf0001)
    val salted = Skew.saltedCount(li, Seq("l_returnflag")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    val plain = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("count")).toMap
    assert(salted == plain)
    assert(salted.values.sum == li.count())
  }

  test("saltedJoin == plain join") {
    val orders = Tables.orders(spark, Sf0001)
      .select(org.apache.spark.sql.functions.col("o_custkey").as("c_custkey"),
        org.apache.spark.sql.functions.col("o_orderkey"))
    val dim = Tables.customer(spark, Sf0001).select("c_custkey", "c_mktsegment")
    val salted = Skew.saltedJoin(orders, dim, "c_custkey")
      .select("o_orderkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = orders.join(dim, "c_custkey")
      .select("o_orderkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }
}
