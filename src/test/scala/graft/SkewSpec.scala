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

  test("AQE skew-join split engages on a planted hot key (the automatic path)") {
    // the manual salting above is the always-works mitigation; this pins
    // that the AUTOMATIC one (AQE's OptimizeSkewedJoin) actually fires
    // under this engine's session shape, so at 100 TB a surprise hot key
    // is split at runtime even where no one salted. Thresholds are scoped
    // to the test (restored after), sized so the planted 40k-row key is
    // "skewed" relative to its siblings.
    //
    // NOTE (suite-parallelism hazard): the five confs below are mutated on
    // the SHARED TestSpark session and restored in the finally. Suites run
    // sequentially (ScalaTest default; parallelExecution is not enabled in
    // build.sbt), so no other suite can observe the window where broadcast
    // joins are disabled. If suite-level parallelism is ever turned on,
    // move this test onto its own SparkSession first — otherwise
    // plan-shape assertions elsewhere (PlanShapeSpec's broadcast checks)
    // can flake.
    val s = spark
    import s.implicits._
    val conf = s.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // force a shuffled join: broadcast would bypass the skew machinery
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val fact = (0L until 50000L).map { i =>
        (if (i % 5 != 0) 1L else i % 97, s"payload-$i-${"x" * 32}")
      }.toDF("k", "payload")
      val dim = (0L until 97L).map(k => (k, s"dim-$k")).toDF("k", "dv")
      val j = fact.join(dim, "k")
      // execute THIS plan instance (count() builds its own QueryExecution
      // and would leave j's plan un-finalized by AQE)
      assert(j.collect().length == 50000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "expected AQE to mark the hot-key join side skewed:\n" + plan.take(800))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => util.Try(conf.unset(k))
    }
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
