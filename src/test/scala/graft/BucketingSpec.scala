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

  test("mortonCol: hand-computed interleaves and round-trip bijectivity on the fixture") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // interleave(x=3 (11b), y=5 (101b)): x bits at even positions ->
    // 0b000011_twice... bit-by-bit: x0=1->bit0, y0=1->bit1, x1=1->bit2,
    // y1=0, x2=0, y2=1->bit5 => 0b100111 = 39
    val hand = Seq((0L, 0L, 0L), (3L, 5L, 39L), (1L, 0L, 1L), (0L, 1L, 2L),
      ((1L << 20), (1L << 20), (1L << 40) | (1L << 41)))
    val got = hand.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(col("x"), col("y"), Bucketing.mortonCol(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == hand.toSet)
    // fixture round-trip: de-interleaving every zkey recovers exactly the
    // (partkey, suppkey) it came from — the key is a bijection on the
    // fixture's domain, so z-sorting loses no pruning information
    val rows = Bucketing.zorderKey(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Long]("zkey")
      var x = 0L; var y = 0L
      (0 until Bucketing.ZBits).foreach { b =>
        x |= ((z >> (2 * b)) & 1L) << b
        y |= ((z >> (2 * b + 1)) & 1L) << b
      }
      assert(x == r.getAs[Long]("l_partkey") && y == r.getAs[Long]("l_suppkey"))
      assert(r.getAs[Long]("zbucket") == (z >> 34))
    }
    // locality: keys in the same zbucket agree on the high bits of BOTH
    // coordinates (the property that keeps row-group stats tight on both)
    rows.groupBy(_.getAs[Long]("zbucket")).values.foreach { grp =>
      val hx = grp.map(r => r.getAs[Long]("l_partkey") >> (Bucketing.ZBits - 4)).distinct
      val hy = grp.map(r => r.getAs[Long]("l_suppkey") >> (Bucketing.ZBits - 4)).distinct
      assert(hx.size == 1 && hy.size == 1)
    }
  }
}
