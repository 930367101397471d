package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, TextOps}
import graft.sources.Tables

/** Structural invariants of the relational suite (value-level correctness is
  * the DuckDB oracle's job — these are fast regression guards that don't
  * need the oracle, plus optimized-vs-faithful cross-checks).
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("q5_topk is globally sorted desc with deterministic tiebreak") {
    val rows = Relational.q5TopK(spark, Sf0001).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices == prices.sorted.reverse)
  }

  test("q7_window keeps at most 2 rows per customer") {
    val rows = Relational.q7Window(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      assert(rs.length <= 2)
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("semi + anti join partition the customer table") {
    val semi = Relational.q9Semi(spark, Sf0001).count()
    val anti = Relational.q10Anti(spark, Sf0001).count()
    val total = Tables.customer(spark, Sf0001).count()
    assert(semi + anti == total)
  }

  test("q15 events window counts sum to the table row count") {
    val windowed = Relational.q15EventsWindow(spark, Sf0001)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(windowed == Tables.events(spark, Sf0001).count())
  }

  test("optimized wc == faithful MapReduce wc (SURVEY §7.2 step 4 cross-check)") {
    val opt = TextOps.wc(spark, Sf0001).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toMap
    val faithful = SparkEntry.queries("mr_wc")(spark, Sf0001).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value").toLong).toMap
    assert(opt == faithful)
    assert(opt.nonEmpty)
  }

  test("optimized indexer == faithful MapReduce indexer") {
    val opt = TextOps.indexer(spark, Sf0001).collect()
      .map(r => r.getAs[String]("word") ->
        s"${r.getAs[Long]("n_docs")} ${r.getAs[String]("docs")}").toMap
    val faithful = SparkEntry.queries("mr_indexer")(spark, Sf0001).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
    assert(opt == faithful)
  }

  test("rollup emits the grand-total row") {
    val rows = Relational.q13Rollup(spark, Sf0001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.lineitem(spark, Sf0001).count())
  }
}
