package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, HashFunctions}

/** The native `fnv64` Catalyst expression: interpreted/codegen parity with
  * the Scala function, SQL registration, null safety.
  */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  test("fnv64 column == Scala fnv64 (codegen path over a real scan)") {
    val rows = graft.sources.Tables.documents(spark, Sf0001)
      .select(org.apache.spark.sql.functions.col("text"),
        GraftFunctions.fnv64(org.apache.spark.sql.functions.col("text")).as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("h") == HashFunctions.fnv64(r.getAs[String]("text")))
    }
  }

  test("fnv64 registers as a SQL function") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT fnv64('abc') AS h").collect()(0).getAs[Long]("h")
    assert(got == HashFunctions.fnv64("abc"))
  }

  test("fnv64 is null-safe") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT fnv64(CAST(NULL AS STRING)) AS h").collect()(0)
    assert(r.isNullAt(0))
  }

  test("fnv64 known values are stable across releases") {
    // pinned: changing the hash silently would corrupt persisted fingerprints
    assert(HashFunctions.fnv64("") == 0xcbf29ce484222325L)
    assert(HashFunctions.fnv64("a") == ((0xcbf29ce484222325L ^ 'a'.toLong) * 0x100000001b3L))
  }
}
