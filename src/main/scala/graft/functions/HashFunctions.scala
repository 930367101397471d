package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{Fnv64Expr, GraftColumnShim}

/** Deterministic 64-bit string hashing as a first-class engine extension:
  * a native Catalyst `Expression` with whole-stage-codegen support
  * ([[org.apache.spark.sql.graftshim.Fnv64Expr]] — the preferred
  * extensibility tier over Scala UDFs: no ser/de boundary, stays inside the
  * generated loop), registered either per-session
  * ([[GraftFunctions.register]]) or globally via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object HashFunctions {
  /** 64-bit FNV-1a over UTF-16 code units. Public + statically forwarded so
    * generated Java code calls it directly; shared with the dedup operators'
    * typed maps so SQL users and the Scala pipeline agree on fingerprints.
    */
  def fnv64(str: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < str.length) { h ^= str.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }
}

object GraftFunctions {
  /** Column-API form: `GraftFunctions.fnv64(col("text"))`. */
  def fnv64(c: Column): Column =
    GraftColumnShim.column(Fnv64Expr(GraftColumnShim.expression(c)))

  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 1, "fnv64 expects exactly one argument")
    Fnv64Expr(exprs.head)
  }

  /** Register `fnv64` into an existing session's function registry so
    * `spark.sql("SELECT fnv64(x) ...")` works.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv64", builder, "built-in")
}

/** For `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64Expr].getName, "fnv64"),
      builderFn))

  private val builderFn: Seq[Expression] => Expression =
    exprs => Fnv64Expr(exprs.head)
}
