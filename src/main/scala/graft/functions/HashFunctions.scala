package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{ArrayDotExpr, Fnv64Expr, GraftColumnShim, SortedOverlapExpr}

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

  /** Codegen'd dot product of two array<double> columns (the ANN scoring
    * kernel) — one tight generated loop, bit-deterministic ascending-index
    * summation.
    */
  def arrayDot(a: Column, b: Column): Column =
    GraftColumnShim.column(
      ArrayDotExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Intersection size of two sorted distinct array<int> columns (two-
    * pointer merge, no per-row allocation) — the similarity-join
    * verification kernel.
    */
  def sortedOverlap(a: Column, b: Column): Column =
    GraftColumnShim.column(
      SortedOverlapExpr(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  private val fnv64Builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 1, "fnv64 expects exactly one argument")
    Fnv64Expr(exprs.head)
  }
  private val dotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "array_dot expects exactly two arguments")
    ArrayDotExpr(exprs(0), exprs(1))
  }
  private val overlapBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.size == 2, "sorted_overlap expects exactly two arguments")
    SortedOverlapExpr(exprs(0), exprs(1))
  }

  /** Register both functions into an existing session's registry so
    * `spark.sql("SELECT fnv64(x), array_dot(a, b) ...")` works, plus the
    * [[org.apache.spark.sql.graftshim.ArrayDotRewrite]] optimizer rule
    * (HOF dot-product idiom → native kernel) for this session.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv64", fnv64Builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_overlap", overlapBuilder, "built-in")
    if (!spark.experimental.extraOptimizations.contains(
        org.apache.spark.sql.graftshim.ArrayDotRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          org.apache.spark.sql.graftshim.ArrayDotRewrite
    // the native as-of join planner strategy (tier c of the extension
    // ladder: expression -> rule -> strategy)
    if (!spark.experimental.extraStrategies.contains(
        org.apache.spark.sql.graftshim.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+
          org.apache.spark.sql.graftshim.AsOfJoinStrategy
  }
}

/** For `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64Expr].getName, "fnv64"),
      { exprs: Seq[Expression] => Fnv64Expr(exprs.head) }))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotExpr].getName, "array_dot"),
      { exprs: Seq[Expression] => ArrayDotExpr(exprs(0), exprs(1)) }))
    ext.injectFunction((
      FunctionIdentifier("sorted_overlap"),
      new ExpressionInfo(classOf[SortedOverlapExpr].getName, "sorted_overlap"),
      { exprs: Seq[Expression] => SortedOverlapExpr(exprs(0), exprs(1)) }))
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftshim.ArrayDotRewrite)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftshim.AsOfJoinStrategy)
  }
}
