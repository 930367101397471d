package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `fnv64(string) -> bigint` as a codegen'd Catalyst expression — FNV-1a 64
  * over UTF-16 code units, identical to `graft.functions.HashFunctions
  * .fnv64` (to which both eval paths delegate).
  *
  * Lives under `org.apache.spark.sql.*` because the supporting APIs
  * (`AbstractDataType`, `ExpressionUtils.column`) are `private[sql]` in
  * Spark 4; the public face is `graft.functions.GraftFunctions`.
  */
case class Fnv64Expr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.HashFunctions.fnv64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFunctions.fnv64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64Expr =
    copy(child = newChild)
}

/** Column <-> Expression bridging (private[sql] in Spark 4). */
object GraftColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
