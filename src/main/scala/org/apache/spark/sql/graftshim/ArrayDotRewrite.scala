package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, EqualTo, Expression, If, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Size, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Optimizer rule: rewrite the higher-order dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  *
  * into the whole-stage-codegen'd [[ArrayDotExpr]] kernel, so SQL users who
  * write the portable HOF formulation get the tight generated loop
  * automatically (measured several times faster on the ANN scoring path —
  * the HOF materializes and folds an intermediate array per row through
  * interpreted lambdas).
  *
  * Soundness: `zip_with` null-pads the SHORTER array, and with these
  * lambdas any padded null poisons the whole fold to NULL; the rewrite
  * therefore guards on equal sizes and yields NULL otherwise — bit-exact
  * with the original for every input, including null arrays and empty
  * arrays (0.0 = 0.0). A null ELEMENT also poisons the fold, so nullable-
  * element arrays (every parquet-sourced array) rewrite to the null-aware
  * kernel [[ArrayDotNullSafeExpr]]; provably-null-free arrays get the
  * branch-free [[ArrayDotExpr]].
  */
object ArrayDotRewrite extends Rule[LogicalPlan] {

  private def doubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def elementsNullable(t: DataType): Boolean = t match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  /** body vars are exactly the lambda's two arguments (either order). */
  private def usesBothArgs(x: NamedLambdaVariable, y: NamedLambdaVariable,
      args: Seq[NamedLambdaVariable]): Boolean =
    args.length == 2 && Set(x.exprId, y.exprId) == args.map(_.exprId).toSet

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), false)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aa: NamedLambdaVariable, av: NamedLambdaVariable, _),
            Seq(ma: NamedLambdaVariable, mv: NamedLambdaVariable), false),
          finish)
        if isIdentity(finish) &&
          usesBothArgs(mx, my, Seq(zx, zy)) &&
          usesBothArgs(aa, av, Seq(ma, mv)) &&
          doubleArray(l.dataType) && doubleArray(r.dataType) =>
      val kernel =
        if (elementsNullable(l.dataType) || elementsNullable(r.dataType))
          ArrayDotNullSafeExpr(l, r)
        else ArrayDotExpr(l, r)
      If(EqualTo(Size(l, legacySizeOfNull = false), Size(r, legacySizeOfNull = false)),
        kernel,
        Literal(null, DoubleType))
  }
}

/** Null-aware sibling of [[ArrayDotExpr]] for element-NULLABLE arrays (all
  * parquet-sourced arrays read back as containsNull=true): any null element
  * in the scanned range yields NULL — exactly the poisoned-fold semantics of
  * `aggregate(zip_with(...))` — while the no-null common case stays one
  * tight codegen'd loop with a cheap per-element branch.
  */
case class ArrayDotNullSafeExpr(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types._

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot_nullsafe"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotNullSafeExpr =
    copy(left = newLeft, right = newRight)
}
