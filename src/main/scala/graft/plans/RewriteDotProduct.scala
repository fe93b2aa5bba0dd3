package graft.plans

import graft.functions.ArrayDotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the composable higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0d, (acc, v) => acc + v) }}}
  *
  * into the native [[ArrayDotProduct]] expression. Higher-order functions
  * evaluate their lambda interpreted, once per element, and allocate the
  * intermediate zipped array per row — on an all-pairs similarity join that
  * is the entire runtime (~25× on the near-dup query at sf0.1). Users who
  * write the idiomatic composable form get the codegen'd primitive loop
  * automatically; `array_dot` stays available for explicit use.
  *
  * Semantics are preserved exactly, which is why the rewrite targets the
  * STRICT variant: zip_with pads unequal lengths with nulls and a null
  * product nulls the whole aggregate, so `strict = true` returns null on
  * length mismatch or any null element, exactly like the HOF form. The
  * match also requires both multiply operands to be DoubleType (post-cast):
  * a raw float×float multiply rounds to float before accumulating, which
  * the double loop would not reproduce — those expressions are left alone.
  *
  * Injected via `spark.sql.extensions=graft.GraftExtensions` — the
  * conventional way a Spark library ships optimizer extensions.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case other            => other
  }

  /** Both operands are (casts of) exactly the two lambda variables. */
  private def usesBothVars(a: Expression, b: Expression,
                           args: Seq[NamedLambdaVariable]): Boolean =
    (stripCast(a), stripCast(b)) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        args.length == 2 &&
          Set(x.exprId, y.exprId) == args.map(_.exprId).toSet
      case _ => false
    }

  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(Multiply(mx, my, _), zargs, _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(Add(ax, ay, _), margs, _),
            finish)
          if zero == 0.0 &&
            mx.dataType == DoubleType && my.dataType == DoubleType &&
            usesBothVars(mx, my,
              zargs.collect { case v: NamedLambdaVariable => v }) &&
            usesBothVars(ax, ay,
              margs.collect { case v: NamedLambdaVariable => v }) &&
            isIdentityFinish(finish) &&
            isNumericArray(l) && isNumericArray(r) =>
        ArrayDotProduct(l, r, strict = true)
    }
}
