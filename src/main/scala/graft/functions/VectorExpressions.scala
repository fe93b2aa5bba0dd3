package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  IntegerType, LongType}

/** Dot product of two numeric arrays as a native Catalyst expression.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * is interpreted per element (higher-order functions don't codegen) and
  * allocates an intermediate array per row; on an all-pairs similarity join
  * that is the entire runtime. This expression generates one tight primitive
  * loop inside whole-stage codegen (doGenCode below; interpreted eval kept
  * for non-codegen paths), ~25× faster end-to-end on the near-dup query at
  * sf0.1 than the higher-order-function form.
  *
  * Summation is left-to-right in double, the same order as the composable
  * form and the SQL oracles' `SUM` over an ascending index — results are
  * bit-identical.
  */
case class ArrayDotProduct(left: Expression, right: Expression,
                           strict: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // strict can produce null (length mismatch / null element) even when both
  // children are non-nullable; without this override nullSafeCodeGen would
  // emit `false = true;` for ev.isNull (Janino error → codegen fallback) and
  // interpreted eval would return null from a declared-non-nullable slot.
  override def nullable: Boolean = strict || left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires array<float|double> args, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  @transient private lazy val leftGet = elementGetter(left.dataType)
  @transient private lazy val rightGet = elementGetter(right.dataType)

  private def elementGetter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _)  => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case other => throw new IllegalArgumentException(
      s"array_dot requires array<float|double>, got $other")
  }

  // strict ⇒ null on length mismatch or any null element — the exact
  // semantics of aggregate(zip_with(a, b, _*_), 0d, _+_), which is what the
  // RewriteDotProduct optimizer rule replaces; the default skips null
  // checks and runs to the shorter length (the explicit-API fast path).
  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    if (strict && la.numElements() != ra.numElements()) return null
    val n = math.min(la.numElements(), ra.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (strict && (la.isNullAt(i) || ra.isNullAt(i))) return null
      s += leftGet(la, i) * rightGet(ra, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def elem(dt: DataType, arr: String, idx: String): String = dt match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($idx)"
      case _                       => s"$arr.getDouble($idx)"
    }
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      val nullChecks =
        if (strict)
          s"""if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      val lengthGuard =
        if (strict) s"if ($l.numElements() != $r.numElements()) ${ev.isNull} = true;"
        else ""
      s"""
         |$lengthGuard
         |if (!${ev.isNull}) {
         |  int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullChecks
         |    $s += ${elem(left.dataType, l, i)} * ${elem(right.dataType, r, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Integer dot product of two int/long arrays — the quantized-domain
  * sibling of [[ArrayDotProduct]]. The int8 candidate scan in
  * [[graft.operators.SimilarityOps.sqKnn]]/`sqIvfKnn` ranks every
  * (query, candidate) pair by this value, and the composable
  * `aggregate(zip_with(...))` form is interpreted per element — on the
  * candidate scan that interpretation cost erased the entire point of
  * scanning 4×-narrower codes. One tight primitive loop in whole-stage
  * codegen; exact long arithmetic, so results are bit-identical to the
  * SQL oracles' integer SUM in any evaluation order. */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType | LongType, _),
            ArrayType(IntegerType | LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_dot_long requires array<int|bigint> args, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  @transient private lazy val leftGet = elementGetter(left.dataType)
  @transient private lazy val rightGet = elementGetter(right.dataType)

  private def elementGetter(dt: DataType): (ArrayData, Int) => Long = dt match {
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toLong
    case ArrayType(LongType, _)    => (a, i) => a.getLong(i)
    case other => throw new IllegalArgumentException(
      s"array_dot_long requires array<int|bigint>, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += leftGet(la, i) * rightGet(ra, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def elem(dt: DataType, arr: String, idx: String): String = dt match {
      case ArrayType(IntegerType, _) => s"(long) $arr.getInt($idx)"
      case _                         => s"$arr.getLong($idx)"
    }
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${elem(left.dataType, l, i)} * ${elem(right.dataType, r, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** `array_dot(a, b)` — Σ aᵢ·bᵢ in double. */
  def array_dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `array_dot_long(a, b)` — Σ aᵢ·bᵢ in exact long arithmetic. */
  def array_dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
