package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| for two ASCENDING-sorted long arrays, as a native Catalyst
  * expression — the hot loop of set-similarity verification.
  *
  * The composable alternatives either explode the pair into one row per
  * common element (`pairs ⨝ shingles ⨝ shingles` — an |pairs|·|set| row
  * shuffle plus a re-aggregation; the dominant cost of Jaccard
  * verification at corpus scale) or allocate an intermediate array per row
  * (`size(array_intersect(a, b))` — hash-set build per row, no codegen
  * guarantee). This expression is a single allocation-free merge pass per
  * row inside whole-stage codegen: O(|a| + |b|), nothing but two cursors.
  *
  * Inputs MUST be sorted ascending (callers build them with
  * `sort_array(collect_list(...))`); duplicate elements are counted at
  * min-multiplicity, matching set semantics when inputs are de-duplicated.
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires array<bigint> args, " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val (n, m) = (la.numElements(), ra.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val a = la.getLong(i); val b = ra.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      s"""
         |int $n = $l.numElements();
         |int $m = $r.numElements();
         |int $i = 0; int $j = 0; long ${ev.value}_c = 0L;
         |while ($i < $n && $j < $m) {
         |  long $a = $l.getLong($i);
         |  long $b = $r.getLong($j);
         |  if ($a == $b) { ${ev.value}_c++; $i++; $j++; }
         |  else if ($a < $b) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}_c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SetExpressions {
  /** `sorted_intersect_count(a, b)` — |A ∩ B| over ascending long arrays. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedArrayIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
