package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen expression.
  *
  * Spark ships Levenshtein but no Jaro-Winkler; the textbook definition
  * [Winkler 1990] is implemented here exactly as DuckDB/RapidFuzz evaluate
  * it, so the fuzzy-match queries oracle cross-engine: match window
  * ⌊max(|a|,|b|)/2⌋−1, transpositions over matched order, prefix bonus
  * p=0.1 capped at 4 chars applied only when jaro > 0.7, and the
  * both-or-either-empty → 0.0 convention (NOT 1.0 — pinned by spec).
  *
  * The scalar lives in a static method ([[jaroWinkler]]) that both the
  * interpreted eval and the generated code call — the same structure as
  * Spark's own Levenshtein (a static UTF8String call inside whole-stage
  * codegen), so the expression stays inside the codegen span without
  * inlining 60 lines of Java. Scratch arrays are char-length-bounded
  * per call; no allocation scales with the corpus.
  */
object StringSimilarity {

  /** Textbook Jaro similarity; 0.0 when either side is empty. */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: compare matched chars in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = m.toDouble
    (mm / la + mm / lb + (mm - t / 2) / mm) / 3.0
  }

  /** Jaro-Winkler: prefix bonus (cap 4, p = 0.1) over the 0.7 boost
    * threshold. Static forwarder — callable from generated Java. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val j = jaro(sa, sb)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(sa.length, sb.length))
    while (l < max && sa.charAt(l) == sb.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Column API: jaro_winkler(a, b) → double in [0, 1]. */
  def jaroWinklerCol(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), " +
          s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    StringSimilarity.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.StringSimilarity.jaroWinkler($l, $r)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
