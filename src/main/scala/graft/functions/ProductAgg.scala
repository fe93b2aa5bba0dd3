package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact `product` aggregate (SURVEY A3 / §2.10).
  *
  * The reference multiplies all split factors per (ticker, date)
  * (`silver/splits.py:75-77`); Spark has no built-in product. An
  * `Aggregator` keeps it exact for any sign/zero (unlike the
  * `exp(sum(log))` rewrite) and gets map-side partial aggregation for
  * free — the buffer is a single Double, so at 100 TB this combines
  * locally before the shuffle exactly like `sum` does.
  *
  * Null handling matches SQL aggregates: nulls are skipped; an all-null
  * (or empty) group yields null.
  */
object ProductAgg extends Aggregator[java.lang.Double, Array[Double], java.lang.Double] {
  // buffer = (running product, seen-any-non-null flag)
  override def zero: Array[Double] = Array(1.0, 0.0)
  override def reduce(b: Array[Double], a: java.lang.Double): Array[Double] = {
    if (a != null) { b(0) *= a.doubleValue(); b(1) = 1.0 }
    b
  }
  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    x(0) *= y(0); x(1) = math.max(x(1), y(1)); x
  }
  override def finish(b: Array[Double]): java.lang.Double =
    if (b(1) == 0.0) null else java.lang.Double.valueOf(b(0))
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** `product(col)` as a Column aggregate. */
  def product(c: Column): Column = udaf(ProductAgg).apply(c)
}
