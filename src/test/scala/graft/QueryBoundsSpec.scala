package graft

import org.apache.spark.sql.functions._

/** Bound assertions for the two queries that can't be oracle-hashed
  * (sketch internals / non-SQL byte math differ across engines by design):
  * the driver records them rows-only, so the correctness argument lives
  * here instead. */
class QueryBoundsSpec extends SparkSpecBase {

  test("q_approx_distinct: HLL estimate within rsd bounds of exact") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(countDistinct(col("source")).as("nd"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (lang, (nd, n)) =>
      val (a, an) = approx(lang)
      // approx_count_distinct default rsd = 5%; 3σ + slack for tiny groups
      assert(math.abs(a - nd) <= math.max(2L, math.ceil(nd * 0.2).toLong),
        s"lang=$lang approx=$a exact=$nd")
      assert(an === n, s"exact count column must match: $lang")
    }
  }

  test("q_mm_decode: feature shape, byte-mean bounds, determinism") {
    val run1 = SparkEntry.queries("q_mm_decode")(spark, sf).collect()
    assert(run1.nonEmpty)
    run1.foreach { r =>
      assert(r.getInt(1) > 0, s"n_bytes must be positive: $r")
      val mean = r.getDouble(2)
      assert(mean >= 0.0 && mean <= 255.0, s"mean_byte out of range: $r")
      assert(r.getInt(3) === 8, s"feature_dim must be the declared width: $r")
    }
    // n_bytes agrees with the oracle-checked metadata path
    val metaBytes = SparkEntry.queries("q_mm_meta")(spark, sf)
      .select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    run1.foreach(r => assert(r.getInt(1) === metaBytes(r.getLong(0))))
    // byte-for-byte deterministic across runs (no partition-order effects)
    val run2 = SparkEntry.queries("q_mm_decode")(spark, sf).collect()
    assert(run1.map(_.toString).sorted.toSeq === run2.map(_.toString).sorted.toSeq)
  }
}
