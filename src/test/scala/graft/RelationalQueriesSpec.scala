package graft

import org.apache.spark.sql.functions._

class RelationalQueriesSpec extends SparkSpecBase {

  test("every declared query has an oracle or is explicitly rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run non-empty on sf0.001 (except set-difference ones)") {
    val mayBeEmpty = Set("q_anti_join", "q_except", "q_anomaly_counts")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("product aggregate is exact and skips nulls") {
    import spark.implicits._
    val df = Seq(("a", Some(2.0)), ("a", Some(3.0)), ("a", None),
      ("b", None)).toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(graft.functions.ProductAgg.product($"v").as("p"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").contains(6.0))
    assert(got("b").isEmpty)
  }

  test("dedup keep-last keeps exactly one row per key") {
    val df = SparkEntry.queries("q_dedup_keep_last")(spark, sf)
    val dupes = df.groupBy(col("o_custkey")).count().filter(col("count") > 1).count()
    assert(dupes === 0)
  }

  test("topk is ordered and bounded") {
    val rows = SparkEntry.queries("q_topk")(spark, sf).collect()
    assert(rows.length <= 20)
    val totals = rows.map(_.getDouble(1))
    assert(totals.sameElements(totals.sorted.reverse))
  }
}
