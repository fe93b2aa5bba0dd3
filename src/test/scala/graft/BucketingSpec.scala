package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketing: the pre-shuffled layout for repeated co-located joins/aggs on
  * the same key (SURVEY §4 write-layout). At 100 TB, bucketing the silver
  * tables by ticker turns every indicator/pattern pass and every
  * bars×bars-derived join into a zero-exchange plan.
  */
class BucketingSpec extends SparkSpecBase {

  test("bucketed-by-ticker tables join and aggregate with zero exchanges") {
    val bars = Tables.bars(spark, sf)
    spark.sql("DROP TABLE IF EXISTS bars_bk_a")
    spark.sql("DROP TABLE IF EXISTS bars_bk_b")
    // a fresh in-memory metastore doesn't know about dirs a previous JVM
    // left in the warehouse — clear the physical locations too
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("bars_bk_a", "bars_bk_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$wh/$t"))
    }
    bars.write.bucketBy(8, "ticker").sortBy("ticker", "date")
      .mode("overwrite").saveAsTable("bars_bk_a")
    bars.select(col("ticker"), col("date"), col("close").as("close_b"))
      .write.bucketBy(8, "ticker").sortBy("ticker", "date")
      .mode("overwrite").saveAsTable("bars_bk_b")

    val a = spark.table("bars_bk_a")
    val b = spark.table("bars_bk_b")

    // force sort-merge (broadcast would win on fixture sizes and hide the
    // property being tested: bucketed SMJ needs no shuffle exchange)
    val joined = a.hint("merge").join(b, Seq("ticker", "date"))
    val jplan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(jplan.contains("SortMergeJoin"), jplan)
    assert(!jplan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$jplan")
    assert(joined.count() === bars.count())

    val agg = a.groupBy(col("ticker")).agg(sum(col("volume")).as("v"))
    val aplan = agg.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!aplan.contains("Exchange hashpartitioning"),
      s"bucketed agg must not shuffle:\n$aplan")
    assert(agg.count() === 100)
  }
}
