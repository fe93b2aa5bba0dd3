package graft

import graft.operators.{AsOfJoin, DedupOps, TextOps}
import graft.syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fluent facade must be a zero-logic passthrough: every method's
  * ANALYZED plan is identical to the direct library call's, so the two can
  * never diverge semantically. */
class SyntaxSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val bars = Tables.bars(spark, sf)

  private def planOf(df: DataFrame): String =
    df.queryExecution.analyzed.canonicalized.toString

  test("asofJoin facade ≡ AsOfJoin.asOf") {
    val splits = bars.select(col("ticker"), col("date").as("sd"))
      .groupBy(col("ticker")).agg(min(col("sd")).as("sd"))
      .withColumn("factor", lit(2.0))
    val direct = AsOfJoin.asOf(bars, splits, Seq("ticker"), "date", "sd",
      Seq("factor"))
    val fluent = bars.asofJoin(splits, Seq("ticker"), "date", "sd",
      Seq("factor"))
    assert(planOf(fluent) === planOf(direct))
  }

  test("dedup facades ≡ DedupOps") {
    assert(planOf(docs.dedupExact()) === planOf(DedupOps.exactDedup(docs)))
    assert(planOf(docs.duplicatedSpans()) ===
      planOf(DedupOps.duplicatedSpans(docs)))
  }

  test("text facades ≡ TextOps") {
    assert(planOf(docs.qualityMetrics()) ===
      planOf(TextOps.qualityMetrics(docs)))
    assert(planOf(docs.wordStats()) === planOf(TextOps.wordStats(docs)))
    assert(planOf(docs.piiRedact()) === planOf(TextOps.piiRedact(docs)))
    assert(planOf(docs.langId()) === planOf(TextOps.langId(docs)))
  }

  test("facade chains compose with plain Dataset ops") {
    val kept = docs.qualityMetrics().filter(col("punct_ratio") <= 0.2)
      .select(col("doc_id"))
    assert(kept.count() > 0)
  }
}
