package graft

import graft.pipeline.{Lake, Pipeline}
import graft.sources.{Checkpoints, Storage}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpecBase {

  test("medallion pipeline end-to-end: bronze → silver → gold") {
    val lake = Lake(Files.createTempDirectory("graft_lake").toString)
    Pipeline.runAll(spark, sf, lake)

    val bronze = Storage.readTable(spark, lake.bronze("stocks"))
    val daily = Storage.readTable(spark, lake.silver("daily_aggregates"))
    val weekly = Storage.readTable(spark, lake.silver("weekly_aggregates"))
    val gold = Storage.readTable(spark, lake.gold("vwap_signals"))

    assert(bronze.count() > 0)
    assert(daily.count() === bronze.count())
    assert(weekly.count() < daily.count())
    assert(gold.count() > 0)
    // bronze is hive-partitioned by date
    assert(bronze.columns.contains("date"))
    // checkpoints recorded
    val cp = Checkpoints.load(lake.checkpointPath)
    assert(cp.contains("bronze_stocks_last_date"))
    assert(cp.contains("silver_last_full_rewrite"))
  }

  test("silver append path: no new splits → incremental, not rewrite") {
    val lake = Lake(Files.createTempDirectory("graft_lake2").toString)
    Pipeline.runAll(spark, sf, lake)
    // second run with identical bronze: nothing newer than the checkpoint
    assert(!Pipeline.shouldFullRewrite(spark, lake))
    val before = Storage.readTable(spark, lake.silver("daily_aggregates")).count()
    Pipeline.runSilver(spark, lake)
    val after = Storage.readTable(spark, lake.silver("daily_aggregates")).count()
    assert(after === before) // empty append, no duplication
  }

  test("clean drops bronze only") {
    val lake = Lake(Files.createTempDirectory("graft_lake3").toString)
    Pipeline.runAll(spark, sf, lake)
    Pipeline.runClean(spark, lake)
    assert(!Storage.tableExists(spark, lake.bronze("stocks")))
    assert(Storage.tableExists(spark, lake.silver("daily_aggregates")))
  }
}
