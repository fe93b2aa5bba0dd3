package graft

import graft.pipeline.{Lake, Pipeline, Validation}

/** CLI entry points mirroring the reference's pipeline stages
  * (`pyproject.toml:20-25`: bronze / silver / gold / validate / clean).
  *
  * Usage: runMain graft.Main <stage> <lakeRoot> [sfDir]
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1,
      "usage: graft.Main <bronze|silver|gold|all|validate|clean> [lakeRoot] [sfDir]")
    val config = GraftConfig.fromEnv()
    val stage = args(0)
    val lake = Lake(if (args.length > 1) args(1) else config.lakeRoot)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = GraftSession.get()
    try stage match {
      // live REST ingest (S6-S8): HTTP client when GRAFT_API_BASE_URL +
      // GRAFT_API_KEY are set, deterministic fixture source otherwise
      case "ingest" =>
        val tickers = (0 until 10).map(i => s"T$i")
        val source = graft.sources.HttpMarketSource.barsSourceFromEnv(tickers)
        val startYear = sys.env.getOrElse("GRAFT_INGEST_START_YEAR", "2024").toInt
        val today = sys.env.get("GRAFT_INGEST_TODAY")
          .map(java.time.LocalDate.parse)
          .getOrElse(java.time.LocalDate.now())
        val (days, hitLimit) = Pipeline.runIngest(spark, source, lake, startYear, today)
        println(s"ingest: days=$days hitLimit=$hitLimit")
      case "bronze"   => Pipeline.runBronze(spark, sfDir, lake)
      case "silver"   => Pipeline.runSilver(spark, lake)
      case "gold"     => Pipeline.runGold(spark, lake)
      case "all"      => Pipeline.runAll(spark, sfDir, lake)
      case "validate" =>
        val r = Validation.validateSplits(spark, lake)
        println(s"validate: checked=${r.checked} mismatches=${r.mismatches} " +
          f"maxAbsError=${r.maxAbsError}%.6f ${if (r.ok) "OK" else "FAILED"}")
        if (!r.ok) sys.exit(1)
      case "clean"    => Pipeline.runClean(spark, lake)
      // training-corpus curation: quality gate → exact dedup → near-dup
      // removal → split/shard assignment, written under <lakeRoot>/curated
      case "curate"   =>
        val st = graft.pipeline.CurationPipeline.run(
          spark, sfDir, s"${lake.root}/curated")
        println(s"curate: input=${st.input} quality=${st.afterQuality} " +
          s"exact=${st.afterExact} neardup=${st.afterNearDup} " +
          s"written=${st.written} -> ${lake.root}/curated")
      // Datasette-style publishing (reference metadata.json surface):
      // SQLite-loadable dump + query metadata under <lakeRoot>/publish
      case "publish"  =>
        val counts = graft.publish.Publisher.publish(
          spark, sfDir, s"${lake.root}/publish")
        println(s"publish: tables=${counts.size} rows=${counts.values.sum} " +
          s"-> ${lake.root}/publish")
      case other      => throw new IllegalArgumentException(s"unknown stage: $other")
    } finally spark.stop()
  }
}
