package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line the driver parses into BENCH_r{N}.json.
  *
  * The driver's stdout capture keeps only the last ~2000 characters
  * (BENCH_r01.json's `tail` was exactly 2000 chars and `parsed` was null
  * because round 1 emitted all 90+ per-query timings on one ~3KB line). So:
  * only a curated HEADLINE subset is timed and emitted, values are rounded
  * to ms, and the line stays well under the capture window.
  * SPARK_GRAFT_FULL=1 times every query instead (local iteration only — the
  * full line would again overflow the driver's capture).
  */
object Bench {

  /** Representative heavy queries: flagship aggregations/joins, the window
    * machinery, each dedup/similarity family, and the medallion pipeline
    * (added separately as pipeline_full).
    */
  private val headline: Seq[String] = Seq(
    "q1_agg", "q3_shipping_priority", "q5_local_supplier",
    "q_asof_join", "q_asof_native", "q_sma", "q_vwap_signals", "q_gap_fill",
    "q_weekly_rollup", "q_hvc_daily", "q_events_sessions",
    "q_dedup_exact", "q_dedup_incremental", "q_neardup_clusters",
    "q_simhash_neardup", "q_ngram_jaccard", "q_embed_neardup_lsh",
    "q_cosine_knn", "q_ivf_knn", "q_quality_filter",
    "q_topk_per_group", "q_range_frame", "q_full_outer")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + file-index init shouldn't be billed
    // to whichever query happens to run first
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (dev iteration; driver unsets)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
      .orElse(if (sys.env.contains("SPARK_GRAFT_FULL")) None
              else Some(headline.toSet))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // median of N runs per query: single-run host timings swing 2-3×; the
    // median is stable within ~30% across bench invocations. N=3 default,
    // SPARK_GRAFT_RUNS overrides for quick local iteration.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").trim.toInt
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    var failed = List.empty[String]
    def timed(name: String)(body: => Unit): Double = {
      // every query starts from a cold cache: operators that return cached
      // results (dedup pair sets, CC labels) must not contaminate whichever
      // query runs next alphabetically (the round-2 bench artifact)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try body
      catch { case _: Throwable => if (!failed.contains(name)) failed ::= name }
      (System.nanoTime() - t0) / 1e9
    }
    val queryResults = selected.map { case (name, fn) =>
      // noop write forces every output column to materialize; a count() here
      // would let Catalyst prune unused window/projection expressions and
      // time only the scan.
      name -> median((1 to runs).map(_ => timed(name) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }))
    }
    // end-to-end medallion pipeline (bronze→silver→gold incl. indicators,
    // VWAP, pattern tables) — comparable to the reference's full-rewrite run
    val pipelineTime = median((1 to runs).map { _ =>
      val lake = graft.pipeline.Lake(
        java.nio.file.Files.createTempDirectory("graft_bench_lake").toString)
      timed("pipeline_full") { graft.pipeline.Pipeline.runAll(spark, sfDir, lake) }
    })
    val results = queryResults :+ ("pipeline_full" -> pipelineTime)
    def ms(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) =>
      // a failed query reports the -1 sentinel, not a normal-looking time
      "\"" + k + "\":" + (if (failed.contains(k)) "-1" else ms(v))
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failed.contains(k) => v }.sum
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
