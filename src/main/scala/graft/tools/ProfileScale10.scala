package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Dev profiler for the two scale10 entries BENCH r8 read as superlinear
  * (q_minhash_pairs 17.3×, dedup_incremental_delta 38× at 10× data —
  * VERDICT r8 what's-wrong #2): replays Bench's exact 10× document
  * generator, then times each entry several times with the incremental
  * path's stage instrumentation on, so a superlinear reading can be
  * attributed to a stage (or to single-shot noise).
  * Usage: sbt "runMain graft.tools.ProfileScale10 /root/testdata/sf0.1"
  */
object ProfileScale10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); val a = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_scale10").toString
    // Bench's scale10 document generator, verbatim semantics: 10 replicas,
    // doc_id offset, every token prefixed with the replica id so no
    // shingle crosses replicas (pair work scales linearly by design)
    val reps = spark.range(10).withColumnRenamed("id", "rep")
    val off = col("rep") * 10000000L
    spark.read.parquet(s"$sfDir/documents.parquet").crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + off)
      .withColumn("text", regexp_replace(col("text"), lit("(\\S+)"),
        concat(col("rep").cast("string"), lit("$1")))).drop("rep")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs10 = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[profile] docs10 rows=${docs10.count()}")

    // --- q_minhash_pairs at 1x and 10x, 3 runs each -------------------
    def runQ(d: String): Unit =
      SparkEntry_minhash(spark, d)
    def SparkEntry_minhash(s: org.apache.spark.sql.SparkSession, d: String): Unit =
      graft.SparkEntry.queries("q_minhash_pairs")(s, d)
        .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach(i => t(s"minhash_pairs_1x run$i")(runQ(sfDir)))
    (1 to 3).foreach(i => t(s"minhash_pairs_10x run$i")(runQ(dir)))

    // --- dedup index build + incremental delta at 10x, staged ---------
    def writeIdx10(path: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.block.size", (1 << 20).toString)
        .parquet(path)
    t("dedup_index_build_10x") {
      DedupOps.writeNearDupIndex(
        docs10.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        writeIdx10(s"$dir/idx/bands"), writeIdx10(s"$dir/idx/sets"))
    }
    (1 to 3).foreach { i =>
      graft.pipeline.Timing.record(true)
      t(s"dedup_incremental_delta_10x run$i") {
        DedupOps.incrementalNearDupsIndexed(
          docs10.filter(pmod(col("doc_id"), lit(10)) === 0),
          spark.read.parquet(s"$dir/idx/bands"),
          spark.read.parquet(s"$dir/idx/sets"))
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[profile]   stages: " + graft.pipeline.Timing.snapshot("dedup")
        .toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      graft.pipeline.Timing.record(false)
    }
    spark.stop()
  }
}
