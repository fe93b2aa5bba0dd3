package graft.tools

import org.apache.spark.sql.functions._

/** Interleaved A/B for the r12 LSH band-bucket narrowing (md5 hex string →
  * xxhash64 long): times the full near-dup index WRITE (bands clustered by
  * bucket + sets) and the candidate self-join with each bucket form,
  * alternating within one session so host drift cancels. The old form is
  * reconstructed inline, byte-identical to pre-r12 `DedupOps.lshBands`.
  *
  * Usage: sbt "runMain graft.tools.ProfileBucket [sfDir] [runs]"
  */
object ProfileBucket {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_pb").toString

    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    def timed(body: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def writeIdx(path: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").option("compression", "zstd")
        .option("parquet.block.size", (1 << 20).toString)
        .parquet(path)

    // OLD banding (pre-r12): md5 hex bucket
    def oldLshBands(sigs: org.apache.spark.sql.DataFrame, bands: Int,
                    rowsPerBand: Int) = {
      val bandStructs = (0 until bands).map { b =>
        val parts =
          (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
        struct(lit(b).as("band"),
          md5(concat(parts: _*).cast("binary")).as("bucket"))
      }
      sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"),
          col("bb.bucket").as("bucket"))
        .filter(col("bucket").isNotNull)
    }

    def buildWith(tag: String,
                  mkBands: org.apache.spark.sql.DataFrame =>
                    org.apache.spark.sql.DataFrame): Unit = {
      val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val shr = graft.operators.DedupOps.shingleRows(docs, 3).persist(disk)
      try {
        val sigs = docs.select(col("doc_id"))
          .join(shr.groupBy(col("doc_id")).agg(
            (0 until 8).map(i =>
              min(substring(md5(concat(lit(s"${i / 4}:"), col("sh"))
                .cast("binary")), 1 + 8 * (i % 4), 8)).as(s"sig_$i")).head,
            (1 until 8).map(i =>
              min(substring(md5(concat(lit(s"${i / 4}:"), col("sh"))
                .cast("binary")), 1 + 8 * (i % 4), 8)).as(s"sig_$i")): _*),
            Seq("doc_id"), "left")
        val bandFrame = mkBands(sigs)
        writeIdx(s"$tmp/$tag/bands")(
          bandFrame.repartitionByRange(col("bucket"))
            .sortWithinPartitions("bucket"))
        writeIdx(s"$tmp/$tag/sets")(
          graft.operators.DedupOps.shingleSets(shr)
            .repartitionByRange(col("doc_id")).sortWithinPartitions("doc_id"))
      } finally shr.unpersist(false)
    }

    val cases: Seq[(String, () => Unit)] = Seq(
      "idx_old_md5" -> (() => buildWith("old", s => oldLshBands(s, 4, 2))),
      "idx_new_xx" -> (() => buildWith("new",
        s => graft.operators.DedupOps.lshBands(s, 4, 2))))

    cases.foreach { case (_, f) => f() } // warm untimed
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to runs; (name, f) <- cases) {
      val t = timed(f())
      acc(name) = acc.getOrElse(name, Nil) :+ t
    }
    for ((name, _) <- cases) {
      val xs = acc(name)
      println(f"[bucket] $name%-12s median=${median(xs)}%6.2f s  raw=" +
        xs.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    // stored index size on disk — the at-scale payload claim
    def duMb(p: String): Double = {
      val d = new java.io.File(p)
      if (!d.exists) -1
      else d.listFiles.filter(_.isFile).map(_.length).sum / 1048576.0
    }
    println(f"[bucket] bands_bytes old=${duMb(s"$tmp/old/bands")}%.2f MB " +
      f"new=${duMb(s"$tmp/new/bands")}%.2f MB")
    spark.stop()
  }
}
