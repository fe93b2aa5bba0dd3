package graft.tools

import org.apache.spark.sql.functions._

/** A/B harness for [[graft.operators.DedupOps.removeDuplicatedSpans]]'
  * pass-through tier (VERDICT r9 #2): times the operator with the tier on
  * vs off over corpora that vary the two axes the tier's value depends on
  * — the fraction of untouched docs (what the anti-join can skip) and the
  * doc length (what skipping one doc saves: the rebuild path posexplodes,
  * shuffles and collect_list-sorts every token of every touched doc).
  *
  * Usage: sbt "runMain graft.tools.ProfileSpan [sfDir] [runs]"
  * Prints one line per (corpus, variant) with the median seconds.
  */
object ProfileSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_span_prof")
      .toString
    val docs = graft.Tables.documents(spark, sfDir)

    // 90% of docs token-prefixed by doc_id → no gram crosses them (clean);
    // 10% verbatim (the fixture's replica structure keeps them touched)
    def mostlyClean(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(col("doc_id").cast("string"), lit("$1")))))
    // long docs: text repeated `rep`× — self-repetition does NOT touch a
    // doc (gram df counts DISTINCT docs), so cleanliness is unchanged
    // while per-doc token work scales by rep
    def longDocs(d: org.apache.spark.sql.DataFrame, rep: Int) =
      d.withColumn("text",
        concat_ws(" ", (0 until rep).map(_ => col("text")): _*))

    val corpora = Seq(
      "short_clean" -> mostlyClean(docs),
      "long10_clean" -> mostlyClean(longDocs(docs, 10)),
      "long30_clean" -> mostlyClean(longDocs(docs, 30)),
      "long30_fixture" -> longDocs(docs, 30))

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    def timed(body: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    corpora.foreach { case (name, df) =>
      val path = s"$tmp/$name"
      df.write.mode("overwrite").parquet(path)
      val corpus = spark.read.parquet(path)
      val nTok = corpus
        .select(sum(size(graft.operators.TextOps.words(col("text")))))
        .collect()(0).getLong(0)
      // interleave variants run-by-run so neither side systematically
      // pays the cold-JIT / page-cache cost
      val pt = Array.fill(runs)(0.0)
      val rb = Array.fill(runs)(0.0)
      for (i <- 0 until runs) {
        pt(i) = timed(noop(graft.operators.DedupOps
          .removeDuplicatedSpans(corpus, passThrough = true)))
        rb(i) = timed(noop(graft.operators.DedupOps
          .removeDuplicatedSpans(corpus, passThrough = false)))
      }
      println(f"[span] $name%-16s tokens=$nTok%9d " +
        f"passthrough=${median(pt.toSeq)}%6.2f s " +
        f"rebuild=${median(rb.toSeq)}%6.2f s " +
        f"ratio=${median(rb.toSeq) / median(pt.toSeq)}%5.2f")
    }
    spark.stop()
  }
}
