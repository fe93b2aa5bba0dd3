package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** A/B harness for the curation quality gate (r11): the merged
  * quality+PII single projection vs the r10 two-sided m ⋈ p join, both
  * composed with the word-stats join and the semi-join back to the
  * corpus, interleaved in one warmed session so JIT and host drift hit
  * both variants equally (the ProfileSpan doctrine).
  *
  * Usage: sbt "runMain graft.tools.ProfileGate [sfDir] [runs]"
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    def timed(body: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val gate = col("n_words") >= 10 && col("mean_word_len") >= 2 &&
      col("mean_word_len") <= 12 && col("punct_ratio") <= 0.2 &&
      col("rep_ratio") <= 0.4 && col("n_pii") === 0

    def merged(): Unit = {
      val mp = TextOps.piiStats(TextOps.qualityMetrics(docs))
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("punct_ratio"), col("n_pii"))
      val w = TextOps.wordStats(docs).select(col("doc_id"), col("rep_ratio"))
      val keep = mp.join(w, Seq("doc_id")).filter(gate).select(col("doc_id"))
      noop(docs.join(keep, Seq("doc_id"), "left_semi"))
    }
    def joined(): Unit = {
      val m = TextOps.qualityMetrics(docs)
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("punct_ratio"))
      val w = TextOps.wordStats(docs).select(col("doc_id"), col("rep_ratio"))
      val p = TextOps.piiStats(docs).select(col("doc_id"), col("n_pii"))
      val keep = m.join(w, Seq("doc_id")).join(p, Seq("doc_id"))
        .filter(gate).select(col("doc_id"))
      noop(docs.join(keep, Seq("doc_id"), "left_semi"))
    }

    // warm both code paths untimed, then interleave timed runs
    merged(); joined()
    val ms = scala.collection.mutable.ArrayBuffer.empty[Double]
    val js = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to runs).foreach { _ =>
      ms += timed(merged())
      js += timed(joined())
    }
    println(f"[gate] merged median ${median(ms.toSeq)}%.2f s raw ${ms.map(v => f"$v%.2f").mkString(",")}")
    println(f"[gate] joined median ${median(js.toSeq)}%.2f s raw ${js.map(v => f"$v%.2f").mkString(",")}")
    spark.stop()
  }
}
