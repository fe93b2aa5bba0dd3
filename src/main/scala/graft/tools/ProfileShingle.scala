package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Interleaved A/B harness for the r12 shingle-path changes: the OLD
  * posexplode + window-`lead` + distinct shingle builder (reconstructed
  * inline, byte-identical to the pre-r12 `DedupOps.shingleRows`) against
  * the shipped HOF-lattice builder, measured bare, under the signature
  * aggregation (the minhash family's map stage), and under the df-cap
  * window + hashed distinct (the ngram inverted-index source). Runs
  * alternate A/B/A/B within one session so host drift hits both sides
  * equally; medians reported.
  *
  * Usage: sbt "runMain graft.tools.ProfileShingle [sfDir] [runs]"
  */
object ProfileShingle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    val n = 3

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    def timed(body: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // OLD shingleRows (pre-r12): posexplode + lead window + distinct
    def oldShingleRows(shingleN: Int) = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val words = docs.select(col("doc_id"),
        posexplode(graft.operators.TextOps.words(col("text")))
          .as(Seq("pos", "w")))
      val withLeads = (1 until shingleN).foldLeft(words)((acc, k) =>
        acc.withColumn(s"w$k", lead(col("w"), k).over(w)))
      val complete = if (shingleN == 1) withLeads
        else withLeads.filter(col(s"w${shingleN - 1}").isNotNull)
      complete
        .select(col("doc_id"),
          concat_ws(" ",
            col("w") +: (1 until shingleN).map(k => col(s"w$k")): _*).as("sh"))
        .distinct()
    }
    def newShingleRows(shingleN: Int) =
      graft.operators.DedupOps.shingleRows(docs, shingleN)

    def sigExpr(i: Int) =
      min(substring(md5(concat(lit(s"${i / 4}:"), col("sh")).cast("binary")),
        1 + 8 * (i % 4), 8)).as(s"sig_$i")
    def sigs(shr: org.apache.spark.sql.DataFrame) =
      shr.groupBy(col("doc_id")).agg(sigExpr(0), (1 until 8).map(sigExpr): _*)

    // OLD ngram candidate source: string distinct, hash AFTER, df window
    def oldNgramSource() = {
      val hashed = oldShingleRows(2)
        .select(col("doc_id"), xxhash64(col("sh")).as("shh"))
      val bySh = Window.partitionBy(col("shh"))
      hashed.withColumn("df", count(lit(1)).over(bySh))
        .filter(col("df") <= 100).drop("df")
    }
    def newNgramSource() = {
      val hashed = graft.operators.DedupOps.shingleHashRows(docs, 2)
      val bySh = Window.partitionBy(col("shh"))
      hashed.withColumn("df", count(lit(1)).over(bySh))
        .filter(col("df") <= 100).drop("df")
    }
    // lead-window builder, but xxhash64 BEFORE the distinct (codegen'd
    // gram construction + 8-byte distinct exchange)
    def leadHashRows(shingleN: Int) = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val words = docs.select(col("doc_id"),
        posexplode(graft.operators.TextOps.words(col("text")))
          .as(Seq("pos", "w")))
      val withLeads = (1 until shingleN).foldLeft(words)((acc, k) =>
        acc.withColumn(s"w$k", lead(col("w"), k).over(w)))
      val complete = if (shingleN == 1) withLeads
        else withLeads.filter(col(s"w${shingleN - 1}").isNotNull)
      complete
        .select(col("doc_id"),
          xxhash64(concat_ws(" ",
            col("w") +: (1 until shingleN).map(k => col(s"w$k")): _*))
            .as("shh"))
        .distinct()
    }
    def leadHashNgramSource() = {
      val bySh = Window.partitionBy(col("shh"))
      leadHashRows(2).withColumn("df", count(lit(1)).over(bySh))
        .filter(col("df") <= 100).drop("df")
    }

    val cases: Seq[(String, () => Unit)] = Seq(
      "old_shr_bare" -> (() => noop(oldShingleRows(3))),
      "new_shr_bare" -> (() => noop(newShingleRows(3))),
      "old_shr_sigs" -> (() => noop(sigs(oldShingleRows(3)))),
      "new_shr_sigs" -> (() => noop(sigs(newShingleRows(3)))),
      "old_ngram_src" -> (() => noop(oldNgramSource())),
      "new_ngram_src" -> (() => noop(newNgramSource())),
      "leadhash_src" -> (() => noop(leadHashNgramSource())))

    // warm both paths once untimed
    cases.foreach { case (_, f) => f() }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    for (_ <- 1 to runs; (name, f) <- cases) {
      val t = timed(f())
      acc(name) = acc.getOrElse(name, Nil) :+ t
    }
    for ((name, _) <- cases) {
      val xs = acc(name)
      println(f"[shingle] $name%-14s median=${median(xs)}%6.2f s  raw=" +
        xs.map(x => f"$x%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
