package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B harness for the gram-lattice construction (r11): the shipped
  * zero-shuffle posexplode(transform(...)) form — higher-order functions
  * evaluate their lambda interpreted, per element — against a
  * posexplode(words) + lead() window form that stays in codegen but pays
  * one shuffle+sort on doc_id (the shingleRows trade, where the window
  * measured 11× faster WITH array_distinct in the loser; the lattice has
  * no distinct, so it gets its own measurement). Both produce identical
  * (doc_id, pos, h) rows — h hashes the same gram string — so the
  * df-aggregate that consumes them is byte-identical either way; it is
  * timed on top of each so the verdict includes the downstream exchange.
  *
  * Usage: sbt "runMain graft.tools.ProfileLattice [sfDir] [runs]"
  */
object ProfileLattice {
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

    val wcol = graft.operators.TextOps.words(col("text"))
    def hofLattice() = docs
      .select(col("doc_id"), wcol.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("w"), i + k)): _*))))
      .select(col("doc_id"), col("pos"), xxhash64(col("col")).as("h"))

    def leadLattice() = {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      docs.select(col("doc_id"), posexplode(wcol).as(Seq("pos", "w0")))
        .withColumn("w1", lead(col("w0"), 1).over(w))
        .withColumn("w2", lead(col("w0"), 2).over(w))
        .filter(col("w2").isNotNull)
        .select(col("doc_id"), col("pos"),
          xxhash64(concat_ws(" ", col("w0"), col("w1"), col("w2"))).as("h"))
    }

    def dfAgg(l: org.apache.spark.sql.DataFrame) = l.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))

    // parity check first: identical row multisets
    val a = hofLattice(); val b = leadLattice()
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "lattice variants disagree")

    noop(hofLattice()); noop(leadLattice()) // untimed warm-up
    val variants = Seq(
      "hof_lattice" -> (() => noop(hofLattice())),
      "lead_lattice" -> (() => noop(leadLattice())),
      "hof_dfagg" -> (() => noop(dfAgg(hofLattice()))),
      "lead_dfagg" -> (() => noop(dfAgg(leadLattice()))))
    val acc = variants.map { case (nm, _) =>
      nm -> scala.collection.mutable.ArrayBuffer.empty[Double] }.toMap
    (1 to runs).foreach { _ =>
      variants.foreach { case (nm, f) => acc(nm) += timed(f()) }
    }
    variants.foreach { case (nm, _) =>
      val xs = acc(nm).toSeq
      println(f"[lattice] $nm%-13s median ${median(xs)}%.2f s raw ${xs.map(v => f"$v%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
