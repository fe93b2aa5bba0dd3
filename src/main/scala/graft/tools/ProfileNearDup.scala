package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Dev profiler for the near-dup clustering path: times each phase with a
  * materializing action so the stage boundaries are visible.
  * Usage: sbt "runMain graft.tools.ProfileNearDup /root/testdata/sf0.1"
  */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      s"local[${GraftSession.defaultCpus}]", GraftSession.defaultCpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[profile] $name%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    t("warmup")(docs.count())
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sigs = DedupOps.minhashSignatures(docs).persist(disk)
    t("signatures")(sigs.count())
    val pairs = t("pairs+jaccard") {
      val p = DedupOps.minhashNearDups(docs).filter(col("jaccard") >= 0.3).persist(disk)
      println(s"[profile] n_pairs=${p.count()}")
      p
    }
    t("components")(DedupOps.connectedComponents(pairs).count())
    t("full-query")(DedupOps.dedupNearDups(docs, minJaccard = 0.3).count())
    spark.stop()
  }
}
