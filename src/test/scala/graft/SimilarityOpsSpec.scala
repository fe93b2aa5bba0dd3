package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Similarity-search quality gates: k-means training must not lose recall
  * vs the raw md5 seeds, and the LSH near-dup path must be a pure
  * precision-1 candidate filter over the exact baseline. */
class SimilarityOpsSpec extends SparkSpecBase {

  private lazy val e = Tables.embeddings(spark, sf)
  private lazy val q = e.filter(col("vec_id") < 10)

  private lazy val exactKnn: Set[(Long, Long)] =
    SimilarityOps.bruteForceKnn(e, q, k = 5)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def ivfRecall(iters: Int): Double = {
    val approx = SimilarityOps.ivfKnn(e, q, k = 5, kmeansIters = iters)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    approx.intersect(exactKnn).size.toDouble / exactKnn.size
  }

  test("k-means training: IVF recall vs brute force >= raw md5 seeds") {
    val seeds = ivfRecall(0)
    val trained = ivfRecall(2)
    assert(trained >= seeds, s"kmeans recall $trained < seed recall $seeds")
    assert(trained > 0.0)
  }

  test("k-means training balances the inverted lists (probe-cost bound)") {
    // the scale rationale for training: probe cost is bounded by the
    // LARGEST inverted list a query can touch, so trained centroids must
    // not be worse-balanced than the raw seeds
    def maxList(cents: Array[(Long, Seq[Double], Double)]): Long =
      SimilarityOps.ivfAssign(e, cents)
        .groupBy(col("cid")).count()
        .agg(max(col("count"))).first().getLong(0)
    val seeds = maxList(SimilarityOps.ivfCentroids(e, 16))
    val trained = maxList(SimilarityOps.kmeansCentroids(e, 16, iters = 2))
    assert(trained <= seeds, s"trained max list $trained > seeds $seeds")
  }

  test("kmeans centroids differ from seeds and keep deterministic ids") {
    val seeds = SimilarityOps.ivfCentroids(e, 16)
    val trained = SimilarityOps.kmeansCentroids(e, 16, iters = 2)
    assert(seeds.map(_._1).toSeq === trained.map(_._1).toSeq)
    // Lloyd actually moved at least one centroid off its seed vector
    assert(seeds.zip(trained).exists { case ((_, a, _), (_, b, _)) => a != b })
    // training is deterministic: a second run reproduces bit-identically
    val again = SimilarityOps.kmeansCentroids(e, 16, iters = 2)
    assert(trained.map(t => (t._1, t._2)).toSeq ===
      again.map(t => (t._1, t._2)).toSeq)
  }

  test("LSH near-dup pairs = exact pairs ∩ bucket collisions (precision 1)") {
    val exact = SimilarityOps.nearDupPairs(e, threshold = 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def lsh(tables: Int): Set[(Long, Long)] =
      SimilarityOps.lshNearDupPairs(e, threshold = 0.4, planes = 4,
        tables = tables)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = lsh(1)
    assert(one.subsetOf(exact),
      s"LSH pairs must be exact-verified: ${one.diff(exact)}")
    assert(one.nonEmpty)
    // more tables = monotonically more recall, never lost precision
    val two = lsh(2)
    assert(one.subsetOf(two), "table 1's collisions must survive the union")
    assert(two.subsetOf(exact))
    assert(two.size >= one.size)
  }
}
