package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) — brute-force
  * cosine top-k as the exact baseline plus an LSH-bucketed variant as the
  * scale path (builder brief).
  *
  * Scale design (100 TB): brute force is O(|queries|·|corpus|) with the
  * query side broadcast — right when |queries| is small. The LSH path
  * reduces candidate generation to a bucket equi-join (shuffle on the
  * bucket id), trading recall for a |corpus|-linear plan; IVF would slot in
  * the same way with learned centroids replacing the hyperplanes.
  *
  * Numeric determinism: dot products are accumulated left-to-right in
  * double via `aggregate` over `zip_with` — a fixed summation order — and
  * cosines are rounded to 6 decimals before any ranking or thresholding,
  * so an oracle summing in any order agrees.
  */
object SimilarityOps {

  /** cosine(a, b), rounded to 6 decimals. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)
  }

  /** Exact top-k neighbors for each query vector (self-matches excluded).
    * Queries are broadcast; ranking uses the rounded cosine with the
    * neighbor id as tiebreaker — fully deterministic. */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qe")))
    val scored = corpus.select(col(idCol).as("nid"), col(vecCol).as("ne"))
      .crossJoin(q)
      .filter(col("nid") =!= col("qid"))
      .withColumn("cosine", cosine(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cosine"), col("rn"))
  }

  /** All pairs above a cosine threshold — embedding-space near-dup
    * detection. O(n²); cap the input or use [[lshBuckets]] first. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = corpus.select(col(idCol), col(vecCol))
    e.as("a").join(e.as("b"), col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cosine", cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("cosine") >= threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component: planes are derived
    * from md5("p:i") — seedless and reproducible by any engine. Maps the
    * first 4 hex chars to [-1, 1). */
  private def planeComponent(p: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$i".getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString
    Integer.parseInt(hex, 16) / 32768.0 - 1.0
  }

  /** Random-hyperplane LSH: `planes` sign bits → bucket id in [0, 2^planes).
    * The sign uses the 6-decimal-rounded dot so engines agree at the
    * boundary. ANN search = bucket join, then exact re-rank in-bucket. */
  def lshBuckets(corpus: DataFrame, planes: Int = 8, dim: Int = 64,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucket = (0 until planes).map { p =>
      val plane = array((0 until dim).map(i => lit(planeComponent(p, i))): _*)
      val d = aggregate(zip_with(col(vecCol), plane,
        (x, w) => x.cast("double") * w), lit(0.0), (acc, v) => acc + v)
      when(round(d, 6) > 0, math.pow(2, p)).otherwise(0.0)
    }.reduce(_ + _).cast("long")
    corpus.select(col(idCol), bucket.as("bucket"))
  }

  /** ANN via LSH: candidates share the query's bucket; exact cosine re-rank
    * inside the bucket. Returns top-k per query with recall bounded by
    * bucket collision probability. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             planes: Int = 8, dim: Int = 64,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = lshBuckets(corpus, planes, dim, idCol, vecCol)
      .join(corpus, Seq(idCol))
      .select(col(idCol).as("nid"), col(vecCol).as("ne"), col("bucket"))
    val qb = lshBuckets(queries, planes, dim, idCol, vecCol)
      .join(queries, Seq(idCol))
      .select(col(idCol).as("qid"), col(vecCol).as("qe"), col("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cosine", cosine(col("qe"), col("ne")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cosine"), col("rn"))
  }
}
