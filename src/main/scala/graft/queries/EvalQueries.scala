package graft.queries

import graft.Tables
import graft.operators.EvalOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-evaluation tier (round 7): classifier and ranker metrics over a
  * deterministic synthetic scoring task on the `embeddings` table —
  * y = label mod 2, score = an 8-term linear probe over the embedding
  * quantized to an integer (floor(s·25)), so every metric is exact integer
  * arithmetic until a final division both engines share (the [[EvalOps]]
  * doctrine). The probe weights are arbitrary fixed constants; the task
  * exists to pin METRIC semantics, not to be a good classifier.
  */
object EvalQueries {

  /** floor(25·Σ_{d=1..8} emb[d]·w_d) as a BIGINT — float→double casts are
    * exact and the sum tree is left-associated identically in the oracle. */
  private def scoreInt: Column = {
    val ws = Seq(0.9, -0.7, 0.5, -0.3, 0.8, -0.6, 0.4, -0.2)
    val s = ws.zipWithIndex.map { case (w, i) =>
      element_at(col("embedding"), i + 1).cast("double") * lit(w)
    }.reduce(_ + _)
    floor(s * 25.0).cast("long")
  }

  /** The same expression in DuckDB syntax (1-based list index). */
  private val scoreSql = {
    val ws = Seq(0.9, -0.7, 0.5, -0.3, 0.8, -0.6, 0.4, -0.2)
    val s = ws.zipWithIndex.map { case (w, i) =>
      s"CAST(embedding[${i + 1}] AS DOUBLE) * ($w)"
    }.mkString(" + ")
    s"CAST(FLOOR(($s) * 25.0) AS BIGINT)"
  }

  private def scored(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), scoreInt.as("score"),
        (col("label") % 2).cast("long").as("y"))

  private val scoredSql =
    s"""SELECT vec_id, label, $scoreSql AS score,
       |  CAST(label % 2 AS BIGINT) AS y FROM embeddings""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact tie-corrected ROC AUC (Mann-Whitney U over integer score
    // ranks; the cumulative pass is the two-level bucket stitch, no
    // global row sort).
    "q_auc" -> ((s, dir) =>
      EvalOps.auc(scored(s, dir), "score", "y")),

    // Kolmogorov-Smirnov separation + the smallest score achieving it
    // (argmax over an integer cross-multiplied numerator — exact).
    "q_ks_stat" -> ((s, dir) =>
      EvalOps.ksStat(scored(s, dir), "score", "y")),

    // Confusion matrix at threshold 0 with precision/recall/F1.
    "q_confusion" -> ((s, dir) =>
      EvalOps.confusion(scored(s, dir), "score", "y", 0L)),

    // Calibration table: 10-wide score bins, empirical positive rate per
    // bin vs the bin's mean score.
    "q_calibration" -> ((s, dir) =>
      EvalOps.calibration(scored(s, dir), "score", "y", 10)),

    // Log-loss of the affine score→probability map p=(score+100)/201
    // (clamped): per-row −[y·ln p + (1−y)·ln(1−p)] contributions are
    // doubles from identical trees, summed as DECIMAL(38,12) so the
    // aggregation order can't perturb the mean.
    "q_logloss" -> ((s, dir) => {
      val dec = DecimalType(38, 12)
      val p0 = (col("score").cast("double") + 100.0) / 201.0
      val p = least(greatest(p0, lit(1.0 / 201.0)), lit(200.0 / 201.0))
      val contrib = (when(col("y") === 1, -log(p))
        .otherwise(-log(lit(1.0) - p))).cast(dec)
      scored(s, dir)
        .select(contrib.as("c"))
        .agg(sum(col("c")).as("cs"), count(lit(1)).as("n"))
        .select(round(col("cs").cast("double") / col("n").cast("double"), 6)
          .as("logloss"), col("n"))
    }),

    // Per-label-group NDCG@10: relevance vec_id mod 3, ranked by the probe
    // score under a total order; decimal-summed log contributions.
    "q_ndcg" -> ((s, dir) =>
      EvalOps.ndcg(
        scored(s, dir).withColumn("rel", (col("vec_id") % 3).cast("int")),
        "label", "vec_id", "score", "rel", k = 10)),

    // Gini coefficient of per-customer order spend (integer cents; ranks
    // from the two-level stitch, not a global sort).
    "q_gini" -> ((s, dir) => {
      val D2 = DecimalType(18, 2)
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(D2) * 100).cast("long")
          .as("cents"))
      EvalOps.gini(spend, "o_custkey", "cents")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_auc" ->
      s"""WITH scored AS ($scoredSql),
         |c AS (
         |  SELECT score, SUM(y) AS pos_at, COUNT(*) - SUM(y) AS neg_at
         |  FROM scored GROUP BY score),
         |w AS (
         |  SELECT *, COALESCE(SUM(neg_at) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS neg_below
         |  FROM c)
         |SELECT
         |  CAST(SUM(pos_at * (2 * neg_below + neg_at)) AS DOUBLE) /
         |    (CAST(SUM(pos_at) AS DOUBLE) * CAST(SUM(neg_at) AS DOUBLE)
         |      * 2.0) AS auc,
         |  CAST(SUM(pos_at) AS BIGINT) AS n_pos,
         |  CAST(SUM(neg_at) AS BIGINT) AS n_neg
         |FROM w""".stripMargin,

    "q_ks_stat" ->
      s"""WITH scored AS ($scoredSql),
         |c AS (
         |  SELECT score, SUM(y) AS pos_at, COUNT(*) - SUM(y) AS neg_at
         |  FROM scored GROUP BY score),
         |w AS (
         |  SELECT score,
         |    SUM(pos_at) OVER (ORDER BY score) AS cum_pos,
         |    SUM(neg_at) OVER (ORDER BY score) AS cum_neg
         |  FROM c),
         |t AS (SELECT MAX(cum_pos) AS np, MAX(cum_neg) AS nn FROM w),
         |d AS (
         |  SELECT score, ABS(cum_pos * nn - cum_neg * np) AS dnum, np, nn
         |  FROM w, t),
         |m AS (SELECT MAX(dnum) AS dmax FROM d)
         |SELECT
         |  CAST(dmax AS DOUBLE) / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))
         |    AS ks,
         |  MIN(score) AS ks_score,
         |  CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
         |FROM d, m WHERE dnum = dmax GROUP BY dmax, np, nn""".stripMargin,

    "q_confusion" ->
      s"""WITH scored AS ($scoredSql),
         |c AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN score >= 0 AND y = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN score >= 0 AND y <> 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN score < 0 AND y <> 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tn,
         |    CAST(SUM(CASE WHEN score < 0 AND y = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn
         |  FROM scored)
         |SELECT tp, fp, tn, fn,
         |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
         |  CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
         |  CAST(tp AS DOUBLE) * 2.0 / CAST(tp * 2 + fp + fn AS DOUBLE) AS f1
         |FROM c""".stripMargin,

    "q_calibration" ->
      s"""WITH scored AS ($scoredSql)
         |SELECT CAST(FLOOR(score / 10) AS BIGINT) AS bin,
         |  COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
         |  CAST(SUM(score) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS mean_score,
         |  CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate
         |FROM scored GROUP BY 1""".stripMargin,

    "q_logloss" ->
      s"""WITH scored AS ($scoredSql),
         |p AS (
         |  SELECT y, LEAST(GREATEST((CAST(score AS DOUBLE) + 100.0) / 201.0,
         |    1.0 / 201.0), 200.0 / 201.0) AS p
         |  FROM scored),
         |c AS (
         |  SELECT CAST(CASE WHEN y = 1 THEN -LN(p) ELSE -LN(1.0 - p) END
         |    AS DECIMAL(38,12)) AS c
         |  FROM p)
         |SELECT ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |  AS logloss, COUNT(*) AS n
         |FROM c""".stripMargin,

    "q_ndcg" ->
      s"""WITH scored AS ($scoredSql),
         |r AS (
         |  SELECT label AS grp, CAST(vec_id % 3 AS INTEGER) AS rel,
         |    ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY score DESC, vec_id) AS rn_s,
         |    ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY vec_id % 3 DESC, vec_id) AS rn_i
         |  FROM scored),
         |c AS (
         |  SELECT grp,
         |    CASE WHEN rn_s <= 10 THEN CAST(
         |      CAST((1 << rel) - 1 AS DOUBLE) /
         |        LOG2(CAST(rn_s AS DOUBLE) + 1.0) AS DECIMAL(38,12))
         |      ELSE CAST(0 AS DECIMAL(38,12)) END AS dg,
         |    CASE WHEN rn_i <= 10 THEN CAST(
         |      CAST((1 << rel) - 1 AS DOUBLE) /
         |        LOG2(CAST(rn_i AS DOUBLE) + 1.0) AS DECIMAL(38,12))
         |      ELSE CAST(0 AS DECIMAL(38,12)) END AS ig
         |  FROM r)
         |SELECT grp, ROUND(CAST(SUM(dg) AS DOUBLE), 6) AS dcg,
         |  ROUND(CAST(SUM(ig) AS DOUBLE), 6) AS idcg,
         |  ROUND(CAST(SUM(dg) AS DOUBLE) / CAST(SUM(ig) AS DOUBLE), 6)
         |    AS ndcg
         |FROM c GROUP BY grp""".stripMargin,

    "q_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |      AS x
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT x, ROW_NUMBER() OVER (ORDER BY x, k) AS rn FROM spend)
        |SELECT
        |  CAST(SUM(rn * x) AS DOUBLE) * 2.0 /
        |    (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) -
        |  CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gini,
        |  COUNT(*) AS n
        |FROM ranked""".stripMargin
  )
}
