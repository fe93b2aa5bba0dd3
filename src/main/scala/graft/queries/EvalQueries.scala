package graft.queries

import graft.Tables
import graft.operators.EvalOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    // Multiclass per-class precision/recall/F1 (3 classes: pred =
    // pmod(score, 3) vs truth = label mod 3) — exact count ratios from
    // the 3×3 cell table, one shuffle; macro/micro averages are exact
    // compositions of these rows.
    "q_multiclass_prf" -> ((s, dir) => {
      val sc = scored(s, dir)
        .select(pmod(col("score"), lit(3)).as("pred"),
          (col("label") % 3).cast("long").as("truth"))
      val cells = sc.groupBy(col("pred"), col("truth"))
        .agg(count(lit(1)).as("n"))
      val byPred = cells.groupBy(col("pred").as("cls"))
        .agg(sum(col("n")).as("n_pred"),
          sum(when(col("pred") === col("truth"), col("n"))
            .otherwise(0L)).as("tp"))
      val byTruth = cells.groupBy(col("truth").as("cls"))
        .agg(sum(col("n")).as("n_true"))
      byPred.join(byTruth, Seq("cls"), "full")
        .select(col("cls"),
          coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          coalesce(col("n_true"), lit(0L)).as("n_true"),
          round(coalesce(col("tp"), lit(0L)).cast("double") /
            col("n_pred").cast("double"), 6).as("precision"),
          round(coalesce(col("tp"), lit(0L)).cast("double") /
            col("n_true").cast("double"), 6).as("recall"),
          round(coalesce(col("tp"), lit(0L)).cast("double") * 2.0 /
            (col("n_pred") + col("n_true")).cast("double"), 6).as("f1"))
    }),

    // Matthews correlation at the same threshold as q_confusion.
    "q_mcc" -> ((s, dir) =>
      EvalOps.mcc(scored(s, dir), "score", "y", 0L)),

    // Expected calibration error of the clamped linear probability over
    // 10 equal-width probability bins — the scalar the calibration table
    // summarizes to.
    "q_ece" -> ((s, dir) => {
      val p0 = (col("score").cast("double") + 100.0) / 201.0
      val p = least(greatest(p0, lit(1.0 / 201.0)), lit(200.0 / 201.0))
      EvalOps.expectedCalibrationError(
        scored(s, dir).withColumn("p", p), "p", "y", bins = 10)
    }),

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

    // Exact equal-frequency deciles of order value — tie-coherent
    // discretization (bin = floor(below·k/N)); all ties share a bin, so
    // the assignment is partitioning-independent where ntile is not.
    "q_quantile_bins" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      EvalOps.quantileBins(o, "cents", k = 10)
        .select(col("o_orderkey"), col("cents"), col("bin").as("decile"))
    }),

    // Cumulative-gains / lift table over score deciles: per-decile
    // positive rate vs base rate, and the captured-positives share from
    // the top decile down. Deciles come from the tie-coherent
    // quantileBins (partitioning-independent); the cumulative runs as a
    // broadcast theta self-join over the 10-row decile dimension — no
    // window at all, let alone an unpartitioned one.
    "q_gain_curve" -> ((s, dir) => {
      val binned = EvalOps.quantileBins(scored(s, dir), "score", k = 10)
      val agg = binned.groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
      val tot = agg.agg(sum(col("n")).as("nt"), sum(col("np")).as("npt"))
      val cum = agg.as("a")
        .join(broadcast(agg.select(col("bin").as("b2"), col("np").as("np2"))),
          col("b2") >= col("a.bin"), "left")
        .groupBy(col("a.bin").as("decile"), col("a.n").as("n"),
          col("a.np").as("n_pos"))
        .agg(sum(col("np2")).as("cum_pos"))
      cum.crossJoin(broadcast(tot))
        .select(col("decile"), col("n"), col("n_pos"),
          round(col("cum_pos").cast("double") / col("npt").cast("double"), 6)
            .as("capture"),
          round((col("n_pos").cast("double") / col("n").cast("double")) /
            (col("npt").cast("double") / col("nt").cast("double")), 6)
            .as("lift"))
    }),

    // Exact PR-AUC (average precision, step-wise/threshold definition) —
    // the class-imbalance-honest companion to q_auc, over the same
    // integer-quantized probe scores and the same two-level CDF stitch.
    "q_pr_auc" -> ((s, dir) =>
      EvalOps.averagePrecision(scored(s, dir), "score", "y")),

    // Brier score: mean squared error of the clamped linear probability —
    // the calibration-sensitive proper scoring rule next to q_logloss;
    // identical clamp, decimal-summed contributions.
    "q_brier" -> ((s, dir) => {
      val dec = DecimalType(38, 12)
      val p0 = (col("score").cast("double") + 100.0) / 201.0
      val p = least(greatest(p0, lit(1.0 / 201.0)), lit(200.0 / 201.0))
      val d = p - col("y").cast("double")
      scored(s, dir)
        .select((d * d).cast(dec).as("c"))
        .agg(sum(col("c")).as("cs"), count(lit(1)).as("n"))
        .select(round(col("cs").cast("double") / col("n").cast("double"), 6)
          .as("brier"), col("n"))
    }),

    // Per-label-group NDCG@10: relevance vec_id mod 3, ranked by the probe
    // score under a total order; decimal-summed log contributions.
    "q_ndcg" -> ((s, dir) =>
      EvalOps.ndcg(
        scored(s, dir).withColumn("rel", (col("vec_id") % 3).cast("int")),
        "label", "vec_id", "score", "rel", k = 10)),

    // Reciprocal-rank fusion of two per-group rankings (probe score vs
    // id recency), RRF k=60 — the rank-combination step of multi-retriever
    // search. Ranks are per-LABEL windows (bounded partitions at scale);
    // the fused score is a sum of two exact divisions, so ordering and
    // the top-5 cut are engine-identical.
    "q_rrf" -> ((s, dir) => {
      val byScore = Window.partitionBy(col("label"))
        .orderBy(col("score").desc, col("vec_id"))
      val byId = Window.partitionBy(col("label")).orderBy(col("vec_id"))
      val fused = scored(s, dir)
        .withColumn("r1", row_number().over(byScore))
        .withColumn("r2", row_number().over(byId))
        .withColumn("rrf",
          lit(1.0) / (lit(60.0) + col("r1")) +
          lit(1.0) / (lit(60.0) + col("r2")))
      val topW = Window.partitionBy(col("label"))
        .orderBy(col("rrf").desc, col("vec_id"))
      fused.withColumn("rk", row_number().over(topW))
        .filter(col("rk") <= 5)
        .select(col("label"), col("vec_id"), col("r1"), col("r2"),
          col("rrf"))
    }),

    // Feature scaling in one pass per nation: z-score from integer-cent
    // power sums (the q_outliers tree), min-max normalization from exact
    // integer extrema, and a one-hot encoding of the (closed) segment
    // vocabulary — the tabular-ML feature-prep trio.
    "q_feature_scale" -> ((s, dir) => {
      val c = round(col("c_acctbal") * 100).cast("long")
      val cd = c.cast(DecimalType(38, 0))
      val cust = Tables.customer(s, dir)
      val stats = cust.groupBy(col("c_nationkey").as("nk")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(c).cast("double").as("s1"),
        sum(cd * cd).cast("double").as("s2"),
        min(c).as("mn"), max(c).as("mx"))
      cust.join(broadcast(stats), col("c_nationkey") === col("nk"))
        .select(col("c_custkey"), col("c_nationkey"),
          round({
            val mu = col("s1") / col("n")
            val sd = sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
              (col("n") - lit(1.0)))
            (c.cast("double") - mu) / sd
          }, 6).as("z"),
          round((c - col("mn")).cast("double") /
            (col("mx") - col("mn")).cast("double"), 6).as("minmax"),
          when(col("c_mktsegment") === "AUTOMOBILE", 1).otherwise(0)
            .as("seg_auto"),
          when(col("c_mktsegment") === "BUILDING", 1).otherwise(0)
            .as("seg_bldg"),
          when(col("c_mktsegment") === "FURNITURE", 1).otherwise(0)
            .as("seg_furn"),
          when(col("c_mktsegment") === "HOUSEHOLD", 1).otherwise(0)
            .as("seg_house"),
          when(col("c_mktsegment") === "MACHINERY", 1).otherwise(0)
            .as("seg_mach"))
    }),

    // Spearman rank correlation (close vs volume per ticker) with
    // tie-averaged ranks: avg rank = min-rank + (ties−1)/2 lands on exact
    // dyadic halves, rank products on quarters — every sum term is an
    // exact multiple of 1/4 cast to DECIMAL, so the Pearson-on-ranks
    // formula is engine-identical with one final double tree per ticker.
    "q_spearman" -> ((s, dir) => {
      val dec = DecimalType(38, 2)
      val b = graft.Tables.bars(s, dir)
      def avgRank(c: Column): Column = {
        val w = Window.partitionBy(col("ticker")).orderBy(c)
        val ties = Window.partitionBy(col("ticker"), c)
        rank().over(w).cast("double") +
          (count(lit(1)).over(ties).cast("double") - 1.0) / 2.0
      }
      b.select(col("ticker"),
          avgRank(col("close")).as("rx"),
          avgRank(col("volume")).as("ry"))
        .select(col("ticker"),
          col("rx").cast(dec).as("x"), col("ry").cast(dec).as("y"),
          (col("rx") * col("ry")).cast(dec).as("xy"),
          (col("rx") * col("rx")).cast(dec).as("xx"),
          (col("ry") * col("ry")).cast(dec).as("yy"))
        .groupBy(col("ticker"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("xy")).cast("double").as("sxy"),
          sum(col("xx")).cast("double").as("sxx"),
          sum(col("yy")).cast("double").as("syy"))
        .select(col("ticker"), col("n").cast("long").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("spearman_rho"))
    }),

    // Cohen's kappa between two deterministic binary "raters" over the
    // documents (an md5 parity bit vs a length threshold) — the
    // inter-annotator-agreement kernel of a labeling pipeline. All four
    // cell counts come from ONE map-combined aggregate; po/pe/kappa are
    // exact count rationals through a shared double tree.
    "q_cohens_kappa" -> ((s, dir) => {
      val r1 = when(substring(md5(col("doc_id").cast("string")
        .cast("binary")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"),
        1L).otherwise(0L)
      val r2 = when(col("n_chars") > 500, 1L).otherwise(0L)
      Tables.documents(s, dir)
        .select(r1.as("a"), r2.as("b"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
            .as("n11"),
          sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
            .as("n10"),
          sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L))
            .as("n01"),
          sum(when(col("a") === 0 && col("b") === 0, 1L).otherwise(0L))
            .as("n00"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          round({
            val nd = col("n").cast("double")
            val po = (col("n11") + col("n00")).cast("double") / nd
            val pe = ((col("n11") + col("n10")).cast("double") / nd) *
              ((col("n11") + col("n01")).cast("double") / nd) +
              ((col("n01") + col("n00")).cast("double") / nd) *
              ((col("n10") + col("n00")).cast("double") / nd)
            (po - pe) / (lit(1.0) - pe)
          }, 6).as("kappa"))
    }),

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

    "q_quantile_bins" ->
      """WITH v AS (
        |  SELECT o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |c AS (SELECT cents, COUNT(*) AS n FROM v GROUP BY 1),
        |w AS (
        |  SELECT cents, COALESCE(SUM(n) OVER (ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM c),
        |t AS (SELECT COUNT(*) AS n_tot FROM v)
        |SELECT v.o_orderkey, v.cents,
        |  CAST(FLOOR(w.below * 10 / t.n_tot) AS BIGINT) AS decile
        |FROM v JOIN w ON w.cents = v.cents, t""".stripMargin,

    "q_multiclass_prf" ->
      s"""WITH scored AS ($scoredSql),
         |sc AS (
         |  SELECT CAST((score % 3 + 3) % 3 AS BIGINT) AS pred,
         |    CAST(label % 3 AS BIGINT) AS truth
         |  FROM scored),
         |cells AS (
         |  SELECT pred, truth, COUNT(*) AS n FROM sc GROUP BY 1, 2),
         |bp AS (
         |  SELECT pred AS cls, CAST(SUM(n) AS BIGINT) AS n_pred,
         |    CAST(SUM(CASE WHEN pred = truth THEN n ELSE 0 END) AS BIGINT)
         |      AS tp
         |  FROM cells GROUP BY 1),
         |bt AS (
         |  SELECT truth AS cls, CAST(SUM(n) AS BIGINT) AS n_true
         |  FROM cells GROUP BY 1)
         |SELECT cls, COALESCE(tp, 0) AS tp,
         |  COALESCE(n_pred, 0) AS n_pred, COALESCE(n_true, 0) AS n_true,
         |  ROUND(CAST(COALESCE(tp, 0) AS DOUBLE)
         |    / CAST(n_pred AS DOUBLE), 6) AS precision,
         |  ROUND(CAST(COALESCE(tp, 0) AS DOUBLE)
         |    / CAST(n_true AS DOUBLE), 6) AS recall,
         |  ROUND(CAST(COALESCE(tp, 0) AS DOUBLE) * 2.0
         |    / CAST(n_pred + n_true AS DOUBLE), 6) AS f1
         |FROM bp FULL JOIN bt USING (cls)""".stripMargin,

    "q_mcc" ->
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
         |  FROM scored),
         |d AS (
         |  SELECT *, SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
         |    * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)) AS den
         |  FROM c)
         |SELECT CASE WHEN den > 0.0 THEN
         |    ROUND(CAST(tp * tn - fp * fn AS DOUBLE) / den, 6) END AS mcc,
         |  tp, fp, tn, fn
         |FROM d""".stripMargin,

    "q_ece" ->
      s"""WITH scored AS ($scoredSql),
         |p AS (
         |  SELECT y, LEAST(GREATEST((CAST(score AS DOUBLE) + 100.0) / 201.0,
         |    1.0 / 201.0), 200.0 / 201.0) AS p
         |  FROM scored),
         |b AS (
         |  SELECT CAST(LEAST(FLOOR(p * 10), 9) AS BIGINT) AS bin,
         |    COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS np,
         |    SUM(CAST(p AS DECIMAL(38,12))) AS psum
         |  FROM p GROUP BY 1),
         |g AS (
         |  SELECT n, CAST(ABS(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
         |      - CAST(psum AS DOUBLE) / CAST(n AS DOUBLE))
         |    * CAST(n AS DOUBLE) AS DECIMAL(38,12)) AS gap
         |  FROM b)
         |SELECT ROUND(CAST(SUM(gap) AS DOUBLE)
         |    / CAST(SUM(n) AS DOUBLE), 6) AS ece,
         |  COUNT(*) AS n_bins, CAST(SUM(n) AS BIGINT) AS n
         |FROM g""".stripMargin,

    "q_gain_curve" ->
      s"""WITH scored AS ($scoredSql),
         |c AS (SELECT score, COUNT(*) AS cnt FROM scored GROUP BY 1),
         |w AS (
         |  SELECT score, COALESCE(SUM(cnt) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
         |  FROM c),
         |t0 AS (SELECT COUNT(*) AS n_tot FROM scored),
         |b AS (
         |  SELECT s.y, CAST(FLOOR(w.below * 10 / t0.n_tot) AS BIGINT) AS bin
         |  FROM scored s JOIN w ON w.score = s.score, t0),
         |a AS (
         |  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS np
         |  FROM b GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
         |  CAST(SUM(np) AS BIGINT) AS npt FROM a),
         |cum AS (
         |  SELECT a.bin AS decile, a.n, a.np AS n_pos,
         |    (SELECT CAST(SUM(a2.np) AS BIGINT) FROM a a2
         |     WHERE a2.bin >= a.bin) AS cum_pos
         |  FROM a)
         |SELECT decile, n, n_pos,
         |  ROUND(CAST(cum_pos AS DOUBLE) / CAST(npt AS DOUBLE), 6)
         |    AS capture,
         |  ROUND((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
         |    / (CAST(npt AS DOUBLE) / CAST(nt AS DOUBLE)), 6) AS lift
         |FROM cum, t""".stripMargin,

    "q_pr_auc" ->
      s"""WITH scored AS ($scoredSql),
         |c AS (
         |  SELECT score, SUM(y) AS pos_at, COUNT(*) - SUM(y) AS neg_at
         |  FROM scored GROUP BY score),
         |t AS (
         |  SELECT CAST(SUM(pos_at) AS BIGINT) AS n_pos,
         |    CAST(SUM(neg_at) AS BIGINT) AS n_neg FROM c),
         |w AS (
         |  SELECT score, pos_at,
         |    COALESCE(SUM(pos_at) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS pos_below,
         |    COALESCE(SUM(neg_at) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS neg_below
         |  FROM c),
         |terms AS (
         |  SELECT CAST(CAST(pos_at AS DOUBLE)
         |      * CAST(n_pos - pos_below AS DOUBLE)
         |      / CAST((n_pos - pos_below) + (n_neg - neg_below) AS DOUBLE)
         |    AS DECIMAL(38,12)) AS term, n_pos, n_neg
         |  FROM w, t)
         |SELECT ROUND(CAST(SUM(term) AS DOUBLE)
         |    / CAST(MAX(n_pos) AS DOUBLE), 6) AS pr_auc,
         |  CAST(MAX(n_pos) AS BIGINT) AS n_pos,
         |  CAST(MAX(n_neg) AS BIGINT) AS n_neg
         |FROM terms""".stripMargin,

    "q_brier" ->
      s"""WITH scored AS ($scoredSql),
         |p AS (
         |  SELECT y, LEAST(GREATEST((CAST(score AS DOUBLE) + 100.0) / 201.0,
         |    1.0 / 201.0), 200.0 / 201.0) AS p
         |  FROM scored),
         |c AS (
         |  SELECT CAST((p - CAST(y AS DOUBLE)) * (p - CAST(y AS DOUBLE))
         |    AS DECIMAL(38,12)) AS c
         |  FROM p)
         |SELECT ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |  AS brier, COUNT(*) AS n
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

    "q_rrf" ->
      s"""WITH scored AS ($scoredSql),
         |r AS (
         |  SELECT label, vec_id,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY score DESC, vec_id) AS INTEGER) AS r1,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY vec_id) AS INTEGER) AS r2
         |  FROM scored),
         |f AS (
         |  SELECT label, vec_id, r1, r2,
         |    1.0 / (60.0 + r1) + 1.0 / (60.0 + r2) AS rrf
         |  FROM r),
         |t AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
         |    ORDER BY rrf DESC, vec_id) AS rk
         |  FROM f)
         |SELECT label, vec_id, r1, r2, rrf FROM t WHERE rk <= 5""".stripMargin,

    "q_feature_scale" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |st AS (
        |  SELECT c_nationkey AS nk,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(cents) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS s2,
        |    MIN(cents) AS mn, MAX(cents) AS mx
        |  FROM c GROUP BY 1)
        |SELECT c_custkey, c_nationkey,
        |  ROUND((CAST(cents AS DOUBLE) - s1 / n) /
        |    SQRT((s2 - s1 * s1 / n) / (n - 1.0)), 6) AS z,
        |  ROUND(CAST(cents - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE), 6)
        |    AS minmax,
        |  CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS seg_auto,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS seg_bldg,
        |  CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END AS seg_furn,
        |  CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END AS seg_house,
        |  CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS seg_mach
        |FROM c JOIN st ON c_nationkey = nk""".stripMargin,

    "q_spearman" -> (graft.Tables.barsSql +
      """,
        |r AS (
        |  SELECT ticker,
        |    CAST(RANK() OVER (PARTITION BY ticker ORDER BY close)
        |      AS DOUBLE) + (CAST(COUNT(*) OVER (PARTITION BY ticker, close)
        |      AS DOUBLE) - 1.0) / 2.0 AS rx,
        |    CAST(RANK() OVER (PARTITION BY ticker ORDER BY volume)
        |      AS DOUBLE) + (CAST(COUNT(*) OVER (PARTITION BY ticker, volume)
        |      AS DOUBLE) - 1.0) / 2.0 AS ry
        |  FROM bars),
        |d AS (
        |  SELECT ticker,
        |    CAST(rx AS DECIMAL(38,2)) AS x, CAST(ry AS DECIMAL(38,2)) AS y,
        |    CAST(rx * ry AS DECIMAL(38,2)) AS xy,
        |    CAST(rx * rx AS DECIMAL(38,2)) AS xx,
        |    CAST(ry * ry AS DECIMAL(38,2)) AS yy
        |  FROM r),
        |st AS (
        |  SELECT ticker, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(xy) AS DOUBLE) AS sxy, CAST(SUM(xx) AS DOUBLE) AS sxx,
        |    CAST(SUM(yy) AS DOUBLE) AS syy
        |  FROM d GROUP BY ticker)
        |SELECT ticker, CAST(n AS BIGINT) AS n,
        |  ROUND((n * sxy - sx * sy) /
        |    SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        |    AS spearman_rho
        |FROM st""".stripMargin),

    "q_cohens_kappa" ->
      """WITH m AS (
        |  SELECT
        |    CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |      IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END AS a,
        |    CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |c AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n11,
        |    CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10,
        |    CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00
        |  FROM m)
        |SELECT n, n11, n10, n01, n00,
        |  ROUND((
        |    (CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) -
        |    ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |     (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
        |     (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |     (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)))) /
        |  (1.0 -
        |    ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |     (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
        |     (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |     (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS kappa
        |FROM c""".stripMargin,

    "q_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |      AS x
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT x, ROW_NUMBER() OVER (ORDER BY x, k) AS rn FROM spend)
        |SELECT
        |  CAST(SUM(CAST(rn AS HUGEINT) * x) AS DOUBLE) * 2.0 /
        |    (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) -
        |  CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gini,
        |  COUNT(*) AS n
        |FROM ranked""".stripMargin
  )
}
