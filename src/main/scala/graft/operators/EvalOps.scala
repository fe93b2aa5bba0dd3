package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-evaluation operators (round 7): the metrics layer a training-data
  * pipeline needs to judge classifiers, rankers and score distributions —
  * exact ROC AUC (Mann-Whitney with tie handling), Kolmogorov-Smirnov
  * separation, confusion-matrix summaries, calibration tables, NDCG, and
  * the Gini coefficient of a value distribution.
  *
  * Exactness doctrine: scores are quantized to integers by the caller, so
  * every rank/cumulative/pair count is integer arithmetic (order- and
  * partitioning-independent); doubles appear only in final single-row (or
  * per-group) projections through expression trees both engines share.
  *
  * Scale doctrine: nothing here sorts the corpus globally. The cumulative
  * passes run as TWO-LEVEL running sums — a window inside each coarse
  * score bucket plus per-bucket carry-in offsets from a broadcast theta
  * self-join over the (tiny) bucket dimension (the q_cume_users
  * month-stitch pattern) — so NO window in any plan here is
  * unpartitioned.
  */
object EvalOps {

  private val D38 = DecimalType(38, 0)

  /** Per-distinct-score label counts with EXCLUSIVE cumulative counts of
    * rows strictly below each score, via the two-level pattern.
    *
    * Input: one row per observation with integer `scoreCol` and 0/1
    * `labelCol`. Output: one row per distinct score with `pos_at`,
    * `neg_at`, `pos_below`, `neg_below` (all BIGINT).
    *
    * `bucketWidth` sets the coarse stitching grain: level 1 windows are
    * partitioned by `score div bucketWidth`, level 2 runs over the bucket
    * aggregate only.
    */
  def scoreCdf(df: DataFrame, scoreCol: String, labelCol: String,
               bucketWidth: Int = 8): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val counts = df
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(sum(col(labelCol).cast("long")).as("pos_at"),
        count(lit(1)).as("tot_at"))
      .withColumn("neg_at", col("tot_at") - col("pos_at"))
      .withColumn("bkt", floor(col("score") / bucketWidth))
    // level 1: exclusive running sums inside each bucket
    val inBkt = Window.partitionBy(col("bkt")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = counts
      .withColumn("pos_loc", coalesce(sum(col("pos_at")).over(inBkt), lit(0L)))
      .withColumn("neg_loc", coalesce(sum(col("neg_at")).over(inBkt), lit(0L)))
    // level 2: per-bucket carry-ins via the shared exclusive-prefix
    // helper — see [[exclusivePrefix]] for why this is NOT a theta
    // self-join over the bucket dimension.
    val bktTotals = counts.groupBy(col("bkt").as("b"))
      .agg(sum(col("pos_at")).as("bp"), sum(col("neg_at")).as("bn"))
    val offsets = exclusivePrefix(bktTotals, "b", Seq("bp", "bn"))
      .select(col("b").as("ob"), col("bp_off").as("pos_off"),
        col("bn_off").as("neg_off"))
    // equi-join back on the bucket key; no broadcast hint — the offsets
    // side is B rows (wide-domain cases make it large), AQE picks the
    // strategy
    local.join(offsets, col("bkt") === col("ob"))
      .select(col("score"), col("pos_at"), col("neg_at"),
        (col("pos_loc") + col("pos_off")).as("pos_below"),
        (col("neg_loc") + col("neg_off")).as("neg_below"))
  }

  /** Exclusive prefix sums over an integer key dimension — the carry
    * layer under every cumulative pass here. Input: one row per key with
    * BIGINT value columns; output: one row per key with `<v>_off` = Σ of
    * each value over all strictly-lower keys.
    *
    * Shape: running sum inside super-blocks of `superWidth` keys (window
    * partitions bounded by construction) + a broadcast theta self-join
    * over the super-block dimension only. The earlier form ran the theta
    * join over the KEY dimension itself — O(B²) pairs, fine for the
    * ±hundreds-wide probe-score domains it was written for, quadratic
    * death on a wide domain (cents: B ~ 10⁵ keys ⇒ ~10¹⁰ single-task
    * pairs; q_quantile_bins hung the sf0.1 bench exactly this way). With
    * the super layer, a 10⁷-wide domain costs ≤ ~2.4k super-blocks and
    * every window stays partitioned.
    */
  private def exclusivePrefix(totals: DataFrame, keyCol: String,
                              valueCols: Seq[String],
                              superWidth: Int = 4096): DataFrame = {
    val withSb = totals.withColumn("__sb", floor(col(keyCol) / superWidth))
    val inSb = Window.partitionBy(col("__sb")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val locals = valueCols.foldLeft(withSb)((acc, v) =>
      acc.withColumn(s"__loc_$v", coalesce(sum(col(v)).over(inSb), lit(0L))))
    val sbAggs = valueCols.map(v => sum(col(v)).as(s"__t_$v"))
    val sbTotals = withSb.groupBy(col("__sb").as("__s1"))
      .agg(sbAggs.head, sbAggs.tail: _*)
    val offAggs = valueCols.map(v =>
      coalesce(sum(col(s"__t2_$v")), lit(0L)).as(s"__o_$v"))
    val sbOffsets = sbTotals.as("x")
      .join(broadcast(sbTotals.select(col("__s1").as("__s2") +:
        valueCols.map(v => col(s"__t_$v").as(s"__t2_$v")): _*)),
        col("__s2") < col("x.__s1"), "left")
      .groupBy(col("x.__s1").as("__os"))
      .agg(offAggs.head, offAggs.tail: _*)
    locals.join(broadcast(sbOffsets), col("__sb") === col("__os"))
      .select(col(keyCol) +: valueCols.map(v =>
        (col(s"__loc_$v") + col(s"__o_$v")).as(s"${v}_off")): _*)
  }

  /** Exact ROC AUC by the tie-corrected Mann-Whitney statistic:
    * U·2 = Σ_s pos_at(s)·2·neg_below(s) + Σ_s pos_at(s)·neg_at(s),
    * AUC = U·2 / (2·nPos·nNeg). Every term is integer; the one division
    * happens at the end in double. Returns a single row
    * (auc, n_pos, n_neg).
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String,
          bucketWidth: Int = 8): DataFrame =
    scoreCdf(df, scoreCol, labelCol, bucketWidth)
      .agg(
        // cast BEFORE multiplying (the rollingBeta doctrine): pos_at and
        // neg_below are LONG partial counts, and their product wraps
        // silently under ANSI-off once pos·neg passes 2^63 (~3e9 rows per
        // class) — the widening must happen on an operand, not the result
        sum(col("pos_at").cast(D38) *
          (col("neg_below").cast(D38) * 2 + col("neg_at"))).as("u2"),
        sum(col("pos_at")).as("n_pos"),
        sum(col("neg_at")).as("n_neg"))
      .select(
        (col("u2").cast("double") /
          (col("n_pos").cast("double") * col("n_neg").cast("double") * 2.0))
          .as("auc"),
        col("n_pos"), col("n_neg"))

  /** Average precision — area under the precision-recall curve by the
    * step-wise definition (thresholds at distinct scores, descending:
    * AP = Σ_s ΔR(s)·P(s) with ΔR(s) = pos_at(s)/nPos and
    * P(s) = TP(s)/(TP(s)+FP(s)), TP/FP counting score ≥ s). Ties collapse
    * into their threshold group, so no per-row ordering ambiguity exists.
    * Reuses [[scoreCdf]]'s two-level cumulative (no unpartitioned window);
    * per-threshold terms are double divisions of exact integers cast to
    * DECIMAL(38,12) so the sum is order-independent (the q_logloss
    * doctrine). Returns (pr_auc, n_pos, n_neg).
    */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String,
                       bucketWidth: Int = 8): DataFrame = {
    val dec = DecimalType(38, 12)
    val tot = df.agg(sum(col(labelCol).cast("long")).as("n_pos"),
        count(lit(1)).as("n_tot"))
      .select(col("n_pos"), (col("n_tot") - col("n_pos")).as("n_neg"))
    scoreCdf(df, scoreCol, labelCol, bucketWidth)
      .crossJoin(broadcast(tot))
      .withColumn("tp", col("n_pos") - col("pos_below"))
      .withColumn("fp", col("n_neg") - col("neg_below"))
      .withColumn("term",
        (col("pos_at").cast("double") * col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double")).cast(dec))
      .agg(sum(col("term")).as("ts"),
        max(col("n_pos")).as("np"), max(col("n_neg")).as("nn"))
      .select(
        round(col("ts").cast("double") / col("np").cast("double"), 6)
          .as("pr_auc"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }

  /** Kolmogorov-Smirnov separation between the positive and negative score
    * distributions: D = max_s |F_pos(s) − F_neg(s)| over the inclusive
    * CDFs. The max runs over the INTEGER cross-multiplied numerator
    * |cum_pos·nNeg − cum_neg·nPos| so the argmax is exact; ks_score is the
    * smallest score achieving it. Returns (ks, ks_score, n_pos, n_neg).
    */
  def ksStat(df: DataFrame, scoreCol: String, labelCol: String,
             bucketWidth: Int = 8): DataFrame = {
    val cdf = scoreCdf(df, scoreCol, labelCol, bucketWidth)
      .select(col("score"),
        (col("pos_below") + col("pos_at")).as("cum_pos"),
        (col("neg_below") + col("neg_at")).as("cum_neg"))
    val tot = cdf.agg(max(col("cum_pos")).as("n_pos"),
      max(col("cum_neg")).as("n_neg"))
    val diffs = cdf.crossJoin(broadcast(tot))
      .withColumn("dnum",
        // cast BEFORE multiplying: cum_pos·n_neg is a LONG product of two
        // per-class row counts — it wraps past 2^63 under ANSI-off; the
        // decimal widening must reach the multiply's operand
        abs(col("cum_pos").cast(D38) * col("n_neg") -
          col("cum_neg").cast(D38) * col("n_pos")))
    val best = diffs.agg(max(col("dnum")).as("dmax"))
    diffs.crossJoin(broadcast(best))
      .filter(col("dnum") === col("dmax"))
      .groupBy(col("dmax"), col("n_pos"), col("n_neg"))
      .agg(min(col("score")).as("ks_score"))
      .select(
        (col("dmax").cast("double") /
          (col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("ks"),
        col("ks_score"), col("n_pos"), col("n_neg"))
  }

  /** Confusion-matrix summary at a fixed integer threshold
    * (pred = score ≥ threshold): one map-combined aggregate, then
    * precision/recall/F1 as divisions of the exact counts. */
  def confusion(df: DataFrame, scoreCol: String, labelCol: String,
                threshold: Long): DataFrame = {
    val pred = col(scoreCol) >= threshold
    val y = col(labelCol) === 1
    df.agg(
        sum(when(pred && y, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !y, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && !y, 1L).otherwise(0L)).as("tn"),
        sum(when(!pred && y, 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        (col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .as("recall"),
        (col("tp").cast("double") * 2.0 /
          (col("tp") * 2 + col("fp") + col("fn")).cast("double")).as("f1"))
  }

  /** Exact equal-frequency quantile binning (feature discretization):
    * every row gets bin = ⌊rows_strictly_below · k / N⌋ ∈ [0, k), so all
    * ties land in ONE bin — deterministic where `ntile` is
    * ordering-ambiguous under ties (ntile splits a tie group across bins
    * by physical row order, which no distributed engine should rely on).
    * The cumulative pass is [[scoreCdf]]'s two-level stitch over DISTINCT
    * values (never a global row sort); the per-row assignment is a join
    * back on the value key — one shuffle each side at scale.
    * Returns the input columns plus `bin` (BIGINT).
    */
  def quantileBins(df: DataFrame, valueCol: String, k: Int,
                   bucketWidth: Int = 8): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val cdf = scoreCdf(df.withColumn("__zero", lit(0L)), valueCol, "__zero",
        bucketWidth)
      .select(col("score"),
        col("neg_below").as("below"),
        (col("neg_below") + col("neg_at")).as("cum"))
    val n = cdf.agg(max(col("cum")).as("n_tot"))
    val bins = cdf.crossJoin(broadcast(n))
      .select(col("score").as("__v"),
        floor(col("below") * k / col("n_tot")).as("bin"))
    df.join(bins, col(valueCol).cast("long") === col("__v"))
      .drop("__v")
  }

  /** Kaplan-Meier survival estimator with right-censoring:
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct integer durations, where
    * dᵢ = observed deaths at tᵢ, nᵢ = at-risk (not yet dead or censored).
    * The retention/lifetime curve of survival analysis, exact by
    * construction: at-risk counts come from [[exclusivePrefix]] over the
    * duration dimension (integer arithmetic, no global sort); the product
    * runs as exp(Σ ln(1 − d/n)) with per-day ln terms from identical
    * expression trees DECIMAL-summed, so the reduction is
    * order-independent. A day where everyone at risk dies (d = n) drives
    * S to exactly 0 from that day on (the ln(0) singularity is handled by
    * a saturation flag, not a NaN). Input: one row per subject with an
    * integer `durationCol` and 0/1 `eventCol` (1 = death observed,
    * 0 = right-censored). Returns (t, n_risk, d, c, s).
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val dec = DecimalType(38, 12)
    val byT = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol) === 1, 0L).otherwise(1L)).as("c"))
      .withColumn("dc", col("d") + col("c"))
    val n = byT.agg(sum(col("dc")).as("n_total"))
    val pre = exclusivePrefix(byT.select(col("t"), col("dc")), "t",
      Seq("dc"))
    val risked = byT.join(pre, Seq("t"))
      .crossJoin(broadcast(n))
      .withColumn("n_risk", col("n_total") - col("dc_off"))
      .withColumn("term",
        when(col("d") < col("n_risk"),
          log(lit(1.0) -
            col("d").cast("double") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)).cast(dec))
      .withColumn("sat", when(col("d") === col("n_risk"), 1L)
        .otherwise(0L))
    val cum = exclusivePrefix(
      risked.select(col("t"), col("term"), col("sat")), "t",
      Seq("term", "sat"))
    risked.join(cum, Seq("t"))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        when(col("sat_off") + col("sat") > 0, lit(0.0))
          .otherwise(
            round(exp((col("term_off") + col("term")).cast("double")), 6))
          .as("s"))
  }

  /** Two-group log-rank test: does group 1's survival curve differ from
    * group 0's? At each distinct duration t with d = d₀+d₁ > 0 deaths:
    * E₀ = n₀·d/n and V = n₀·n₁·d·(n−d) / (n²·(n−1)); the statistic is
    * χ² = (Σ(d₀−E₀))² / ΣV (1 dof). All products stay in exact BIGINT
    * (≤ ~10¹⁶ for 10⁴-subject groups — no overflow), divisions are
    * doubles from identical trees, and the two reductions are
    * DECIMAL-summed. At-risk counts come from one [[exclusivePrefix]]
    * pass carrying both groups. `groupCol` must be 0/1. Returns a single
    * row (chi2, sum_obs_minus_exp, n_deaths, n0, n1).
    */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
              groupCol: String): DataFrame = {
    val dec = DecimalType(38, 12)
    val byT = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        sum(when(col(groupCol) === 0 && col(eventCol) === 1, 1L)
          .otherwise(0L)).as("d0"),
        sum(when(col(groupCol) === 1 && col(eventCol) === 1, 1L)
          .otherwise(0L)).as("d1"),
        sum(when(col(groupCol) === 0, 1L).otherwise(0L)).as("a0"),
        sum(when(col(groupCol) === 1, 1L).otherwise(0L)).as("a1"))
    val tot = byT.agg(sum(col("a0")).as("nt0"), sum(col("a1")).as("nt1"))
    val pre = exclusivePrefix(byT.select(col("t"), col("a0"), col("a1")),
      "t", Seq("a0", "a1"))
    val risked = byT.join(pre, Seq("t")).crossJoin(broadcast(tot))
      .withColumn("n0", col("nt0") - col("a0_off"))
      .withColumn("n1", col("nt1") - col("a1_off"))
      .withColumn("n", col("n0") + col("n1"))
      .withColumn("d", col("d0") + col("d1"))
      .filter(col("d") > 0)
    risked
      .select(
        (col("d0").cast("double") -
          col("n0").cast("double") * col("d").cast("double") /
            col("n").cast("double")).cast(dec).as("diff"),
        when(col("n") > 1,
          (col("n0") * col("n1") * col("d") * (col("n") - col("d")))
            .cast("double") /
            (col("n") * col("n") * (col("n") - 1)).cast("double"))
          .otherwise(lit(0.0)).cast(dec).as("v"),
        col("d"), col("nt0"), col("nt1"))
      .groupBy(col("nt0"), col("nt1"))
      .agg(sum(col("diff")).as("sd"), sum(col("v")).as("sv"),
        sum(col("d")).as("n_deaths"))
      .select(
        round((col("sd").cast("double") * col("sd").cast("double")) /
          col("sv").cast("double"), 6).as("chi2"),
        round(col("sd").cast("double"), 6).as("sum_obs_minus_exp"),
        col("n_deaths"), col("nt0").as("n0"), col("nt1").as("n1"))
  }

  /** Matthews correlation coefficient at a fixed integer threshold:
    * MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN)) — the
    * balance-honest single-number summary of the confusion matrix. The
    * numerator is exact integer; the denominator is a product of doubles
    * in a fixed left-associated tree, so both engines round identically.
    * Returns (mcc, tp, fp, tn, fn); mcc is null when any marginal is 0
    * (the conventional undefined case).
    */
  def mcc(df: DataFrame, scoreCol: String, labelCol: String,
          threshold: Long): DataFrame = {
    val pred = col(scoreCol) >= threshold
    val y = col(labelCol) === 1
    df.agg(
        sum(when(pred && y, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !y, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && !y, 1L).otherwise(0L)).as("tn"),
        sum(when(!pred && y, 1L).otherwise(0L)).as("fn"))
      .withColumn("den",
        sqrt((col("tp") + col("fp")).cast("double") *
          (col("tp") + col("fn")).cast("double") *
          (col("tn") + col("fp")).cast("double") *
          (col("tn") + col("fn")).cast("double")))
      .select(
        when(col("den") > 0.0,
          round((col("tp") * col("tn") - col("fp") * col("fn"))
            .cast("double") / col("den"), 6)).as("mcc"),
        col("tp"), col("fp"), col("tn"), col("fn"))
  }

  /** Expected calibration error over fixed-width probability bins:
    * ECE = Σ_b (n_b/N)·|pos_rate_b − mean_p_b| where p is the caller's
    * probability column. Per-bin aggregates are exact (integer counts,
    * decimal p sums); the per-bin |gap| terms are cast to DECIMAL(38,12)
    * before the final sum so the reduction is order-independent. One
    * shuffle on the bin key; the bin dimension is `bins`-bounded.
    * Returns (ece, n_bins, n).
    */
  def expectedCalibrationError(df: DataFrame, probCol: String,
                               labelCol: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val dec = DecimalType(38, 12)
    val bin = least(floor(col(probCol) * bins), lit(bins - 1)).cast("long")
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("np"),
        sum(col(probCol).cast(dec)).as("psum"))
      .select(col("n"),
        (abs(col("np").cast("double") / col("n").cast("double") -
          col("psum").cast("double") / col("n").cast("double")) *
          col("n").cast("double")).cast(dec).as("gap"))
      .agg(sum(col("gap")).as("gs"), sum(col("n")).as("nt"),
        count(lit(1)).as("n_bins"))
      .select(round(col("gs").cast("double") / col("nt").cast("double"), 6)
        .as("ece"), col("n_bins"), col("nt").as("n"))
  }

  /** Calibration table: scores bucketed at `binWidth`, each bin reporting
    * its size, mean integer score and empirical positive rate — exact
    * count ratios, one shuffle on the bin key. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  binWidth: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    df.groupBy(floor(col(scoreCol) / binWidth).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"),
        sum(col(scoreCol).cast("long")).as("score_sum"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("score_sum").cast("double") / col("n").cast("double"))
          .as("mean_score"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"))
  }

  /** Gini coefficient of a non-negative integer value distribution
    * (inequality of `valueCol` across `keyCol` holders):
    * G = 2·Σ_i i·x_(i) / (n·Σx) − (n+1)/n with x ascending and ties
    * broken by `keyCol` — a total order, so the rank assignment is
    * engine-exact. Ranks come from the same two-level stitch as
    * [[scoreCdf]] (bucket window + broadcast offsets), not a global sort.
    */
  def gini(df: DataFrame, keyCol: String, valueCol: String,
           bucketWidth: Long = 1000000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val vals = df.select(col(keyCol).as("k"),
        col(valueCol).cast("long").as("x"))
      .withColumn("bkt", floor(col("x") / bucketWidth))
    val inBkt = Window.partitionBy(col("bkt"))
      .orderBy(col("x"), col("k"))
    // rank offsets via the shared carry helper — same no-unpartitioned-
    // window, no-O(B²) guarantees as scoreCdf
    val bktCounts = vals.groupBy(col("bkt").as("b"))
      .agg(count(lit(1)).as("bc"))
    val offsets = exclusivePrefix(bktCounts, "b", Seq("bc"))
      .select(col("b").as("ob"), col("bc_off").as("off"))
    vals.withColumn("rn", row_number().over(inBkt).cast("long"))
      .join(offsets, col("bkt") === col("ob"))
      // cast BEFORE multiplying: rank·x is a LONG product (rank up to n,
      // x an integer value) that wraps silently under ANSI-off — widen
      // the rank operand, not the already-wrapped product
      .select(((col("rn") + col("off")).cast(D38) * col("x")).as("rx"),
        col("x"))
      .agg(sum(col("rx")).as("s_rx"), sum(col("x").cast(D38)).as("s_x"),
        count(lit(1)).as("n"))
      .select(
        (col("s_rx").cast("double") * 2.0 /
          (col("n").cast("double") * col("s_x").cast("double")) -
          (col("n") + 1).cast("double") / col("n").cast("double")).as("gini"),
        col("n"))
  }

  /** Per-group NDCG@k: rank by (score desc, id asc) — a total order —
    * gain 2^rel − 1, discount log2(rank+1); the ideal ordering ranks by
    * (rel desc, id asc), which yields the same IDCG as any tie order.
    * Windows are partitioned by the group key (bounded frames at scale).
    * Doubles appear only in the final per-group projection, rounded to 6
    * like the repo's other log-valued queries. */
  def ndcg(df: DataFrame, groupCol: String, idCol: String, scoreCol: String,
           relCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val byScore = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val byRel = Window.partitionBy(col(groupCol))
      .orderBy(col(relCol).desc, col(idCol))
    // 2^rel − 1: exact in double for small integer relevance grades (and
    // equal to the oracle's (1 << rel) − 1 bit-shift form)
    val gain = pow(lit(2.0), col(relCol).cast("double")) - 1.0
    // per-row contributions are double (identical trees both engines) but
    // are summed as DECIMAL(38,12) so the aggregation order cannot perturb
    // the result across partitionings/engines
    val dec = DecimalType(38, 12)
    val contrib = (rn: Column) =>
      when(rn <= k, (gain / log2(rn.cast("double") + 1.0)).cast(dec))
        .otherwise(lit(0).cast(dec))
    df.select(col(groupCol).as("grp"),
        contrib(row_number().over(byScore).cast("long")).as("dg"),
        contrib(row_number().over(byRel).cast("long")).as("ig"))
      .groupBy(col("grp"))
      .agg(round(sum(col("dg")).cast("double"), 6).as("dcg"),
        round(sum(col("ig")).cast("double"), 6).as("idcg"),
        round(sum(col("dg")).cast("double") /
          sum(col("ig")).cast("double"), 6).as("ndcg"))
  }
}
