package graft

import graft.operators.EvalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the model-evaluation operators: known closed-form values on
  * hand fixtures, brute-force cross-checks, and invariance to the
  * two-level stitch grain (bucketWidth must never change a result). */
class EvalOpsSpec extends SparkSpecBase {

  import spark.implicits._

  private def scoresDf(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("score", "y")

  test("AUC: perfect separation 1.0, reversed 0.0, single tie-group 0.5") {
    val perfect = scoresDf(Seq((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L)))
    assert(EvalOps.auc(perfect, "score", "y").head().getDouble(0) === 1.0)
    val reversed = scoresDf(Seq((1L, 1L), (2L, 1L), (10L, 0L), (11L, 0L)))
    assert(EvalOps.auc(reversed, "score", "y").head().getDouble(0) === 0.0)
    val allTied = scoresDf(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L)))
    assert(EvalOps.auc(allTied, "score", "y").head().getDouble(0) === 0.5)
  }

  test("averagePrecision: perfect 1.0, constant-score = prevalence, " +
      "stitch-grain invariant") {
    val perfect = scoresDf(Seq((10L, 1L), (9L, 1L), (8L, 1L),
      (2L, 0L), (1L, 0L)))
    assert(EvalOps.averagePrecision(perfect, "score", "y")
      .head().getDouble(0) === 1.0)
    // one tie group: single threshold, AP = precision = prevalence
    val const = scoresDf(Seq.tabulate(10)(i => (7L, if (i < 3) 1L else 0L)))
    assert(EvalOps.averagePrecision(const, "score", "y")
      .head().getDouble(0) === 0.3)
    // bucketWidth must never change the result (two-level stitch law)
    val mixed = scoresDf((0 until 100).map { i =>
      ((i * 37 % 41 - 20).toLong, (i * 17 % 3 match {
        case 0 => 1L; case _ => 0L })) })
    val at8 = EvalOps.averagePrecision(mixed, "score", "y", bucketWidth = 8)
      .head().getDouble(0)
    val at3 = EvalOps.averagePrecision(mixed, "score", "y", bucketWidth = 3)
      .head().getDouble(0)
    assert(at8 === at3 && at8 > 0.0 && at8 <= 1.0)
  }

  test("quantileBins: ties share a bin, uniform fixture bins exactly") {
    import spark.implicits._
    // 10 distinct values × 10 rows each → decile = value, for every tie
    val df = Seq.tabulate(100)(i => (i.toLong, (i / 10).toLong))
      .toDF("id", "v")
    val out = EvalOps.quantileBins(df, "v", k = 10).collect()
    assert(out.length === 100)
    assert(out.forall(r => r.getLong(2) === r.getLong(1)))
    // stitch-grain invariance
    val alt = EvalOps.quantileBins(df, "v", k = 10, bucketWidth = 3)
      .collect()
    assert(alt.map(r => (r.getLong(0), r.getLong(2))).sorted
      === out.map(r => (r.getLong(0), r.getLong(2))).sorted)
  }

  test("quantileBins survives a wide value domain (O(B²) carry tripwire)") {
    // 500k DISTINCT values → ~62.5k buckets at width 8. The retired
    // key-level theta carry would stream ~2e9 single-task pairs here
    // (the sf0.1 bench hang); the super-block stitch keeps it linear.
    // Each decile must hold exactly 50k rows.
    val df = spark.range(500000L).toDF("v")
    val byBin = EvalOps.quantileBins(df, "v", k = 10)
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBin === (0L until 10L).map(_ -> 50000L).toMap)
  }

  test("kaplanMeier: textbook fixture, censoring holds S flat, d=n → 0") {
    import spark.implicits._
    // durations 1..5, deaths at 1,2,4, censored at 3,5:
    // S = 4/5, then ·3/4 = 0.6, flat at t=3, ·1/2 = 0.3, flat at t=5
    val km = EvalOps.kaplanMeier(
      Seq((1L, 1), (2L, 1), (3L, 0), (4L, 1), (5L, 0)).toDF("t", "ev"),
      "t", "ev")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(km(1L) === ((5L, 1L, 0L, 0.8)))
    assert(km(2L) === ((4L, 1L, 0L, 0.6)))
    assert(km(3L) === ((3L, 0L, 1L, 0.6)))
    assert(km(4L) === ((2L, 1L, 0L, 0.3)))
    assert(km(5L) === ((1L, 0L, 1L, 0.3)))
    // everyone at risk dies → S exactly 0, no NaN from ln(0)
    val dead = EvalOps.kaplanMeier(
      Seq((2L, 1), (2L, 1)).toDF("t", "ev"), "t", "ev").collect()
    assert(dead.length === 1 && dead.head.getDouble(4) === 0.0)
  }

  test("logRank: symmetric cohorts score exactly 0; full separation 19.0") {
    import spark.implicits._
    // identical survival in both groups → every diff term is exactly 0
    val same = (0 until 10).flatMap(i =>
      Seq((i.toLong % 3 + 1, 1, 0), (i.toLong % 3 + 1, 1, 1)))
      .toDF("t", "ev", "grp")
    assert(EvalOps.logRank(same, "t", "ev", "grp")
      .head().getDouble(0) === 0.0)
    // group 0 all dies at t=1, group 1 at t=10:
    // diff = 5 at t=1 only, V = 10·10·10·10/(20²·19) → χ² = 25·7600/10⁴
    val split = ((1 to 10).map(_ => (1L, 1, 0)) ++
      (1 to 10).map(_ => (10L, 1, 1))).toDF("t", "ev", "grp")
    assert(EvalOps.logRank(split, "t", "ev", "grp")
      .head().getDouble(0) === 19.0)
  }

  test("MCC: perfect 1.0, inverted -1.0, degenerate margin → null") {
    val perfect = scoresDf(Seq((5L, 1L), (6L, 1L), (-5L, 0L), (-6L, 0L)))
    assert(EvalOps.mcc(perfect, "score", "y", 0L)
      .head().getDouble(0) === 1.0)
    val inverted = scoresDf(Seq((5L, 0L), (6L, 0L), (-5L, 1L), (-6L, 1L)))
    assert(EvalOps.mcc(inverted, "score", "y", 0L)
      .head().getDouble(0) === -1.0)
    val allPred = scoresDf(Seq((5L, 1L), (6L, 0L))) // tn + fn = 0
    assert(EvalOps.mcc(allPred, "score", "y", 0L).head().isNullAt(0))
  }

  test("ECE: perfectly calibrated bin scores 0; constant-p miss scores |p|") {
    import spark.implicits._
    val calibrated = Seq.tabulate(8)(i => (0.5, if (i % 2 == 0) 1L else 0L))
      .toDF("p", "y")
    assert(EvalOps.expectedCalibrationError(calibrated, "p", "y", 10)
      .head().getDouble(0) === 0.0)
    val off = Seq.fill(4)((0.25, 0L)).toDF("p", "y") // says 25%, truth 0%
    assert(EvalOps.expectedCalibrationError(off, "p", "y", 10)
      .head().getDouble(0) === 0.25)
  }

  test("AUC equals the brute-force pair statistic (ties at 1/2)") {
    // deterministic pseudo-random fixture: score from a hash-ish formula
    val rows = (0 until 200).map { i =>
      val score = (i * 37 % 101 - 50).toLong
      val y = (i * 17 % 3 match { case 0 => 1; case _ => 0 }).toLong
      (score, y)
    }
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = wins / (pos.size.toDouble * neg.size.toDouble)
    val got = EvalOps.auc(scoresDf(rows), "score", "y").head()
    assert(got.getDouble(0) === expected)
    assert(got.getLong(1) === pos.size.toLong)
    assert(got.getLong(2) === neg.size.toLong)
  }

  test("scoreCdf: bucketWidth never changes the result") {
    val rows = (0 until 300).map { i =>
      ((i * 53 % 97 - 48).toLong, (i % 4 match { case 0 => 1; case _ => 0 }).toLong)
    }
    val df = scoresDf(rows)
    val base = EvalOps.scoreCdf(df, "score", "y", 8)
      .orderBy("score").collect().toSeq
    for (bw <- Seq(1, 3, 1000)) {
      val alt = EvalOps.scoreCdf(df, "score", "y", bw)
        .orderBy("score").collect().toSeq
      assert(alt === base, s"bucketWidth=$bw diverged")
    }
  }

  test("KS: perfect separation 1.0 at the top negative score") {
    val df = scoresDf(Seq((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L)))
    val r = EvalOps.ksStat(df, "score", "y").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getLong(1) === 2L) // smallest score where the gap is maximal
  }

  test("confusion: counts and F1 on a hand fixture") {
    // threshold 5: preds = score>=5
    val df = scoresDf(Seq(
      (9L, 1L), (8L, 1L), (7L, 0L), // tp tp fp
      (1L, 1L), (0L, 0L), (2L, 0L))) // fn tn tn
    val r = EvalOps.confusion(df, "score", "y", 5L).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 2L, 1L)))
    assert(r.getDouble(4) === 2.0 / 3.0) // precision
    assert(r.getDouble(5) === 2.0 / 3.0) // recall
    assert(r.getDouble(6) === 2.0 * 2.0 / 6.0) // f1 = 2tp/(2tp+fp+fn)
  }

  test("calibration: bin membership and rates") {
    val df = scoresDf(Seq((0L, 0L), (9L, 1L), (10L, 1L), (19L, 1L)))
    val rows = EvalOps.calibration(df, "score", "y", 10)
      .orderBy("bin").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(0) === 0L && rows(0).getLong(1) === 2L)
    assert(rows(0).getDouble(4) === 0.5)
    assert(rows(1).getLong(0) === 1L && rows(1).getLong(1) === 2L)
    assert(rows(1).getDouble(4) === 1.0)
  }

  test("gini: equality -> 0, total concentration -> (n-1)/n") {
    val equal = (1 to 10).map(i => (i.toLong, 100L)).toDF("k", "v")
    val g0 = EvalOps.gini(equal, "k", "v").head().getDouble(0)
    assert(math.abs(g0) < 1e-12)
    val conc = ((1 to 9).map(i => (i.toLong, 0L)) :+ (10L, 1000L))
      .toDF("k", "v")
    val g1 = EvalOps.gini(conc, "k", "v").head().getDouble(0)
    assert(math.abs(g1 - 0.9) < 1e-12)
  }

  test("gini: bucketWidth never changes the result") {
    val df = (0 until 100).map(i => (i.toLong, (i * 31 % 57).toLong * 100))
      .toDF("k", "v")
    val base = EvalOps.gini(df, "k", "v", 1000000L).head().getDouble(0)
    for (bw <- Seq(1L, 100L, 999L))
      assert(EvalOps.gini(df, "k", "v", bw).head().getDouble(0) === base)
  }

  test("ndcg: scoring by relevance itself gives ndcg 1 in every group") {
    val df = (0 until 60).map { i =>
      val grp = i % 3
      val rel = i % 4 match { case 0 => 2; case 1 => 1; case _ => 0 }
      // score strictly increasing in rel, ties broken like the id order
      (grp, i.toLong, (rel * 1000 - i).toLong, rel)
    }.toDF("grp", "id", "score", "rel")
    val rows = EvalOps.ndcg(df, "grp", "id", "score", "rel", 10).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getDouble(3) === 1.0, s"group ${r.get(0)} ndcg != 1")
    }
  }
}
