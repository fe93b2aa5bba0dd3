package graft

import graft.operators.AsOfJoin
import java.sql.Date
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private lazy val quotes = Seq(
    ("A", d("2024-01-01"), 10.0), ("A", d("2024-01-05"), 11.0),
    ("A", d("2024-03-01"), 12.0), ("B", d("2024-01-03"), 20.0))
    .toDF("ticker", "date", "close")
  private lazy val marks = Seq(
    ("A", d("2024-01-01"), 1.0), ("A", d("2024-01-04"), 2.0),
    ("C", d("2024-01-01"), 9.0))
    .toDF("ticker", "mark_date", "mark")

  test("backward as-of: most recent mark ≤ date, equality matches, no mark → null") {
    val out = AsOfJoin.asOf(quotes, marks, Seq("ticker"), "date", "mark_date", Seq("mark"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      ("A", "2024-01-01", Some(1.0)),  // equality counts
      ("A", "2024-01-05", Some(2.0)),
      ("A", "2024-03-01", Some(2.0)),  // carried far forward
      ("B", "2024-01-03", None)))      // key with no marks
  }

  test("forward as-of: earliest mark ≥ date, equality matches, nothing ahead → null") {
    val out = AsOfJoin.asOfForward(quotes, marks, Seq("ticker"), "date", "mark_date", Seq("mark"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      ("A", "2024-01-01", Some(1.0)),  // equality counts
      ("A", "2024-01-05", None),       // no mark at or after
      ("A", "2024-03-01", None),
      ("B", "2024-01-03", None)))
  }

  test("nearest as-of: closer side wins, exact tie goes backward") {
    // A@01-01: backward mark same day (dist 0) → backward
    // A@01-05: backward 01-04 (1d) vs nothing forward → backward
    // A@01-03 probe added: backward 01-01 (2d) vs forward 01-04 (1d) → forward
    // A@01-02+01-06 tie fixture: marks at 01-01 & 01-04 → 01-02 is 1d/2d
    val probes = Seq(
      ("A", d("2024-01-01"), 0.0), ("A", d("2024-01-03"), 0.0),
      ("A", d("2024-01-05"), 0.0), ("B", d("2024-01-03"), 0.0))
      .toDF("ticker", "date", "close")
    val out = AsOfJoin.asOfNearest(probes, marks, Seq("ticker"),
      "date", "mark_date", Seq("mark"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (Option(r.get(r.fieldIndex("mark"))).map(_.asInstanceOf[Double]),
         Option(r.getString(r.fieldIndex("matched_dir"))))).toMap
    assert(out(("A", "2024-01-01")) === ((Some(1.0), Some("backward"))))
    assert(out(("A", "2024-01-03")) === ((Some(2.0), Some("forward")))) // 2d back vs 1d fwd
    assert(out(("A", "2024-01-05")) === ((Some(2.0), Some("backward"))))
    assert(out(("B", "2024-01-03")) === ((None, None)))
    // exact tie: probe equidistant (01-01 and 01-04 are not symmetric
    // around any date; use a dedicated pair 2 days apart)
    val tieMarks = Seq(("T", d("2024-01-01"), 1.0), ("T", d("2024-01-05"), 2.0))
      .toDF("ticker", "mark_date", "mark")
    val tieProbe = Seq(("T", d("2024-01-03"), 0.0))
      .toDF("ticker", "date", "close")
    val tie = AsOfJoin.asOfNearest(tieProbe, tieMarks, Seq("ticker"),
      "date", "mark_date", Seq("mark")).collect().head
    assert(tie.getDouble(tie.fieldIndex("mark")) === 1.0) // backward on tie
    assert(tie.getString(tie.fieldIndex("matched_dir")) === "backward")
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.asOfWithTolerance(quotes, marks, Seq("ticker"),
      "date", "mark_date", Seq("mark"), toleranceDays = 10)
      .filter($"date" === d("2024-03-01"))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("mark")))
    assert(out.isNullAt(out.fieldIndex("matched_time")))
  }

  test("native as-of operator reproduces the small-fixture semantics, both directions") {
    val back = AsOfJoin.asOfNative(quotes, marks, Seq("ticker"), "date", "mark_date", Seq("mark"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(back === Set(
      ("A", "2024-01-01", Some(1.0)),
      ("A", "2024-01-05", Some(2.0)),
      ("A", "2024-03-01", Some(2.0)),
      ("B", "2024-01-03", None)))
    val fwd = AsOfJoin.asOfNative(quotes, marks, Seq("ticker"), "date", "mark_date", Seq("mark"),
      forward = true)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(fwd === Set(
      ("A", "2024-01-01", Some(1.0)),
      ("A", "2024-01-05", None),
      ("A", "2024-03-01", None),
      ("B", "2024-01-03", None)))
  }

  test("native as-of ≡ composed as-of on the bars fixture, both directions") {
    val bars = Tables.bars(spark, sf)
    val left = bars.select($"ticker", $"date", $"close")
    val right = bars.filter(dayofmonth($"date") <= 7)
      .select($"ticker", $"date".as("rdate"), $"volume")
    val cols = Seq("ticker", "date", "close", "volume", "matched_time")
    for (fwd <- Seq(false, true)) {
      val composed =
        (if (fwd) AsOfJoin.asOfForward(left, right, Seq("ticker"), "date", "rdate", Seq("volume"))
         else AsOfJoin.asOf(left, right, Seq("ticker"), "date", "rdate", Seq("volume")))
          .select(cols.map(col): _*)
      val native = AsOfJoin.asOfNative(left, right, Seq("ticker"), "date", "rdate",
        Seq("volume"), forward = fwd).select(cols.map(col): _*)
      val a = composed.collect().map(_.toString).sorted
      val b = native.collect().map(_.toString).sorted
      assert(a.length === b.length, s"row counts differ (forward=$fwd)")
      assert(a === b, s"rows differ (forward=$fwd)")
    }
  }

  test("native as-of plans one merge operator over two exchanges") {
    // materialize the inputs so the only exchanges in the plan are the
    // operator's own (bars itself aggregates → one exchange per side)
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_native").toString
    Tables.bars(spark, sf).write.mode("overwrite").parquet(dir)
    val bars = spark.read.parquet(dir)
    val native = AsOfJoin.asOfNative(
      bars.select($"ticker", $"date", $"close"),
      bars.select($"ticker", $"date".as("rdate"), $"volume"),
      Seq("ticker"), "date", "rdate", Seq("volume"))
    native.write.format("noop").mode("overwrite").save()
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(500))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 exchanges, plan:\n${plan.take(1500)}")
  }

  test("pruning rule narrows the left scan under the native as-of join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_prune").toString
    Tables.bars(spark, sf).write.mode("overwrite").parquet(dir)
    val wide = spark.read.parquet(dir) // 8 columns
    val out = AsOfJoin.asOfNative(wide, marks, Seq("ticker"), "date", "mark_date", Seq("mark"))
      .select("ticker", "date", "mark", "matched_time")
    val plan = out.queryExecution.executedPlan.toString
    // the only parquet scan is the left side (marks is a local relation);
    // pruning must drop the five unused bar columns from its ReadSchema
    assert(!plan.contains("close"), plan.take(1200))
    assert(!plan.contains("volume"), plan.take(1200))
    assert(out.collect().length === Tables.bars(spark, sf).count())
  }

  test("custom functions are callable from SQL text") {
    GraftSession.registerFunctions(spark)
    val dot = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(dot === 32.0)
    Seq(("a", 2.0), ("a", 3.0)).toDF("k", "v").createOrReplaceTempView("pa")
    val p = spark.sql("SELECT product_agg(v) AS p FROM pa GROUP BY k")
      .collect().head.getDouble(0)
    assert(p === 6.0)
    val dl = spark.sql(
      "SELECT array_dot_long(array(1, 2, 3), array(4, 5, 6)) AS d")
      .collect().head.getLong(0)
    assert(dl === 32L)
    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .collect().head.getLong(0)
    assert(ic === 2L)
  }
}
