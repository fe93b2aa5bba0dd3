package graft

import graft.operators.MergeOps
import graft.pipeline.DataQuality
import org.apache.spark.sql.functions._

/** Semantics of the warehouse-operations tier (MergeOps.scd2 /
  * applyCdcLog, pipeline.DataQuality) on adversarial micro-fixtures —
  * the oracle queries pin fixture-scale agreement; these pin the edge
  * rules the fixtures may never hit. */
class WarehouseOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("scd2: compresses runs, chains validity, null transitions are changes") {
    // key 1: A A B A  -> versions A[1,3) B[3,4) A[4,null)
    // key 2: null A   -> null→A is a real change (null-safe compare)
    val log = Seq(
      (1, 1, Some("A")), (1, 2, Some("A")), (1, 3, Some("B")),
      (1, 4, Some("A")),
      (2, 1, None: Option[String]), (2, 2, Some("A"))
    ).toDF("k", "t", "attr")
    val out = MergeOps.scd2(log, Seq("k"), Seq("attr"), "t")
      .orderBy("k", "valid_from")
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getInt(0), Option(r.getString(1)),
        r.getInt(2), Option(r.get(3)), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1, Some("A"), 1, Some(3), false),
      (1, Some("B"), 3, Some(4), false),
      (1, Some("A"), 4, None, true),
      (2, None, 1, Some(2), false),
      (2, Some("A"), 2, None, true)))
  }

  test("scd2: single shuffle — both windows share one exchange") {
    val log = Seq((1, 1, "A"), (1, 2, "B")).toDF("k", "t", "attr")
    val plan = MergeOps.scd2(log, Seq("k"), Seq("attr"), "t")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("applyCdcLog: last op wins, delete removes the key") {
    val log = Seq(
      (1, 10L, "I", "v1"), (1, 20L, "U", "v2"),            // update wins
      (2, 10L, "I", "x1"), (2, 30L, "D", "x2"),            // deleted
      (3, 10L, "D", "y0"), (3, 20L, "I", "y1")             // re-inserted
    ).toDF("k", "ord", "op", "payload")
    val out = MergeOps.applyCdcLog(log, Seq("k"), "ord", "op")
      .orderBy("k").as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "v2"), (3, "y1")))
  }

  test("dataQuality: injected violations are counted by check") {
    val child = Seq(
      (Some(1), 5.0), (Some(2), -1.0), (None, 3.0), (Some(9), 0.0)
    ).toDF("fk", "amount")
    val parent = Seq(1, 2, 3).toDF("pk")
    val rows = DataQuality.report(
        DataQuality.rowChecks(child, "child", Seq(
          "null_fk" -> col("fk").isNull,
          "nonpositive_amount" -> (col("amount") <= 0.0))),
        DataQuality.orphanCheck(child, "child", "fk", parent, "pk"),
        DataQuality.dupCheck(
          Seq(1, 1, 2).toDF("pk"), "parent", Seq("pk")))
      .collect().map(r => (s"${r.getString(0)}/${r.getString(1)}",
        r.getLong(2))).toMap
    assert(rows("child/null_fk") == 1)
    assert(rows("child/nonpositive_amount") == 2)
    assert(rows("child/orphan_fk") == 1)       // fk=9; null fk not an orphan
    assert(rows("parent/dup_pk") == 1)
  }
}
