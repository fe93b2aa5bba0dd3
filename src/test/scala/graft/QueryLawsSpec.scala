package graft

import org.apache.spark.sql.functions._

/** Closed-form laws for the round-7 session additions — structural
  * invariants the DuckDB oracle can't state (it only proves both engines
  * agree, not that the shared semantics are the INTENDED ones). All run
  * on the sf0.001 fixtures. */
class QueryLawsSpec extends SparkSpecBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val tokenCounts = Tables.documents(spark, sf)
    .select(col("doc_id"),
      size(graft.operators.TextOps.words(col("text"))).as("n"))

  test("stride chunks tile every token with half-overlap") {
    val c = q("q_stride_chunks")
    val byDoc = c.groupBy(col("doc_id"))
      .agg(max(col("chunk_idx")).as("last_idx"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_words")).as("sum_words"))
      .join(tokenCounts, "doc_id")
    // chunk count = floor((n-1)/8)+1; windows start at multiples of 8
    val bad = byDoc.filter(
      col("n_chunks") =!= floor((col("n") - 1) / 8) + 1 ||
        col("last_idx") =!= col("n_chunks") - 1)
    assert(bad.count() === 0L)
    // coverage: starts at 0, last window reaches exactly the final token
    val lastShort = c.join(tokenCounts, "doc_id")
      .filter(col("chunk_idx") * 8 + col("n_words") =!= least(
        col("chunk_idx") * 8 + 16, col("n")))
    assert(lastShort.count() === 0L)
  }

  test("segment pairs: ceil(n/8) - 1 successor pairs per doc") {
    val got = q("q_segment_pairs").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("pairs"))
    val want = tokenCounts
      .select(col("doc_id"), (ceil(col("n") / 8.0) - 1).cast("long").as("w"))
      .filter(col("w") >= 1)
    val joined = got.join(want, Seq("doc_id"), "full_outer")
      .filter(col("pairs").isNull || col("w").isNull ||
        col("pairs") =!= col("w"))
    assert(joined.count() === 0L)
  }

  test("span corruption masks exactly every 7th token") {
    val bad = q("q_span_corrupt")
      .filter(col("n_masked") =!= floor(col("n_tokens") / 7) ||
        // corrupted text preserves token count; targets carry the masked
        size(split(col("corrupted"), " ")) =!= col("n_tokens") ||
        (col("n_masked") > 0 &&
          size(split(col("targets"), " ")) =!= col("n_masked")))
    assert(bad.count() === 0L)
    // the sentinel count equals n_masked
    val sentinel = q("q_span_corrupt")
      .filter(size(filter(split(col("corrupted"), " "),
        w => w === "<X>")) =!= col("n_masked"))
    assert(sentinel.count() === 0L)
  }

  test("bigram LM scores every adjacent pair exactly once") {
    val bad = q("q_bigram_lm").join(tokenCounts, "doc_id")
      .filter(col("n_pairs") =!= col("n") - 1)
    assert(bad.count() === 0L)
  }

  test("RFM scores stay in 1..4 and the segment is their concatenation") {
    val r = q("q_rfm")
    val bad = r.filter(
      col("r_score") < 1 || col("r_score") > 4 ||
        col("f_score") < 1 || col("f_score") > 4 ||
        col("m_score") < 1 || col("m_score") > 4 ||
        col("segment") =!= concat(col("r_score").cast("string"),
          col("f_score").cast("string"), col("m_score").cast("string")))
    assert(bad.count() === 0L)
    // quartile thresholds: strictly better recency never scores lower
    val viol = r.as("a").join(r.as("b"),
        col("a.recency_d") < col("b.recency_d") &&
          col("a.r_score") < col("b.r_score"))
    assert(viol.count() === 0L)
  }

  test("cohort LTV cumsum reconciles with its own increments") {
    val l = q("q_cohort_ltv")
    val recum = l.withColumn("recum",
      sum(col("rev_c")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_d")).orderBy(col("age_d"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    assert(recum.filter(col("recum") =!= col("cum_rev_c")).count() === 0L)
    assert(l.filter(col("age_d") < 0).count() === 0L)
  }

  test("decomp anomaly: flags bounded by days, threshold is positive") {
    val a = q("q_decomp_anomaly")
    assert(a.filter(col("n_anomalies") > col("n_days")).count() === 0L)
    assert(a.filter(col("med_abs_resid") < 0).count() === 0L)
  }
}
