package graft

import graft.operators.{DedupOps, TextOps}
import graft.pipeline.CurationPipeline
import org.apache.spark.sql.functions._

/** End-to-end invariants of the curate verb: the written corpus must
  * actually HOLD every property the stages promise — not just report
  * counts. Each check recomputes the property from the output parquet with
  * the stage's own library op, so a silently-skipped stage fails here. */
class CurationSpec extends SparkSpecBase {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft_curated").toString
  private lazy val stats = CurationPipeline.run(spark, sf, tmp)
  private lazy val out = spark.read.parquet(tmp)

  test("stage counts are monotone and the write is complete") {
    assert(stats.input === 500)
    assert(stats.afterQuality <= stats.input)
    assert(stats.afterExact <= stats.afterQuality)
    assert(stats.afterNearDup <= stats.afterExact)
    assert(stats.written === stats.afterNearDup)
    assert(out.count() === stats.written)
    assert(stats.written > 0, "curation must not empty the corpus")
    assert(stats.afterNearDup < stats.input,
      "the fixture carries planted dups; something must be removed")
  }

  test("no exact duplicates survive") {
    val maxCopies = out
      .groupBy(md5(TextOps.normalize(col("text")).cast("binary")))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)
    assert(maxCopies === 1L)
  }

  test("no near-dup pair above the threshold survives") {
    val pairs = DedupOps.minhashNearDups(out)
      .filter(col("jaccard") >= 0.5)
    assert(pairs.count() === 0L)
  }

  test("every written doc passes the quality gate") {
    val m = TextOps.qualityMetrics(out)
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("punct_ratio"))
    val w = TextOps.wordStats(out).select(col("doc_id"), col("rep_ratio"))
    val p = TextOps.piiStats(out).select(col("doc_id"), col("n_pii"))
    val failing = m.join(w, Seq("doc_id")).join(p, Seq("doc_id"))
      .filter(!(col("n_words") >= 10 && col("mean_word_len") >= 2 &&
        col("mean_word_len") <= 12 && col("punct_ratio") <= 0.2 &&
        col("rep_ratio") <= 0.4 && col("n_pii") === 0))
    assert(failing.count() === 0L)
  }

  test("runFromWarc: crawl container to curated corpus end to end") {
    val warcTmp =
      java.nio.file.Files.createTempDirectory("graft_warc_cur").toString
    // wrap the fixture corpus in deterministic HTML pages inside real
    // .warc.gz payloads, then run the whole chain: parse → extract →
    // langId/domain → gate → dedup → write
    val pages = Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"),
        concat(lit("<html><head><style>p{color:red}</style>"),
          lit("<script>var x = 1 < 2;</script></head><body><p>"),
          col("text"), lit("</p></body></html>")).as("text"),
        col("lang"))
    val warc = graft.operators.WarcOps.encodeWarc(pages)
    val st = CurationPipeline.runFromWarc(spark, warc, warcTmp)
    assert(st.input === 200)
    assert(st.written > 0 && st.written <= st.input)
    val curated = spark.read.parquet(warcTmp)
    // extraction really ran: no page furniture survives into the corpus
    assert(curated.filter(col("text").contains("<html")).count() === 0)
    assert(curated.filter(col("text").contains("color:red")).count() === 0)
    assert(curated.filter(col("text").contains("var x")).count() === 0)
    // provenance columns derive from the WARC headers
    assert(curated.filter(col("source") =!= "example.com").count() === 0)
    assert(curated.filter(col("lang").isNull).count() === 0)
  }

  test("split and shard assignments are present, valid, and deterministic") {
    val splits = out.select(col("split")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(splits.contains("train"))
    val badShard = out.filter(col("shard") < 0 || col("shard") >= 8).count()
    assert(badShard === 0L)
    // determinism: recomputing the assignment from doc_id reproduces it
    val drift = out.filter(
      TextOps.splitAssign(col("doc_id")) =!= col("split") ||
        TextOps.hashBucket(col("doc_id"), 8) =!= col("shard")).count()
    assert(drift === 0L)
  }
}
