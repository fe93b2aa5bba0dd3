package graft.pipeline

import graft.Tables
import graft.operators.{DedupOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-stage survivor counts of one [[CurationPipeline.run]]. Monotone
  * non-increasing after `input`; `written` re-reads the output table so a
  * torn or dropped write surfaces as a count mismatch, not silence. */
case class CurationStats(input: Long, afterQuality: Long, afterExact: Long,
                         afterNearDup: Long, written: Long)

/** End-to-end corpus curation — the training-data twin of the market
  * pipeline's bronze→silver→gold ([[Pipeline.runAll]]): one CLI verb
  * (`graft.Main curate`) that composes the already-oracled stages into a
  * written, split-partitioned corpus.
  *
  * Stages (each a library op with its own oracle-checked query):
  *  1. Gopher-style quality gate + PII screen — the q_quality_filter
  *     thresholds plus n_pii = 0 (the ScaleBench curation tier's gate).
  *  2. Exact dedup, keep-first — min doc_id per whitespace/case-normal
  *     md5 fingerprint (q_dedup_exact's survivorship).
  *  3. Near-dup removal — MinHash+LSH candidates ≥ `minJaccard`,
  *     connected components, canonical (smallest-id) survivor per cluster
  *     (q_neardup_clusters).
  *  4. Deterministic split + shard assignment (q_hash_split), written
  *     partitioned by split.
  *
  * Scale shape: every stage is the query's own one-or-two-shuffle plan;
  * the composition adds NO extra pass over the text — stage outputs are
  * doc_id semi-join filters against the persisted corpus projection. The
  * stage counts are driver-side scalar aggregates, not collected rows.
  */
object CurationPipeline {

  def run(spark: SparkSession, sfDir: String, outDir: String,
          minJaccard: Double = 0.5): CurationStats =
    runOnDocs(spark, Tables.documents(spark, sfDir), outDir, minJaccard)

  /** The full crawl-to-corpus path: .warc.gz payloads → record parse →
    * response bodies → HTML visible-text extraction → language ID +
    * registered-domain source columns → the standard curation stages.
    * Chains [[graft.operators.WarcOps.decodeWarcBodies]] and
    * [[graft.operators.WebOps.htmlVisibleText]] (both per-row
    * projections) in front of [[runOnDocs]], so the only shuffles are the
    * curation stages' own. */
  def runFromWarc(spark: SparkSession,
                  warcPayloads: org.apache.spark.sql.DataFrame,
                  outDir: String,
                  minJaccard: Double = 0.5): CurationStats = {
    val docs = graft.operators.WarcOps.decodeWarcBodies(warcPayloads)
      .filter(col("rec_type") === "response")
      .select(col("doc_id"),
        graft.operators.WebOps.htmlVisibleText(col("body")).as("text"),
        col("uri"))
      .select(col("doc_id"), col("text"),
        graft.operators.WebOps.registeredDomain(col("uri")).as("source"),
        length(col("text")).as("n_chars"))
    val withLang = graft.operators.TextOps.langId(docs)
      .select(col("doc_id"), col("text"),
        col("lang_guess").as("lang"), col("source"), col("n_chars"))
    runOnDocs(spark, withLang, outDir, minJaccard)
  }

  def runOnDocs(spark: SparkSession,
                input: org.apache.spark.sql.DataFrame, outDir: String,
                minJaccard: Double = 0.5): CurationStats = {
    // every stage cache is released even on a mid-run failure (the
    // incremental-dedup finally-release doctrine)
    val tracked = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.sql.DataFrame]
    def track(df: org.apache.spark.sql.DataFrame) = {
      tracked += df.persist(StorageLevel.MEMORY_AND_DISK); df
    }
    try {
      val docs = track(input)
      val nInput = docs.count() // materialize before the gate's 3 consumers

      // 1. quality + PII gate (the inner join with the word stats also
      // drops zero-word docs, which wordStats cannot score — the
      // strictest reading of the gate). qualityMetrics and piiStats are
      // both PER-ROW projections over the same docs, so they compose into
      // ONE projection (r11): the old m ⋈ p equi-join was a whole extra
      // exchange of corpus-rows metric tuples that computed nothing the
      // composed projection doesn't (guide §2.4 "remove shuffles
      // outright"; gate plan: 3 joins → 2, one of them the unavoidable
      // word-stats aggregate).
      val mp = TextOps.piiStats(TextOps.qualityMetrics(docs))
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("punct_ratio"), col("n_pii"))
      val w = TextOps.wordStats(docs).select(col("doc_id"), col("rep_ratio"))
      val keep = mp.join(w, Seq("doc_id"))
        .filter(col("n_words") >= 10 && col("mean_word_len") >= 2 &&
          col("mean_word_len") <= 12 && col("punct_ratio") <= 0.2 &&
          col("rep_ratio") <= 0.4 && col("n_pii") === 0)
        .select(col("doc_id"))
      val q = track(docs.join(keep, Seq("doc_id"), "left_semi"))
      val afterQuality = q.count()

      // 2. exact dedup, keep-first
      val fp = q.withColumn("fp",
        md5(TextOps.normalize(col("text")).cast("binary")))
      val firsts = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      val e = track(fp.join(firsts, Seq("fp", "doc_id"), "left_semi")
        .drop("fp"))
      val afterExact = e.count()

      // 3. near-dup removal (LSH → CC → canonical survivor)
      val out = track(DedupOps.dedupNearDups(e, minJaccard)
        .filter(col("is_canonical"))
        .drop("cluster", "is_canonical")
        // 4. deterministic split/shard assignment
        .withColumn("split", TextOps.splitAssign(col("doc_id")))
        .withColumn("shard", TextOps.hashBucket(col("doc_id"), 8)))
      val afterNearDup = out.count()
      out.write.mode("overwrite").partitionBy("split").parquet(outDir)
      val written = spark.read.parquet(outDir).count()
      CurationStats(nInput, afterQuality, afterExact, afterNearDup, written)
    } finally tracked.foreach(_.unpersist(false))
  }
}
