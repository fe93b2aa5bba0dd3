package graft

import org.apache.spark.sql.functions._

/** Bound assertions for the one query that can't be oracle-hashed (sketch
  * internals differ across engines by design): the driver records it
  * rows-only, so the correctness argument lives here instead. Also pins
  * the BMP decode's physical-layout behaviors the formula oracle is blind
  * to (magic sniff, payload size). */
class QueryBoundsSpec extends SparkSpecBase {

  test("q_approx_distinct: HLL estimate within rsd bounds of exact") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(countDistinct(col("source")).as("nd"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (lang, (nd, n)) =>
      val (a, an) = approx(lang)
      // approx_count_distinct default rsd = 5%; 3σ + slack for tiny groups
      assert(math.abs(a - nd) <= math.max(2L, math.ceil(nd * 0.2).toLong),
        s"lang=$lang approx=$a exact=$nd")
      assert(an === n, s"exact count column must match: $lang")
    }
  }

  test("q_mm_decode: real BMP payloads sniff as BMP and decode in range") {
    import graft.operators.MultimodalOps
    val payloads = MultimodalOps.encodeBmp(
      Tables.documents(spark, sf).limit(100))
    // the metadata path must sniff the real magic: 'B''M' = 0x424D
    val magics = MultimodalOps.payloadMetadata(payloads)
      .select("magic").distinct().collect().map(_.getString(0))
    assert(magics.forall(_.startsWith("424D")), magics.mkString(","))
    val run1 = SparkEntry.queries("q_mm_decode")(spark, sf).collect()
    assert(run1.nonEmpty)
    run1.foreach { r =>
      assert(r.getInt(1) > 54, s"payload must exceed the header: $r")
      assert(r.getInt(4) === 24, s"bpp must decode as 24: $r")
      Seq(5, 6, 7).foreach(i =>
        assert(r.getInt(i) >= 0 && r.getInt(i) <= 255, s"pixel range: $r"))
      Seq(8, 9, 10).foreach(i =>
        assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 255.0, s"mean range: $r"))
    }
    // byte-for-byte deterministic across runs (no partition-order effects)
    val run2 = SparkEntry.queries("q_mm_decode")(spark, sf).collect()
    assert(run1.map(_.toString).sorted.toSeq === run2.map(_.toString).sorted.toSeq)
  }
}
