package graft

import graft.functions.VectorExpressions.array_dot
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("array_dot matches the composable aggregate/zip_with form bit-for-bit") {
    val e = Tables.embeddings(spark, sf).limit(100)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val diff = e.select(
      array_dot(col("embedding"), col("embedding")).as("fast"),
      hofDot(col("embedding"), col("embedding")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff === 0)
  }

  test("array_dot resolves in SQL text via the GraftExtensions injection") {
    // registerFunctions no longer temp-registers array_dot; resolution here
    // proves the spark.sql.extensions path installed it.
    val d = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d === 11.0)
  }

  test("array_dot codegen and interpreted paths agree bit-for-bit") {
    val e = Tables.embeddings(spark, sf).limit(50)
    def run() = e.select(array_dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() === withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("array_dot_long: exact integer dot, int/long args, codegen≡eval") {
    import graft.functions.VectorExpressions.array_dot_long
    val df = Seq(
      (Seq(1, -2, 3), Seq(4L, 5L, -6L)),
      (Seq(127, -128, 0), Seq(127L, -128L, 99L))).toDF("a", "b")
    def run() = df.select(array_dot_long(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val withCodegen = run()
    assert(withCodegen === Seq(1L * 4 - 2 * 5 - 3 * 6,
      127L * 127 + 128L * 128 + 0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() === withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // matches the interpreted HOF form the operators previously used
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(hof === withCodegen)
  }

  test("optimizer rewrites the HOF dot product to the native expression") {
    val e = Tables.embeddings(spark, sf).limit(20)
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val df = e.select(col("vec_id"),
      hofDot(col("embedding"), col("embedding")).as("d"))
    val opt = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("arraydotproduct"), opt)
    assert(!opt.contains("aggregate(zip_with"), opt)
    // and the rewritten values equal a driver-side recomputation
    val rows = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).foldLeft(0.0)((a, v) => a + v * v))
      .toMap
    df.collect().foreach(r => assert(r.getDouble(1) === rows(r.getLong(0))))
  }

  test("rewritten dot product keeps exact HOF null semantics") {
    val df = Seq(
      (1L, Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),   // 11.0
      (2L, Some(Array(1.0, 2.0)), Some(Array(3.0))),        // length mismatch → null
      (3L, None, Some(Array(1.0))))                          // null input → null
      .toDF("id", "a", "b")
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    // (no plan assertion here: ConvertToLocalRelation folds this tiny local
    // input AFTER our rule ran, evaluating the rewritten strict expression —
    // the values below are therefore exactly what the rewrite produced)
    val out = df.select($"id", hofDot($"a", $"b").as("d"))
    val rows = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L) === Some(11.0))
    assert(rows(2L) === None)
    assert(rows(3L) === None)
  }

  test("array_dot handles double arrays and null inputs") {
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0, 6.0))),
      (None, Some(Array(1.0)))).toDF("a", "b")
    val rows = df.select(array_dot($"a", $"b").as("d")).collect()
    assert(rows(0).getDouble(0) === 32.0)
    assert(rows(1).isNullAt(0))
  }

  test("sorted_intersect_count: merge semantics, empties, nulls, codegen≡eval") {
    import graft.functions.SetExpressions.sorted_intersect_count
    val df = Seq(
      (1L, Some(Seq(1L, 3L, 5L, 9L)), Some(Seq(2L, 3L, 5L, 10L))), // 2
      (2L, Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),                  // 0
      (3L, Some(Seq.empty[Long]), Some(Seq(1L))),                  // 0
      (4L, Some(Seq(7L)), Some(Seq(7L))),                          // 1
      (5L, None, Some(Seq(1L))))                                   // null
      .toDF("id", "a", "b")
    val rows = df.select($"id", sorted_intersect_count($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows === Map(1L -> Some(2L), 2L -> Some(0L), 3L -> Some(0L),
      4L -> Some(1L), 5L -> None))
    // interpreted eval agrees with the codegen path exercised above
    val e = graft.functions.SortedArrayIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 3L, 5L, 9L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L, 5L, 10L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) === 2L)
  }

  test("bloom might_contain: no false negatives, prunes, codegen≡eval, " +
    "null passthrough") {
    import graft.functions.BloomExpressions.mightContain
    val keys = (1 to 400).map(i => s"bucket_$i")
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(400, 0.01)
    keys.foreach(bloom.putString)
    val df = ((1 to 400).map(i => s"bucket_$i") ++
      (1 to 4000).map(i => s"other_$i") :+ null.asInstanceOf[String])
      .toDF("k")
    def run() = df.filter(mightContain(bloom, col("k")))
      .collect().map(_.getString(0)).toSet
    val withCodegen = run()
    // every inserted key survives (bloom guarantees no false negatives)…
    assert(keys.toSet.subsetOf(withCodegen))
    // …and the 1%-fpp filter prunes essentially all of the 4000 others
    assert(withCodegen.size < 400 + 200,
      s"bloom should prune non-members: ${withCodegen.size}")
    // null keys: predicate is null → filtered, never a match
    assert(!withCodegen.contains(null))
    // interpreted path agrees exactly (same hash over UTF-8 bytes)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() === withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("jaro_winkler matches the reference-implementation cases (DuckDB-pinned)") {
    import graft.functions.StringSimilarity
    // values cross-checked against DuckDB jaro_winkler_similarity
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("", "", 0.0),                    // empty → 0, NOT 1
      ("a", "", 0.0),
      ("abc", "abc", 1.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("apple", "applesauce", 0.9),
      ("aaapppp", "p", 0.0),
      ("ab", "ba", 0.0),                // window 0: no matches
      ("abcdxxxxxx", "abcdyyyyyy", 0.6), // jaro ≤ 0.7 → NO prefix bonus
      ("aaaaaaaaaab", "aaaaaaaaaac", 0.9636363636363636), // prefix cap 4
      ("TRATE", "TRACE", 0.9066666666666667))
    cases.foreach { case (a, b, want) =>
      val got = StringSimilarity.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got === want, s"jw($a, $b)")
    }
  }

  test("jaro_winkler column: codegen and interpreted paths agree bit-for-bit") {
    import graft.functions.StringSimilarity.jaroWinklerCol
    val p = Tables.part(spark, sf).limit(80)
      .select(col("p_name").as("a"), reverse(col("p_name")).as("b"))
    def run() = p.select(jaroWinklerCol(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() === withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("PruneJaroWinkler injects the implied length guard, exact semantics") {
    import graft.functions.StringSimilarity.jaroWinklerCol
    val p = Tables.part(spark, sf).limit(200)
      .select(col("p_partkey").as("k"), col("p_name").as("a"),
        concat(col("p_name"), lit(" x")).as("b"))
    val filtered = p.filter(jaroWinklerCol(col("a"), col("b")) >= 0.9)
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(opt.contains("least(") && opt.contains("greatest("),
      s"length guard not injected:\n$opt")
    // exactness: the guard is implied, so the rule must not change results
    val wanted = p.collect().filter { r =>
      graft.functions.StringSimilarity.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)),
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(2))) >= 0.9
    }.map(_.getLong(0)).toSet
    assert(filtered.collect().map(_.getLong(0)).toSet === wanted)
    assert(wanted.nonEmpty, "fixture must keep some near-identical pairs")
    // below the 0.8 usefulness floor the bound is vacuous — no injection
    val low = p.filter(jaroWinklerCol(col("a"), col("b")) >= 0.5)
      .queryExecution.optimizedPlan.toString
    assert(!low.contains("least("), s"vacuous guard injected:\n$low")
  }

  test("bloom might_contain on long keys matches stat.bloomFilter hashing") {
    // the q_bloom_semi_join path: bloom built by DataFrameStatFunctions
    // over a bigint key, probed by the expression's mightContainLong —
    // a hashing mismatch between the two would surface as false negatives
    import graft.functions.BloomExpressions.mightContain
    val keys = spark.range(1000).toDF("k")
    val bloom = keys.stat.bloomFilter("k", 1000, 0.01)
    val kept = spark.range(100000).toDF("k")
      .filter(mightContain(bloom, col("k"))).count()
    assert(kept >= 1000, s"false negatives: only $kept of 1000 members kept")
    assert(kept < 1000 + 3000, s"bloom should prune non-members: $kept")
  }
}
