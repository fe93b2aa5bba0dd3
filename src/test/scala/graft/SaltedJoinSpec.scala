package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join ≡ plain join on a skewed key distribution") {
    // 90% of fact rows share one key — the classic hot-key shape
    val fact = (1 to 10000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong)).toDF("k", "id")
    val dim = Seq(("HOT", "hot_val"), ("k0", "v0"), ("k3", "v3"))
      .toDF("k", "v")
    val plain = fact.join(dim, Seq("k")).select("k", "id", "v")
    val salted = GraftFunctions.saltedJoin(fact, dim, Seq("k"), 8, $"id")
      .select("k", "id", "v")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("salt spreads the hot key across partitions") {
    val fact = (1 to 1000).map(i => ("HOT", i.toLong)).toDF("k", "id")
    val nDistinctSalts = fact
      .withColumn("_salt", pmod(hash($"id"), lit(8)))
      .select("_salt").distinct().count()
    assert(nDistinctSalts === 8)
  }
}
