package graft

import graft.queries.DeclaredCatalog

/** Every canned query in the reference's Datasette catalog must run
  * unchanged over this engine's gold views — the switch-over contract. */
class DeclaredCatalogSpec extends SparkSpecBase {

  test("all 19 catalog queries run verbatim and project the declared columns") {
    assert(DeclaredCatalog.sql.size === 19)
    DeclaredCatalog.sql.keys.foreach { name =>
      withClue(s"$name: ") {
        val df = DeclaredCatalog.run(spark, sf, name)
        val n = df.count()
        assert(n >= 0)
        assert(df.columns.nonEmpty)
      }
    }
  }

  test("catalog invariants: limits respected, union compares both directions") {
    assert(DeclaredCatalog.run(spark, sf, "recent_hvcs").count() <= 100)
    assert(DeclaredCatalog.run(spark, sf, "best_patterns_all_time").count() <= 20)
    val cmp = DeclaredCatalog.run(spark, sf, "falling_vs_stairstepping").collect()
    assert(cmp.map(_.getString(0)).toSet === Set("Falling", "Rising"))
  }

  test("trending filters agree with the enrichment semantics") {
    val t = DeclaredCatalog.run(spark, sf, "trending_stairstepping_stocks")
    // every trending row's latest close is above its pattern top
    assert(t.filter(org.apache.spark.sql.functions.col("latest_close") <=
      org.apache.spark.sql.functions.col("top_price")).count() === 0)
  }
}
