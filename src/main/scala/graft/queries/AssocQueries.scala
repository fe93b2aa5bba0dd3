package graft.queries

import graft.Tables
import graft.operators.AssocOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket association mining over the shared fixtures. Items are
  * `l_partkey % 50` so the item universe (50) is SF-invariant and pair
  * frequencies GROW with scale — the support threshold never empties the
  * result as the corpus grows (cf. reference pattern analytics: co-movement
  * screens over a fixed ticker universe). Counts are exact longs; the
  * ratio metrics are single IEEE double ops over exact ints rounded to 6 dp,
  * replayed verbatim by the DuckDB oracle.
  */
object AssocQueries {

  private def baskets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_orderkey").as("basket"), (col("l_partkey") % 50).as("item"))

  private val basketsSql =
    """b AS (
      |  SELECT DISTINCT l_orderkey AS basket, (l_partkey % 50) AS item
      |  FROM lineitem)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_assoc_rules" -> ((s, dir) =>
      AssocOps.associationRules(baskets(s, dir), "basket", "item",
        minPairCount = 3L)),

    "q_cooccur_cosine" -> ((s, dir) =>
      AssocOps.cooccurrenceCosine(
        Tables.events(s, dir).select("user_id", "event_type"),
        "user_id", "event_type")))

  def oracles: Map[String, String] = Map(
    "q_assoc_rules" ->
      s"""WITH $basketsSql,
         |freq AS (SELECT item, COUNT(*) AS cnt FROM b GROUP BY item
         |         HAVING COUNT(*) >= 3),
         |kept AS (SELECT b.basket, b.item FROM b JOIN freq USING (item)),
         |pairs AS (
         |  SELECT l.item AS item_a, r.item AS item_b, COUNT(*) AS pair_cnt
         |  FROM kept l JOIN kept r
         |    ON l.basket = r.basket AND l.item < r.item
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |n AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM b)
         |SELECT item_a, item_b, pair_cnt,
         |  ROUND(CAST(pair_cnt AS DOUBLE) / n_baskets, 6) AS support,
         |  ROUND(CAST(pair_cnt AS DOUBLE) / fa.cnt, 6) AS conf_ab,
         |  ROUND(CAST(pair_cnt AS DOUBLE) / fb.cnt, 6) AS conf_ba,
         |  ROUND(CAST(pair_cnt AS DOUBLE) * n_baskets /
         |        (CAST(fa.cnt AS DOUBLE) * fb.cnt), 6) AS lift
         |FROM pairs
         |JOIN freq fa ON fa.item = pairs.item_a
         |JOIN freq fb ON fb.item = pairs.item_b, n""".stripMargin,

    "q_cooccur_cosine" ->
      """WITH m AS (
        |  SELECT user_id AS grp, event_type AS item, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |norms AS (SELECT item, SUM(cnt * cnt) AS sq FROM m GROUP BY item),
        |dots AS (
        |  SELECT l.item AS item_a, r.item AS item_b,
        |         CAST(SUM(l.cnt * r.cnt) AS BIGINT) AS dot
        |  FROM m l JOIN m r ON l.grp = r.grp AND l.item < r.item
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, dot,
        |  ROUND(CAST(dot AS DOUBLE) /
        |        (SQRT(CAST(na.sq AS DOUBLE)) * SQRT(CAST(nb.sq AS DOUBLE))),
        |        6) AS cosine
        |FROM dots
        |JOIN norms na ON na.item = dots.item_a
        |JOIN norms nb ON nb.item = dots.item_b""".stripMargin)
}
