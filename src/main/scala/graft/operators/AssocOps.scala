package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket mining: frequent item pairs with apriori pruning, and
  * association metrics (support / confidence / lift) over the pair table.
  *
  * Scale doctrine (100 TB): the pair space is NEVER materialized globally.
  * The self-join fans out Σ|basket|² rows — bounded by basket size, not
  * corpus size — and the apriori prefilter removes items whose total basket
  * count is below `minPairCount` BEFORE the self-join (an item appearing in
  * fewer than k baskets cannot be in a pair appearing in k baskets), so a
  * long tail of rare items never enters the shuffle. Both the item-count agg
  * and the pair agg are map-side-combined single exchanges.
  *
  * Numerics doctrine: every count is an exact long; confidence and lift are
  * one IEEE double division / multiply chain over exact integers, rounded to
  * 6 dp — bit-identical across engines (see DomainQueries' recursion note).
  */
object AssocOps {

  /** Distinct (basket, item) pairs → frequent unordered item pairs with
    * counts. `minPairCount` is the absolute support threshold.
    */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
                    minPairCount: Long = 2L): DataFrame = {
    val b = baskets.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    // apriori prune: items in < minPairCount baskets can't form a frequent pair
    val freq = b.groupBy("item").agg(count(lit(1)).as("item_cnt"))
      .where(col("item_cnt") >= minPairCount)
    val kept = b.join(broadcast(freq.select("item")), Seq("item"))
    kept.as("l").join(kept.as("r"), col("l.basket") === col("r.basket") &&
        col("l.item") < col("r.item"))
      .groupBy(col("l.item").as("item_a"), col("r.item").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .where(col("pair_cnt") >= minPairCount)
  }

  /** Frequent pairs decorated with support, both-direction confidence and
    * lift. One broadcast of the (small, post-prune) item-count dim per side;
    * the basket total is a scalar broadcast.
    */
  def associationRules(baskets: DataFrame, basketCol: String, itemCol: String,
                       minPairCount: Long = 2L): DataFrame = {
    val b = baskets.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val nBaskets = b.agg(countDistinct(col("basket")).as("n_baskets"))
    val counts = b.groupBy("item").agg(count(lit(1)).as("cnt"))
    val pairs = frequentPairs(baskets, basketCol, itemCol, minPairCount)
    pairs
      .join(broadcast(counts.select(col("item").as("item_a"),
        col("cnt").as("cnt_a"))), Seq("item_a"))
      .join(broadcast(counts.select(col("item").as("item_b"),
        col("cnt").as("cnt_b"))), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("pair_cnt"),
        round(col("pair_cnt").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("pair_cnt").cast("double") / col("cnt_a"), 6).as("conf_ab"),
        round(col("pair_cnt").cast("double") / col("cnt_b"), 6).as("conf_ba"),
        round(col("pair_cnt").cast("double") * col("n_baskets") /
          (col("cnt_a").cast("double") * col("cnt_b")), 6).as("lift"))
  }

  /** Item-item cosine similarity from per-group occurrence counts (the
    * item-based collaborative-filtering kernel). The group×item count matrix
    * is built in one exchange; the self-join fans out |items-per-group|²
    * rows — cap item cardinality upstream if groups can carry thousands of
    * distinct items. dot is an exact long; cosine is one IEEE
    * sqrt/multiply/divide chain, rounded to 6 dp.
    */
  def cooccurrenceCosine(df: DataFrame, groupCol: String,
                         itemCol: String): DataFrame = {
    val m = df.groupBy(col(groupCol).as("grp"), col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
    val norms = m.groupBy("item").agg(sum(col("cnt") * col("cnt")).as("sq"))
    m.as("l").join(m.as("r"), col("l.grp") === col("r.grp") &&
        col("l.item") < col("r.item"))
      .groupBy(col("l.item").as("item_a"), col("r.item").as("item_b"))
      .agg(sum(col("l.cnt") * col("r.cnt")).as("dot"))
      .join(broadcast(norms.select(col("item").as("item_a"),
        col("sq").as("sq_a"))), Seq("item_a"))
      .join(broadcast(norms.select(col("item").as("item_b"),
        col("sq").as("sq_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("dot"),
        round(col("dot").cast("double") /
          (sqrt(col("sq_a").cast("double")) * sqrt(col("sq_b").cast("double"))),
          6).as("cosine"))
  }
}
