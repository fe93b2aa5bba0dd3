package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TPC-H completion tier (round 7): the canonical decision-support suite,
  * adapted to the fixture schema and completing the q1/q3/q5/q10 quartet in
  * [[RelationalQueries]]. The fixtures carry no `partsupp` table and no
  * `l_commitdate`/`l_receiptdate`/`l_shipmode` columns, so:
  *
  *  - Q2/Q11/Q16/Q20's supplier-part relation is derived from `lineitem`
  *    (the pairs that actually traded), with `l_extendedprice/l_quantity`
  *    as the unit-price stand-in for `ps_supplycost`;
  *  - Q4's "committed late" predicate becomes "shipped more than 60 days
  *    after the order date" — the same EXISTS-correlated shape;
  *  - Q12's shipmode classes become ship-LATENCY classes (days from order
  *    to ship, bucketed FAST/NORMAL/SLOW) — the same join + CASE-count
  *    shape over a column the schema does carry;
  *  - Q21's "kept orders waiting" keeps the EXISTS/NOT-EXISTS semantics
  *    ("late" = shipped >90 days after the order date, status F, another
  *    supplier present, no other supplier late) but decorrelates both
  *    subqueries into ONE per-(order, supplier) rollup — two fact
  *    shuffles on the same orderkey vs the canonical triple self-join;
  *  - Q20's availqty condition becomes supply dominance: suppliers who
  *    shipped >50% of a part's 1996 volume (nested agg + join-back);
  *  - Q22's "7 years without an order" becomes "no order since 2000-01-01"
  *    (the fixture's order horizon ends 2001-08), grouped by nation in
  *    place of the phone prefix the schema lacks.
  *
  * Everything else follows the repo's exactness doctrine
  * (RelationalQueries header): money in DECIMAL through every sum, doubles
  * only in final projections via identical expression trees, and a unique
  * total order wherever LIMIT appears.
  *
  * Scale notes (the 100 TB shape): every query is one fact shuffle at most
  * — dims (`part`, `supplier`, `nation`, `region`, filtered `customer`)
  * broadcast; Q13/Q15/Q17/Q18's per-key aggregates shuffle on their
  * natural keys; the scalar thresholds (Q11's total, Q14/Q17/Q19/Q22's
  * single-row aggregates) broadcast back rather than re-scanning.
  */
object TpchQueries {

  private val D2 = DecimalType(18, 2)
  private val D4 = DecimalType(38, 4)

  /** sum(l_extendedprice * (1 - l_discount)) in exact decimals → double. */
  private def revenueSum =
    sum(col("l_extendedprice").cast(D2) *
      (lit(1).cast(D2) - col("l_discount").cast(D2)))
      .cast(D4).cast("double")

  private def ts(d: String) = lit(d).cast("timestamp")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2 shape — min-cost supplier per part: the correlated-MIN subquery,
    // decorrelated as (offers ⋈ per-part min) with an exact-double price
    // equality (both engines compute the identical division), supplier
    // ties broken by min s_suppkey.
    "q2_min_price_supplier" -> ((s, dir) => {
      val euro = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"))
      val parts = Tables.part(s, dir)
        // size BAND rather than the canonical exact 15: the sf0.001
        // fixture has no size-15 LARGE part, and an all-scale-non-empty
        // result is part of the contract (RelationalQueriesSpec)
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_name"))
      val offers = Tables.lineitem(s, dir)
        .join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("price"))
      val best = offers.groupBy(col("p_partkey").as("bp"))
        .agg(min(col("price")).as("best_price"))
      offers
        .join(broadcast(best),
          col("p_partkey") === col("bp") && col("price") === col("best_price"))
        .groupBy(col("p_partkey"), col("p_name"), col("best_price"))
        .agg(min(col("s_suppkey")).as("s_suppkey"))
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"))), Seq("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("best_price"),
          col("s_suppkey"), col("s_name"))
    }),

    // Q4 shape — order-priority checking: EXISTS-correlated semi-join
    // (orders having any lineitem shipped >60 days after the order date).
    "q4_order_priority" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") < ts("1996-04-01"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            to_date(col("l_shipdate")) >
              date_add(to_date(col("o_orderdate")), 60), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q6 — forecasting revenue change: pure scan-side predicates (all three
    // reach the parquet scan), one map-combined global sum.
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1997-01-01") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24.0)
        .agg(sum(col("l_extendedprice").cast(D2) * col("l_discount").cast(D2))
          .cast(D4).cast("double").as("revenue"))),

    // Q7 — volume shipping between two nations (both directions), yearly.
    "q7_volume_shipping" -> ((s, dir) => {
      val supN = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cusN = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cusN), col("o_custkey") === col("c_custkey"))
        .filter(
          (col("supp_nation") === "NATION_13" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_13"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revenueSum.as("revenue"))
    }),

    // Q8 — national market share inside a region's market: two decimal
    // sums (nation's volume, total volume) per year, divided once at the
    // end in double — the numerator CASE keeps decimal exactness.
    "q8_market_share" -> ((s, dir) => {
      val promo = Tables.part(s, dir).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val asiaCust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val supN = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val vol = (col("l_extendedprice").cast(D2) *
        (lit(1).cast(D2) - col("l_discount").cast(D2))).cast(D4)
      Tables.lineitem(s, dir)
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_13", vol)
            .otherwise(lit(0).cast(D4))).cast(D4).cast("double") /
          sum(vol).cast(D4).cast("double")).as("mkt_share"))
    }),

    // Q9 — product-type profit: supply cost proxied by p_retailprice per
    // unit (no partsupp in the fixtures); all money stays decimal until
    // the final projection.
    "q9_product_profit" -> ((s, dir) => {
      val gears = Tables.part(s, dir)
        .filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supN = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val amount =
        (col("l_extendedprice").cast(D2) *
          (lit(1).cast(D2) - col("l_discount").cast(D2))).cast(D4) -
        (col("p_retailprice").cast(D2) * col("l_quantity").cast(D2)).cast(D4)
      Tables.lineitem(s, dir)
        .join(broadcast(gears), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount).cast(D4).cast("double").as("sum_profit"))
    }),

    // Q11 — important parts by traded value for one nation's suppliers:
    // per-part decimal value vs a broadcast scalar threshold (0.1% of the
    // nation's total), compared in double through identical trees.
    "q11_important_parts" -> ((s, dir) => {
      val supN3 = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val traded = Tables.lineitem(s, dir)
        .join(broadcast(supN3), col("l_suppkey") === col("s_suppkey"))
      val perPart = traded.groupBy(col("l_partkey").as("p_partkey"))
        .agg(revenueSum.as("value"))
      val total = traded.agg(revenueSum.as("total_value"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value") > col("total_value") * 0.001)
        .select(col("p_partkey"), col("value"))
    }),

    // Q13 — customer order-count distribution: LEFT join so zero-order
    // customers land in the c_count=0 bucket, then a distribution over the
    // per-customer counts (two aggregations, each on its natural key).
    "q13_order_count_dist" -> ((s, dir) => {
      val perCust = Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    }),

    // Q14 — promotion-revenue share in a month: both decimal sums come out
    // of ONE map-combined aggregate; the 100·num/den division happens once
    // in double.
    "q14_promo_revenue" -> ((s, dir) => {
      val dp = (col("l_extendedprice").cast(D2) *
        (lit(1).cast(D2) - col("l_discount").cast(D2))).cast(D4)
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-03-01") &&
                col("l_shipdate") < ts("1996-04-01"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", dp).otherwise(lit(0).cast(D4)))
            .cast(D4).cast("double") /
          sum(dp).cast(D4).cast("double")).as("promo_revenue"))
    }),

    // Q15 — top supplier of a quarter: revenue per supplier, the max kept
    // as an EXACT decimal so the tie set is engine-identical, supplier dim
    // broadcast onto the (tiny) winner row(s).
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast(D2) *
          (lit(1).cast(D2) - col("l_discount").cast(D2)))
          .cast(D4).as("rev_dec"))
      val top = rev.agg(max(col("rev_dec")).as("max_rev"))
      rev.crossJoin(broadcast(top))
        .filter(col("rev_dec") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast("double").as("total_revenue"))
    }),

    // Q16 — supplier count by part descriptor: the supplier-part relation
    // derived from lineitem, DISTINCT pairs first (one shuffle) so the
    // count per descriptor is a plain count.
    "q16_supplier_cnt" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      Tables.lineitem(s, dir)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
        .distinct()
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count(lit(1)).as("supplier_cnt"))
    }),

    // Q17 — small-quantity-order revenue: the correlated per-part AVG
    // decorrelated into a per-part aggregate joined back (shuffle on
    // partkey only); quantities are integral so their double sum is exact.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val brand = Tables.part(s, dir).filter(col("p_brand") === "Brand#3")
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, dir)
        .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val avgQ = li.groupBy(col("l_partkey").as("ap"))
        .agg((sum(col("l_quantity")).cast(D2).cast("double") /
          count(lit(1))).as("avg_qty"))
      li.join(avgQ, col("l_partkey") === col("ap"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(col("l_extendedprice").cast(D2)).cast(D4).cast("double") /
          lit(7.0)).as("avg_yearly"))
    }),

    // Q18 — large-volume customers: per-order quantity rollup (exact:
    // integral doubles), HAVING > 300, then the order/customer dims joined
    // onto the few qualifying orders; top-100 under a total order.
    "q18_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast(D2).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("odate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q19 — discounted revenue over three OR'd (brand, size, quantity)
    // bands: one broadcast join, the disjunction evaluated post-join, one
    // global decimal sum.
    "q19_discounted_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1.0, 11.0)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10.0, 20.0)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20.0, 30.0)))
        .agg(revenueSum.as("revenue"))),

    // Q12 shape — order-priority mix by ship latency class (shipmode's
    // stand-in): one fact join, the CASE classification and both
    // conditional counts map-combine; integer day arithmetic, no rounding.
    "q12_ship_latency" -> ((s, dir) => {
      val lat = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1997-01-01"))
        .withColumn("ship_class",
          when(lat <= 30, "FAST").when(lat <= 90, "NORMAL").otherwise("SLOW"))
        .groupBy(col("ship_class"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
    }),

    // Q20 shape — suppliers who dominate a part's supply: per-(part,
    // supplier) 1996 volume vs the per-part total (nested aggregate
    // joined back on partkey — the partial sums reuse the same shuffle
    // key), dominance >50%. Quantities are integral doubles, so the
    // comparison is exact in both engines.
    "q20_dominant_suppliers" -> ((s, dir) => {
      val bolts = Tables.part(s, dir).filter(col("p_name").like("%bolt%"))
        .select(col("p_partkey"))
      val vol = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1997-01-01"))
        .join(broadcast(bolts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val tot = vol.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty")).as("total"))
      vol.join(tot, col("l_partkey") === col("pk"))
        .filter(col("qty") > lit(0.5) * col("total"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_parts_dominated"),
          sum(col("qty")).cast(D2).cast("double").as("qty_dominated"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("n_parts_dominated"), col("qty_dominated"))
    }),

    // Q21 shape — suppliers who alone kept a finished order waiting:
    // "late" = shipped >90 days after the order date. The canonical
    // EXISTS ("another supplier in the order") and NOT EXISTS ("no OTHER
    // supplier late") both decorrelate into one per-(order, supplier)
    // rollup + one per-order rollup — the supplier is guilty iff it is
    // late, n_supp > 1 and n_late == 1. Two aggregations on the same
    // orderkey shuffle vs the canonical l1×l2×l3 triple self-join.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val ordF = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val perSupp = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max(when(to_date(col("l_shipdate")) >
            date_add(to_date(col("o_orderdate")), 90), 1).otherwise(0))
          .as("is_late"))
      val perOrder = perSupp.groupBy(col("ok").as("ok2"))
        .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"))
      perSupp.filter(col("is_late") === 1)
        .join(perOrder.filter(col("n_supp") > 1 && col("n_late") === 1),
          col("ok") === col("ok2"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("sk") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // Q22 — idle high-balance customers by nation: the positive-balance
    // average broadcast back as a scalar, dormancy since 2000-01-01 as an
    // anti-join (the fixture horizon's stand-in for "7 years").
    "q22_idle_balance" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(D2)).cast(D4).cast("double") /
          count(lit(1))).as("avg_bal"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("2000-01-01"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(D2)).cast(D4).cast("double")
            .as("totacctbal"))
    })
  )

  private val rev =
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) " +
      "AS DECIMAL(38,4)) AS DOUBLE)"

  def oracles: Map[String, String] = Map(
    "q2_min_price_supplier" ->
      s"""WITH offers AS (
         |  SELECT p_partkey, p_name, s_suppkey,
         |    l_extendedprice / l_quantity AS price
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE r_name = 'EUROPE' AND p_size BETWEEN 10 AND 20
         |    AND p_type = 'LARGE'),
         |best AS (
         |  SELECT p_partkey AS bp, MIN(price) AS best_price
         |  FROM offers GROUP BY 1),
         |pick AS (
         |  SELECT o.p_partkey, o.p_name, b.best_price,
         |    MIN(o.s_suppkey) AS s_suppkey
         |  FROM offers o JOIN best b
         |    ON o.p_partkey = b.bp AND o.price = b.best_price
         |  GROUP BY 1, 2, 3)
         |SELECT p.p_partkey, p.p_name, p.best_price, p.s_suppkey, s.s_name
         |FROM pick p JOIN supplier s ON p.s_suppkey = s.s_suppkey""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60)
        |GROUP BY o_orderpriority""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS DOUBLE)
        |  AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |  CAST(YEAR(l_shipdate) AS INTEGER) AS l_year, $rev AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ns ON s_nationkey = ns.n_nationkey
         |JOIN nation nc ON c_nationkey = nc.n_nationkey
         |WHERE (ns.n_name = 'NATION_13' AND nc.n_name = 'NATION_19')
         |   OR (ns.n_name = 'NATION_19' AND nc.n_name = 'NATION_13')
         |GROUP BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN ns.n_name = 'NATION_13'
        |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |        AS DECIMAL(38,4))
        |      ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(38,4))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ncr ON c_nationkey = ncr.n_nationkey
        |JOIN region ON ncr.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    "q9_product_profit" ->
      """SELECT ns.n_name AS nation,
        |  CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(CAST(SUM(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS DECIMAL(38,4)) -
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) *
        |      CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
        |  ) AS DECIMAL(38,4)) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2""".stripMargin,

    "q11_important_parts" ->
      s"""WITH traded AS (
         |  SELECT l_partkey, l_extendedprice, l_discount
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'),
         |per_part AS (
         |  SELECT l_partkey AS p_partkey, $rev AS value
         |  FROM traded GROUP BY 1),
         |total AS (SELECT $rev AS total_value FROM traded)
         |SELECT p_partkey, value FROM per_part, total
         |WHERE value > total_value * 0.001""".stripMargin,

    "q13_order_count_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT 100.0 *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS DECIMAL(38,4))
        |    ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(38,4))) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |      AS DECIMAL(38,4)) AS rev_dec
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, COUNT(*) AS supplier_cnt FROM (
        |  SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |    AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49))
        |GROUP BY 1, 2, 3""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3'),
        |avgq AS (
        |  SELECT l_partkey AS ap,
        |    CAST(CAST(SUM(l_quantity) AS DECIMAL(18,2)) AS DOUBLE)
        |      / COUNT(*) AS avg_qty
        |  FROM li GROUP BY 1)
        |SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DECIMAL(38,4)) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM li JOIN avgq ON l_partkey = ap
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(SUM(l_quantity) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(CAST(SUM(l_quantity) AS DECIMAL(18,2)) AS DOUBLE)
        |    > 300.0)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS odate, o_totalprice, sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q19_discounted_revenue" ->
      s"""SELECT $rev AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1.0 AND 11.0)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         |    AND l_quantity BETWEEN 10.0 AND 20.0)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         |    AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin,

    "q12_ship_latency" ->
      """SELECT CASE
        |    WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 30
        |      THEN 'FAST'
        |    WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 90
        |      THEN 'NORMAL'
        |    ELSE 'SLOW' END AS ship_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "q20_dominant_suppliers" ->
      """WITH vol AS (
        |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%bolt%'
        |    AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  GROUP BY 1, 2),
        |tot AS (SELECT l_partkey AS pk, SUM(qty) AS total FROM vol GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  COUNT(*) AS n_parts_dominated,
        |  CAST(CAST(SUM(qty) AS DECIMAL(18,2)) AS DOUBLE) AS qty_dominated
        |FROM vol
        |JOIN tot ON l_partkey = pk
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE qty > 0.5 * total
        |GROUP BY 1, 2""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH ps AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    MAX(CASE WHEN CAST(l_shipdate AS DATE)
        |        > CAST(o_orderdate AS DATE) + 90 THEN 1 ELSE 0 END) AS is_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |po AS (
        |  SELECT ok, COUNT(*) AS n_supp, SUM(is_late) AS n_late
        |  FROM ps GROUP BY 1)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM ps JOIN po USING (ok) JOIN supplier ON sk = s_suppkey
        |WHERE ps.is_late = 1 AND po.n_supp > 1 AND po.n_late = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q22_idle_balance" ->
      """WITH avg_bal AS (
        |  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |      AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0),
        |idle AS (
        |  SELECT c_custkey, c_acctbal, c_nationkey
        |  FROM customer, avg_bal
        |  WHERE c_acctbal > avg_bal
        |    AND NOT EXISTS (
        |      SELECT 1 FROM orders
        |      WHERE o_custkey = c_custkey
        |        AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01'))
        |SELECT n_name, COUNT(*) AS numcust,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,4))
        |    AS DOUBLE) AS totacctbal
        |FROM idle JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin
  )
}
