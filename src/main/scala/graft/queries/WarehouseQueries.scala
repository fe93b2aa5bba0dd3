package graft.queries

import graft.Tables
import graft.operators.{MergeOps, SilverOps}
import graft.pipeline.DataQuality
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-operations tier (round 7): the table-maintenance and
  * monitoring operators that surround an analytics engine in production —
  * SCD Type 2 dimension builds, CDC log application, a declarative
  * data-quality expectation report, a mergeable sampled-quantile sketch,
  * calendar seasonality, and time-varying (rolling) CAPM beta.
  *
  * Same contract as every other query file: each entry is oracle-exact
  * against DuckDB over the shared fixtures (deterministic md5 ordering,
  * integer/decimal accumulation, shared final double expression trees).
  */
object WarehouseQueries {

  private val epoch = lit("1970-01-01").cast("date")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD Type 2 build (MergeOps.scd2): per-customer order-priority history
    // compressed to change versions with validity intervals. The per-day
    // observation is the max_by-of-orderkey pick so the log is total-ordered
    // before versioning.
    "q_scd2" -> ((s, dir) => {
      val log = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("obs_date"))
        .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("priority"))
      MergeOps.scd2(log, Seq("o_custkey"), Seq("priority"), "obs_date")
    }),

    // POINT-IN-TIME join: facts pick the dimension version that was valid
    // at fact time — SCD2 (MergeOps.scd2) composed with the as-of join
    // (versions are contiguous, so "last valid_from <= ship date" IS the
    // valid version; no interval predicate needed). The warehouse pattern
    // every late-arriving-fact pipeline runs; one (custkey, time) sort
    // shared by the merge, dims never exploded per fact.
    "q_pit_join" -> ((s, dir) => {
      import graft.operators.AsOfJoin
      val log = Tables.orders(s, dir)
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("obs_date"))
        .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("priority"))
      val versions = MergeOps.scd2(log, Seq("o_custkey"), Seq("priority"),
          "obs_date")
        .select(col("o_custkey").as("custkey"), col("valid_from"),
          col("priority"))
      val facts = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("o_custkey").as("custkey"),
          to_date(col("l_shipdate")).as("ship_d"))
      AsOfJoin.asOf(facts, versions, Seq("custkey"), "ship_d", "valid_from",
          Seq("priority"))
        .select(col("l_orderkey"), col("l_linenumber"), col("custkey"),
          col("ship_d"), col("priority").as("priority_at_ship"))
    }),

    // CDC log application (MergeOps.applyCdcLog): orders become an ordered
    // change stream per customer (status → op code, day×10^10+orderkey →
    // total order); the final state is each key's last non-delete payload.
    "q_cdc_apply" -> ((s, dir) => {
      val log = Tables.orders(s, dir).select(
        col("o_custkey"),
        (datediff(to_date(col("o_orderdate")), epoch).cast("long") *
          10000000000L + col("o_orderkey")).as("ord"),
        when(col("o_orderstatus") === "O", "I")
          .when(col("o_orderstatus") === "F", "U")
          .otherwise("D").as("op"),
        col("o_orderpriority").as("priority"),
        col("o_totalprice").as("total"))
      MergeOps.applyCdcLog(log, Seq("o_custkey"), "ord", "op")
    }),

    // Data-quality expectation report: per-row checks are ONE scan per
    // table (conditional counts in a single map-combined agg, unpivoted);
    // referential integrity is a counted anti-join per FK edge.
    "q_dq_report" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val cust = Tables.customer(s, dir)
      val docs = Tables.documents(s, dir)
      val ev = Tables.events(s, dir)
      DataQuality.report(
        DataQuality.rowChecks(ord, "orders", Seq(
          "null_custkey" -> col("o_custkey").isNull,
          "nonpositive_total" -> (col("o_totalprice") <= 0.0),
          "bad_status" -> !col("o_orderstatus").isin("O", "F", "P"))),
        DataQuality.dupCheck(ord, "orders", Seq("o_orderkey")),
        DataQuality.orphanCheck(ord, "orders", "o_custkey", cust, "c_custkey"),
        DataQuality.rowChecks(li, "lineitem", Seq(
          "nonpositive_qty" -> (col("l_quantity") <= 0.0),
          "discount_range" -> (col("l_discount") < 0.0 || col("l_discount") > 1.0),
          "negative_tax" -> (col("l_tax") < 0.0))),
        DataQuality.orphanCheck(li, "lineitem", "l_orderkey", ord, "o_orderkey"),
        DataQuality.dupCheck(cust, "customer", Seq("c_custkey")),
        DataQuality.rowChecks(ev, "events", Seq(
          "null_ts" -> col("ts").isNull,
          "unknown_type" -> !col("event_type")
            .isin("view", "click", "purchase", "signup", "error"))),
        DataQuality.rowChecks(docs, "documents", Seq(
          "empty_text" -> (col("text").isNull ||
            length(trim(col("text"))) === 0),
          "n_chars_mismatch" -> (col("n_chars") =!= length(col("text"))))))
    }),

    // Mergeable sampled quantiles: a deterministic per-group bottom-k
    // sample in md5 order (the KMV idea applied to row selection — the
    // sample is mergeable: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    // bottom-k(B))), then exact interpolated percentiles over the sample.
    // Plans as a per-group partial top-k (WindowGroupLimit) — no full sort.
    "q_sampled_quantile" -> ((s, dir) => {
      val k = 1024
      val li = Tables.lineitem(s, dir)
        .withColumn("rk", md5(concat(col("l_orderkey").cast("string"),
          lit(":"), col("l_linenumber").cast("string"))))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("rk"), col("l_orderkey"), col("l_linenumber"))
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("sample_n"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_est"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_est"))
    }),

    // Day-of-week volume seasonality per ticker: ratio of the dow's mean
    // volume to the ticker's overall mean, from exact integer sums combined
    // in one shared double tree. dow 0 = Thursday (epoch-day mod 7 — the
    // one dow formula both engines compute identically).
    "q_seasonality" -> ((s, dir) => {
      val b = Tables.bars(s, dir)
        .withColumn("dow", pmod(datediff(col("date"), epoch), lit(7)))
      val tot = b.groupBy(col("ticker")).agg(
        sum(col("volume")).as("tvol"), count(lit(1)).as("tcnt"))
      b.groupBy(col("ticker"), col("dow"))
        .agg(sum(col("volume")).as("dvol"), count(lit(1)).as("n_days"))
        .join(broadcast(tot), "ticker")
        .select(col("ticker"), col("dow"), col("n_days"),
          round((col("dvol").cast("double") * col("tcnt")) /
            (col("n_days") * col("tvol").cast("double")), 6).as("vol_ratio"))
    }),

    // Trailing-20-day rolling CAPM beta (SilverOps.rollingBeta).
    "q_rolling_beta" -> ((s, dir) =>
      SilverOps.rollingBeta(Tables.bars(s, dir)))
  )

  def oracles: Map[String, String] = Map(

    "q_scd2" ->
      """WITH log AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS obs_date,
        |    arg_max(o_orderpriority, o_orderkey) AS priority
        |  FROM orders GROUP BY 1, 2),
        |ch AS (
        |  SELECT o_custkey, obs_date, priority,
        |    LAG(priority) OVER (PARTITION BY o_custkey ORDER BY obs_date)
        |      AS prev,
        |    LAG(obs_date) OVER (PARTITION BY o_custkey ORDER BY obs_date)
        |      AS prev_d
        |  FROM log),
        |f AS (
        |  SELECT o_custkey, obs_date, priority FROM ch
        |  WHERE prev_d IS NULL OR prev <> priority)
        |SELECT o_custkey, priority, obs_date AS valid_from,
        |  LEAD(obs_date) OVER w AS valid_to,
        |  LEAD(obs_date) OVER w IS NULL AS is_current
        |FROM f
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY obs_date)""".stripMargin,

    // PIT replay: same SCD2 version CTE, then DuckDB's native ASOF join
    // picks the version valid at ship time
    "q_pit_join" ->
      """WITH log AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS obs_date,
        |    arg_max(o_orderpriority, o_orderkey) AS priority
        |  FROM orders GROUP BY 1, 2),
        |ch AS (
        |  SELECT o_custkey, obs_date, priority,
        |    LAG(priority) OVER (PARTITION BY o_custkey ORDER BY obs_date)
        |      AS prev,
        |    LAG(obs_date) OVER (PARTITION BY o_custkey ORDER BY obs_date)
        |      AS prev_d
        |  FROM log),
        |v AS (
        |  SELECT o_custkey AS custkey, obs_date AS valid_from, priority
        |  FROM ch WHERE prev_d IS NULL OR prev <> priority),
        |facts AS (
        |  SELECT l_orderkey, l_linenumber, o_custkey AS custkey,
        |    CAST(l_shipdate AS DATE) AS ship_d
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT f.l_orderkey, f.l_linenumber, f.custkey, f.ship_d,
        |  v.priority AS priority_at_ship
        |FROM facts f ASOF LEFT JOIN v
        |  ON f.custkey = v.custkey AND f.ship_d >= v.valid_from""".stripMargin,

    "q_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      * 10000000000 + o_orderkey AS ord,
        |    CASE o_orderstatus WHEN 'O' THEN 'I' WHEN 'F' THEN 'U'
        |      ELSE 'D' END AS op,
        |    o_orderpriority AS priority, o_totalprice AS total
        |  FROM orders),
        |last AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY ord DESC) AS rn
        |  FROM log)
        |SELECT o_custkey, priority, total
        |FROM last WHERE rn = 1 AND op <> 'D'""".stripMargin,

    "q_dq_report" ->
      """SELECT 'orders' AS tbl, 'null_custkey' AS chk,
        |  COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations FROM orders
        |UNION ALL SELECT 'orders', 'nonpositive_total',
        |  COUNT(*) FILTER (WHERE o_totalprice <= 0.0) FROM orders
        |UNION ALL SELECT 'orders', 'bad_status',
        |  COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) FROM orders
        |UNION ALL SELECT 'orders', 'dup_o_orderkey',
        |  COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
        |UNION ALL SELECT 'orders', 'orphan_o_custkey',
        |  COUNT(*) FILTER (WHERE c_custkey IS NULL)
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  WHERE o_custkey IS NOT NULL
        |UNION ALL SELECT 'lineitem', 'nonpositive_qty',
        |  COUNT(*) FILTER (WHERE l_quantity <= 0.0) FROM lineitem
        |UNION ALL SELECT 'lineitem', 'discount_range',
        |  COUNT(*) FILTER (WHERE l_discount < 0.0 OR l_discount > 1.0)
        |  FROM lineitem
        |UNION ALL SELECT 'lineitem', 'negative_tax',
        |  COUNT(*) FILTER (WHERE l_tax < 0.0) FROM lineitem
        |UNION ALL SELECT 'lineitem', 'orphan_l_orderkey',
        |  COUNT(*) FILTER (WHERE o_orderkey IS NULL)
        |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_orderkey IS NOT NULL
        |UNION ALL SELECT 'customer', 'dup_c_custkey',
        |  COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer
        |UNION ALL SELECT 'events', 'null_ts',
        |  COUNT(*) FILTER (WHERE ts IS NULL) FROM events
        |UNION ALL SELECT 'events', 'unknown_type',
        |  COUNT(*) FILTER (WHERE event_type NOT IN
        |    ('view','click','purchase','signup','error')) FROM events
        |UNION ALL SELECT 'documents', 'empty_text',
        |  COUNT(*) FILTER (WHERE text IS NULL OR length(trim(text)) = 0)
        |  FROM documents
        |UNION ALL SELECT 'documents', 'n_chars_mismatch',
        |  COUNT(*) FILTER (WHERE n_chars <> length(text)) FROM documents""".stripMargin,

    "q_sampled_quantile" ->
      """WITH rk AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |        CAST(l_linenumber AS VARCHAR)), l_orderkey, l_linenumber)
        |      AS rn
        |  FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS sample_n,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_est,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_est
        |FROM rk WHERE rn <= 1024 GROUP BY l_returnflag""".stripMargin,

    "q_seasonality" -> (Tables.barsSql +
      """,
        |d AS (
        |  SELECT ticker, (date - DATE '1970-01-01') % 7 AS dow, volume
        |  FROM bars),
        |tot AS (
        |  SELECT ticker, CAST(SUM(volume) AS BIGINT) AS tvol,
        |    COUNT(*) AS tcnt
        |  FROM d GROUP BY ticker),
        |dw AS (
        |  SELECT ticker, dow, CAST(SUM(volume) AS BIGINT) AS dvol,
        |    COUNT(*) AS n_days
        |  FROM d GROUP BY ticker, dow)
        |SELECT dw.ticker, dw.dow, dw.n_days,
        |  ROUND((CAST(dvol AS DOUBLE) * tcnt) /
        |    (n_days * CAST(tvol AS DOUBLE)), 6) AS vol_ratio
        |FROM dw JOIN tot ON dw.ticker = tot.ticker""".stripMargin),

    "q_rolling_beta" -> (Tables.barsSql +
      """,
        |r AS (
        |  SELECT ticker, date,
        |    CAST(ROUND((close / LAG(close, 1)
        |      OVER (PARTITION BY ticker ORDER BY date) - 1.0) * 1e8)
        |      AS BIGINT) AS x
        |  FROM bars
        |  QUALIFY x IS NOT NULL),
        |market AS (
        |  SELECT date,
        |    CAST(ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m8
        |  FROM r GROUP BY date),
        |p AS (
        |  SELECT r.ticker, r.date, r.x, market.m8
        |  FROM r JOIN market USING (date)),
        |cums AS (
        |  SELECT ticker, date,
        |    SUM(x) OVER run AS cx, SUM(m8) OVER run AS cm,
        |    SUM(CAST(x AS HUGEINT) * m8) OVER run AS cxm,
        |    SUM(CAST(m8 AS HUGEINT) * m8) OVER run AS cmm,
        |    COUNT(*) OVER run AS cn
        |  FROM p
        |  WINDOW run AS (PARTITION BY ticker ORDER BY date
        |    ROWS UNBOUNDED PRECEDING)),
        |tr AS (
        |  SELECT ticker, date,
        |    CAST(cx  - COALESCE(LAG(cx,  20) OVER wt, 0) AS DOUBLE) AS sx,
        |    CAST(cm  - COALESCE(LAG(cm,  20) OVER wt, 0) AS DOUBLE) AS sm,
        |    CAST(cxm - COALESCE(LAG(cxm, 20) OVER wt, 0) AS DOUBLE) AS sxm,
        |    CAST(cmm - COALESCE(LAG(cmm, 20) OVER wt, 0) AS DOUBLE) AS smm,
        |    cn - COALESCE(LAG(cn, 20) OVER wt, 0) AS cnt
        |  FROM cums
        |  WINDOW wt AS (PARTITION BY ticker ORDER BY date))
        |SELECT ticker, date,
        |  CASE WHEN cnt = 20 AND (20.0 * smm - sm * sm) > 0.0
        |    THEN ROUND((20.0 * sxm - sx * sm) / (20.0 * smm - sm * sm), 4)
        |      + 0.0
        |  END AS beta_n
        |FROM tr""".stripMargin)
  )
}
