package graft.queries

import graft.Tables
import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over a deterministic edge set derived from the shared
  * fixtures: directed part→supplier links (`l_partkey % 100 →
  * l_suppkey % 100`), deduped, self-loops dropped — rebuildable verbatim by
  * the DuckDB oracle. PageRank runs in fixed-point integers and the oracle
  * unrolls the identical three iterations as chained CTEs, so both engines
  * execute the same exact integer arithmetic (see GraphOps determinism
  * doctrine).
  */
object GraphQueries {

  private def edges(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      (col("l_partkey") % 100).as("src"),
      (col("l_suppkey") % 100).as("dst"))

  private val edgesSql =
    """edges AS (
      |  SELECT DISTINCT (l_partkey % 100) AS src, (l_suppkey % 100) AS dst
      |  FROM lineitem WHERE (l_partkey % 100) <> (l_suppkey % 100))""".stripMargin

  /** One unrolled fixed-point PageRank iteration as oracle CTE text. */
  private def iterSql(i: Int): String = {
    val (prev, c, d, r) = (s"r${i - 1}", s"c$i", s"d$i", s"r$i")
    s"""$c AS (
       |  SELECT e.dst AS n, SUM(p.r // o.od) AS c
       |  FROM edges e JOIN $prev p ON e.src = p.n
       |  JOIN outdeg o ON e.src = o.src
       |  GROUP BY e.dst),
       |$d AS (
       |  SELECT COALESCE(SUM(p.r), 0) AS dang
       |  FROM $prev p LEFT JOIN outdeg o ON p.n = o.src
       |  WHERE o.src IS NULL),
       |$r AS (
       |  SELECT nd.n,
       |    (15 * 1000000000000) // 100 // nn
       |      + (85 * (COALESCE(c.c, 0) + dang // nn)) // 100 AS r
       |  FROM nodes nd LEFT JOIN $c c ON nd.n = c.n, cnt, $d)""".stripMargin
  }

  /** One synchronous LPA round as oracle CTE text (same tie rule as
    * [[GraphOps.labelPropagation]]: count DESC, label ASC). */
  private def lpaIterSql(i: Int): String = {
    val (prev, nb, c, r, cur) = (s"l${i - 1}", s"nb$i", s"c$i", s"r$i", s"l$i")
    s"""$nb AS (
       |  SELECT u.b AS n, p.lab FROM und u JOIN $prev p ON u.a = p.n
       |  UNION ALL
       |  SELECT u.a AS n, p.lab FROM und u JOIN $prev p ON u.b = p.n),
       |$c AS (SELECT n, lab, COUNT(*) AS c FROM $nb GROUP BY 1, 2),
       |$r AS (
       |  SELECT n, lab,
       |    ROW_NUMBER() OVER (PARTITION BY n ORDER BY c DESC, lab ASC) AS rn
       |  FROM $c),
       |$cur AS (SELECT n, lab FROM $r WHERE rn = 1)""".stripMargin
  }

  /** One BFS frontier expansion as oracle CTE text. */
  private def bfsIterSql(i: Int): String =
    s"""d$i AS (
       |  SELECT n, MIN(dist) AS dist FROM (
       |    SELECT n, dist FROM d${i - 1}
       |    UNION ALL
       |    SELECT e.dst AS n, p.dist + 1 AS dist
       |    FROM edges e JOIN d${i - 1} p ON e.src = p.n) t
       |  GROUP BY n)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> ((s, dir) =>
      GraphOps.pageRank(edges(s, dir), iters = 3)),

    "q_triangles" -> ((s, dir) =>
      GraphOps.triangleCounts(edges(s, dir))),

    "q_communities" -> ((s, dir) =>
      GraphOps.labelPropagation(edges(s, dir), iters = 3)),

    "q_bfs_dist" -> ((s, dir) =>
      GraphOps.bfsDistances(edges(s, dir), source = 1L, maxHops = 3)),

    // Jaccard link prediction over 2-hop candidate pairs: per-node sorted
    // neighbor sets, candidates generated THROUGH the shared neighbor
    // (bounded by Σdeg², never all pairs), common-neighbor counts via the
    // codegen sorted-merge expression (the Jaccard-verify machinery,
    // reused on graph neighborhoods). is_edge flags whether the scored
    // pair already exists — the prediction targets are the 0 rows.
    // Jaccard ships UNROUNDED (one shared division of exact integers;
    // denominators like 128 land exact 1e-7 halves where ROUND splits).
    "q_link_predict" -> ((s, dir) => {
      val e = edges(s, dir).filter(col("src") =!= col("dst")).distinct()
      val und = e.select(col("src").as("a"), col("dst").as("b"))
        .union(e.select(col("dst").as("a"), col("src").as("b"))).distinct()
      val nbr = und.groupBy(col("a").as("n"))
        .agg(array_sort(collect_set(col("b"))).as("nb"))
      val cand = und.as("l").join(und.as("r"), col("l.a") === col("r.a"))
        .filter(col("l.b") < col("r.b"))
        .select(col("l.b").as("x"), col("r.b").as("y")).distinct()
      val isEdge = und
        .select(least(col("a"), col("b")).as("x"),
          greatest(col("a"), col("b")).as("y")).distinct()
        .withColumn("is_edge", lit(1))
      cand
        .join(nbr.select(col("n").as("x"), col("nb").as("nx")), Seq("x"))
        .join(nbr.select(col("n").as("y"), col("nb").as("ny")), Seq("y"))
        .withColumn("cn", graft.functions.SetExpressions
          .sorted_intersect_count(col("nx"), col("ny")))
        .join(isEdge, Seq("x", "y"), "left")
        .select(col("x"), col("y"), col("cn").cast("int").as("cn"),
          size(col("nx")).as("deg_x"), size(col("ny")).as("deg_y"),
          (col("cn").cast("double") /
            (size(col("nx")) + size(col("ny")) - col("cn"))).as("jaccard"),
          coalesce(col("is_edge"), lit(0)).as("is_edge"))
    }))

  def oracles: Map[String, String] = Map(
    "q_pagerank" ->
      s"""WITH $edgesSql,
         |nodes AS (
         |  SELECT DISTINCT n FROM
         |    (SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
         |cnt AS (SELECT COUNT(*) AS nn FROM nodes),
         |outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
         |r0 AS (SELECT n, 1000000000000 // nn AS r FROM nodes, cnt),
         |${iterSql(1)},
         |${iterSql(2)},
         |${iterSql(3)}
         |SELECT n AS node, CAST(r AS BIGINT) AS rank_fp FROM r3""".stripMargin,

    "q_triangles" ->
      s"""WITH $edgesSql,
         |und AS (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM edges),
         |deg AS (
         |  SELECT n, COUNT(*) AS d FROM
         |    (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
         |  GROUP BY n),
         |ori AS (
         |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
         |              THEN u.a ELSE u.b END AS s,
         |         CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
         |              THEN u.b ELSE u.a END AS t
         |  FROM und u JOIN deg da ON u.a = da.n JOIN deg db ON u.b = db.n),
         |tri AS (
         |  SELECT o1.s AS x, o1.t AS y, o2.t AS z
         |  FROM ori o1 JOIN ori o2 ON o1.t = o2.s
         |  JOIN ori o3 ON o3.s = o1.s AND o3.t = o2.t)
         |SELECT n AS node, COUNT(*) AS tri_count FROM
         |  (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
         |   UNION ALL SELECT z FROM tri)
         |GROUP BY n""".stripMargin,

    "q_communities" ->
      s"""WITH $edgesSql,
         |und AS (
         |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |  FROM edges),
         |nodes AS (
         |  SELECT DISTINCT n FROM
         |    (SELECT a AS n FROM und UNION ALL SELECT b FROM und)),
         |l0 AS (SELECT n, n AS lab FROM nodes),
         |${lpaIterSql(1)},
         |${lpaIterSql(2)},
         |${lpaIterSql(3)}
         |SELECT n AS node, lab AS community FROM l3""".stripMargin,

    "q_bfs_dist" ->
      s"""WITH $edgesSql,
         |d0 AS (SELECT CAST(1 AS BIGINT) AS n, 0 AS dist),
         |${bfsIterSql(1)},
         |${bfsIterSql(2)},
         |${bfsIterSql(3)}
         |SELECT n AS node, CAST(dist AS INT) AS dist FROM d3""".stripMargin,

    "q_link_predict" ->
      s"""WITH $edgesSql,
         |und AS (
         |  SELECT src AS a, dst AS b FROM edges
         |  UNION
         |  SELECT dst AS a, src AS b FROM edges),
         |nbr AS (
         |  SELECT a AS n, list_sort(list(DISTINCT b)) AS nb
         |  FROM und GROUP BY 1),
         |cand AS (
         |  SELECT DISTINCT l.b AS x, r.b AS y
         |  FROM und l JOIN und r ON l.a = r.a WHERE l.b < r.b),
         |ed AS (
         |  SELECT DISTINCT LEAST(a, b) AS x, GREATEST(a, b) AS y, 1 AS ie
         |  FROM und),
         |sc AS (
         |  SELECT c.x, c.y,
         |    len(list_filter(nx.nb, e -> list_contains(ny.nb, e))) AS cn,
         |    len(nx.nb) AS ua, len(ny.nb) AS ub
         |  FROM cand c
         |  JOIN nbr nx ON nx.n = c.x
         |  JOIN nbr ny ON ny.n = c.y)
         |SELECT sc.x, sc.y, CAST(cn AS INT) AS cn,
         |  CAST(ua AS INT) AS deg_x, CAST(ub AS INT) AS deg_y,
         |  CAST(cn AS DOUBLE) / (ua + ub - cn) AS jaccard,
         |  COALESCE(ed.ie, 0) AS is_edge
         |FROM sc LEFT JOIN ed ON ed.x = sc.x AND ed.y = sc.y""".stripMargin)
}
