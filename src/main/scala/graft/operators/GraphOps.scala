package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames — the join-relational
  * formulations (Pregel-without-Pregel): each PageRank iteration is one
  * edge⋈rank join + one dst aggregation, triangle counting is the
  * degree-oriented two-path join. Complements [[DedupOps]]' connected
  * components (min-label propagation + pointer jumping).
  *
  * Scale notes (100 TB): ranks/degrees are node-cardinality tables (orders
  * of magnitude smaller than edges); every join here keys on a node id, so
  * pre-partitioning edges by src lets AQE reuse one exchange across
  * iterations. Dangling mass and node count travel as broadcast 1-row
  * scalars — no driver collect, the whole multi-iteration plan stays lazy.
  *
  * Determinism doctrine: ranks are **fixed-point integers** (scale 1e12,
  * integer `div` throughout). Float PageRank sums are order-dependent
  * (both engines may re-associate double addends across partitions);
  * integer sums are associative, so the result is bit-identical on any
  * partitioning AND replayable exactly by the DuckDB oracle — same reason
  * the W-family uses decimal/integer running sums.
  */
object GraphOps {

  val RankScale: Long = 1000000000000L // 1e12: ranks are r/1e12

  /** Clean directed edge set: long ids, self-loops dropped, deduped. */
  def cleanEdges(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .distinct()

  /** Fixed-point PageRank (damping 0.85) over `iters` synchronous
    * iterations. Nodes are the distinct edge endpoints; dangling mass is
    * redistributed uniformly each iteration.
    *
    * Per-node update (all integer arithmetic, SCALE = 1e12):
    * `r' = (15·SCALE) div 100 div N + (85·(Σ_{u→v} r(u) div od(u) + dang div N)) div 100`
    *
    * Truncation (`div` floors the per-edge contribution) loses < 1 ulp of
    * fixed-point mass per edge — the standard fixed-point PageRank
    * trade-off; iterate count is a parameter, convergence tolerance is the
    * caller's choice of `iters`.
    */
  def pageRank(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = cleanEdges(edges)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val nDf = nodes.agg(count(lit(1)).as("nn"))

    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), expr(s"$RankScale div nn").as("r"))

    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .groupBy(col("dst"))
        .agg(sum(expr("r div od")).as("c"))
      val dang = ranks
        .join(outdeg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dang"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .crossJoin(broadcast(nDf))
        .select(col("node"),
          expr(s"(15 * $RankScale) div 100 div nn" +
            " + (85 * (coalesce(c, 0) + dang div nn)) div 100").as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_fp"))
  }

  /** Fixed-point stationary mass of a WEIGHTED random walk: given
    * (src, dst, c) transition counts, iterate v'_dst = Σ_src (v·c) div rs
    * where rs is src's total outgoing count — the Markov stationary
    * distribution by power iteration, in [[pageRank]]'s integer doctrine
    * (per-edge truncating div, deterministic on any partitioning and
    * replayable by unrolled CTEs). No teleport term: the caller's chain
    * should be irreducible (event-type graphs are); mass leaks < 1 fp-ulp
    * per edge per round to truncation. Start: uniform `RankScale`/N. */
  def stationaryFp(trans: DataFrame, iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val t = trans.select(col("src"), col("dst"), col("c").cast("long"))
    val rs = t.groupBy("src").agg(sum(col("c")).as("rs"))
    val nodes = t.select(col("src").as("node"))
      .union(t.select(col("dst").as("node"))).distinct()
    val nDf = nodes.agg(count(lit(1)).as("nn"))
    var v = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), expr(s"$RankScale div nn").as("v"))
    for (_ <- 1 to iters) {
      v = nodes.join(
        t.join(v.withColumnRenamed("node", "src"), "src")
          .join(broadcast(rs), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("(v * c) div rs")).as("w")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("w"), lit(0L)).as("v"))
    }
    v.select(col("node"), col("v").as("mass_fp"))
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007) over
    * `iters` rounds: every node adopts the most frequent label among its
    * undirected neighbors, ties broken by the SMALLEST label — the total
    * order that makes synchronous LPA deterministic (async/random-order
    * LPA is not reproducible, which is why this variant is the one an
    * oracle can replay). Labels start as node ids.
    *
    * Shape per round: one neighbor⋈label join (edge-sized), one
    * (node, label) count agg (≤ degree rows per node), one per-node top-1
    * window. All tables are node- or edge-cardinality; nothing grows with
    * iterations. Complements connected components: CC merges everything
    * reachable, LPA finds denser-than-surroundings groups inside a
    * component.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import org.apache.spark.sql.expressions.Window
    val und = cleanEdges(edges)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val nodes = und.select(col("a").as("n"))
      .union(und.select(col("b").as("n"))).distinct()
    var labels = nodes.select(col("n"), col("n").as("lab"))
    for (_ <- 1 to iters) {
      val nb = und.join(labels.withColumnRenamed("n", "a"), "a")
        .select(col("b").as("n"), col("lab"))
        .unionAll(und.join(labels.withColumnRenamed("n", "b"), "b")
          .select(col("a").as("n"), col("lab")))
      val cnt = nb.groupBy("n", "lab").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("n"))
        .orderBy(col("c").desc, col("lab").asc)
      labels = cnt.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select(col("n"), col("lab"))
    }
    labels.select(col("n").as("node"), col("lab").as("community"))
  }

  /** Hop distances from a source node over `maxHops` synchronous frontier
    * expansions (bounded BFS — the Pregel shortest-path kernel with unit
    * weights). Returns (node, dist) for every node reachable within
    * `maxHops`; unreachable nodes are absent, the caller's signal.
    *
    * Each round is one dist⋈edges join + a min agg — the candidate set is
    * edge-bounded and shrinks to the frontier in practice; `maxHops`
    * bounds the plan depth explicitly (an unbounded fixed-point loop has
    * no lazy plan). Integer distances — deterministic on any partitioning.
    */
  def bfsDistances(edges: DataFrame, source: Long, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = cleanEdges(edges)
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("n"), lit(0).cast("int").as("dist"))
    for (_ <- 1 to maxHops) {
      dist = dist
        .unionAll(e.join(dist.withColumnRenamed("n", "src"), "src")
          .select(col("dst").as("n"), (col("dist") + 1).cast("int").as("dist")))
        .groupBy("n").agg(min(col("dist")).as("dist"))
    }
    dist.select(col("n").as("node"), col("dist"))
  }

  /** Per-node triangle counts via degree orientation (Suri-Vassilvitskii):
    * canonicalize to undirected distinct edges, orient each from the
    * (degree, id)-smaller endpoint to the larger, then count two-paths
    * closed by a third oriented edge. Orientation bounds every oriented
    * out-degree by O(√m), so the two-path join materializes O(m^{3/2})
    * candidates worst-case instead of Σ deg² — the difference between
    * feasible and not on a skewed 100 TB edge set (a celebrity node with
    * 10⁸ neighbors contributes zero two-path pairs from its own fan-out).
    * Every triangle (a,b,c) appears exactly once; the final explode+count
    * credits all three corners.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = cleanEdges(edges)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val ori = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("s"),
      when(aFirst, col("b")).otherwise(col("a")).as("t"))
    val o1 = ori.select(col("s").as("x"), col("t").as("y"))
    val o2 = ori.select(col("s").as("y"), col("t").as("z"))
    val o3 = ori.select(col("s").as("x"), col("t").as("z"))
    val tri = o1.join(o2, "y").join(o3, Seq("x", "z"))
    tri.select(col("x").as("node"))
      .unionAll(tri.select(col("y").as("node")))
      .unionAll(tri.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri_count"))
  }
}
