package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial operators on planar (degree-space) coordinates: the
  * grid-bucket neighbor join — the standard scalable shape for "find
  * pairs within radius r" — and cell density rollups.
  *
  * Scale design (100 TB): the pair space is generated PER CELL. One side
  * expands to its 3×3 cell neighborhood (9 rows per point — a constant
  * fan-out, not a data-dependent one), the other stays in its home cell,
  * and the join is a plain equi-join on the cell key: every qualifying
  * pair meets EXACTLY once (the right side has one home cell, and the
  * id_a < id_b predicate keeps one direction), so no post-join dedup.
  * Shuffle volume is 9·|points| + |points| rows on a uniformly-hashed
  * integer key. Dense urban cells are the skew case — the same salting /
  * cap levers as the LSH buckets apply.
  *
  * Distance is squared planar degree distance — pure ±/× double
  * arithmetic, so any SQL engine replays the exact IEEE tree (trig-based
  * haversine is NOT cross-engine bit-stable; at city scale the planar
  * approximation is the standard first filter, with haversine re-scoring
  * as an optional second pass the caller owns). */
object GeoOps {

  /** All pairs with squared degree distance ≤ `maxD2`, via the 3×3 grid
    * join. `maxD2` must be ≤ cellDeg² or a qualifying pair could sit in
    * non-adjacent cells. */
  def gridNeighborPairs(pts: DataFrame, cellDeg: Double, maxD2: Double,
                        idCol: String = "id", latCol: String = "lat",
                        lonCol: String = "lon"): DataFrame = {
    require(cellDeg > 0 && maxD2 > 0 && maxD2 <= cellDeg * cellDeg,
      s"need 0 < maxD2 <= cellDeg^2, got cellDeg=$cellDeg maxD2=$maxD2")
    val home = pts.select(col(idCol).as("id"),
      col(latCol).as("lat"), col(lonCol).as("lon"),
      floor(col(lonCol) / cellDeg).cast("long").as("cx"),
      floor(col(latCol) / cellDeg).cast("long").as("cy"))
    val offsets = array((for (x <- -1 to 1; y <- -1 to 1)
      yield struct(lit(x).as("x"), lit(y).as("y"))): _*)
    val expanded = home
      .select(col("id").as("id_a"), col("lat").as("lat_a"),
        col("lon").as("lon_a"), col("cx"), col("cy"),
        explode(offsets).as("o"))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        (col("cx") + col("o.x")).as("ncx"),
        (col("cy") + col("o.y")).as("ncy"))
    val d2 = (col("lon_a") - col("lon")) * (col("lon_a") - col("lon")) +
      (col("lat_a") - col("lat")) * (col("lat_a") - col("lat"))
    expanded
      .join(home.select(col("id").as("id_b"), col("lat"), col("lon"),
          col("cx"), col("cy")),
        col("ncx") === col("cx") && col("ncy") === col("cy") &&
          col("id_a") < col("id_b"))
      .withColumn("d2", d2)
      .filter(col("d2") <= maxD2)
      .select(col("id_a"), col("id_b"), round(col("d2"), 6).as("d2"))
  }

  /** Point count per grid cell — the heatmap/density rollup. One
    * map-combined aggregation on the integer cell key. */
  def cellDensity(pts: DataFrame, cellDeg: Double,
                  latCol: String = "lat", lonCol: String = "lon")
      : DataFrame = {
    require(cellDeg > 0, s"cellDeg must be positive: $cellDeg")
    pts.groupBy(
        floor(col(lonCol) / cellDeg).cast("long").as("cx"),
        floor(col(latCol) / cellDeg).cast("long").as("cy"))
      .agg(count(lit(1)).as("n_points"))
  }
}
