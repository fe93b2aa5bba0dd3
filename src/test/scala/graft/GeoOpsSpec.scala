package graft

import graft.operators.GeoOps
import org.apache.spark.sql.functions._

class GeoOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def pts(n: Int) = {
    val rnd = new scala.util.Random(42)
    (0 until n).map(i =>
      (i.toLong, -60.0 + rnd.nextInt(12000) / 100.0,
        -180.0 + rnd.nextInt(36000) / 100.0))
      .toDF("id", "lat", "lon")
  }

  test("grid neighbor join equals brute force, each pair exactly once") {
    val p = pts(400).persist()
    val grid = GeoOps.gridNeighborPairs(p, cellDeg = 1.0, maxD2 = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // no duplicate pair rows (the exactly-once meeting guarantee)
    assert(grid.distinct.size === grid.size)
    val rows = p.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val brute = (for {
      (a, la, lo) <- rows; (b, lb, lob) <- rows
      if a < b && (lo - lob) * (lo - lob) + (la - lb) * (la - lb) <= 1.0
    } yield (a, b)).toSet
    assert(grid.toSet === brute)
    assert(brute.nonEmpty, "fixture must contain neighbor pairs")
    p.unpersist()
  }

  test("grid join refuses a radius larger than the cell") {
    intercept[IllegalArgumentException] {
      GeoOps.gridNeighborPairs(pts(5), cellDeg = 1.0, maxD2 = 1.5)
    }
  }

  test("cell density counts every point once") {
    val p = pts(300)
    val d = GeoOps.cellDensity(p, cellDeg = 5.0)
    assert(d.agg(sum(col("n_points"))).first().getLong(0) === 300L)
    assert(d.filter(col("n_points") <= 0).count() === 0)
  }
}
