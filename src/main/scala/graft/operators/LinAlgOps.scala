package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed linear algebra in exact fixed-point — the PCA kernel.
  *
  * Everything here follows the [[GraphOps]] determinism doctrine: float
  * sums are order-dependent across partitionings, so components quantize
  * to micro-unit integers once and all accumulation is exact
  * decimal/long arithmetic. The result is bit-identical on any cluster
  * layout AND replayable by a SQL oracle — the property no float BLAS
  * path offers.
  */
object LinAlgOps {

  /** Quantization scale: components become round(v·1e6) integers. */
  val Quant: Long = 1000000L

  /** Exact integer Gram matrix (uncentered covariance) of a vector column:
    * (i, j, c) with c = Σ_rows qᵢ·qⱼ as DECIMAL(38,0).
    *
    * Shape: posexplode to (row, i, q), equi-join on the row id (d² fan-out
    * per row), one (i, j) aggregation. Right for d ≲ 128 — the exchange
    * carries ≤ d² rows per partition after map-side combine, independent
    * of corpus size. For wider vectors the relational explode loses to a
    * per-partition outer-product accumulator (mapPartitions + treeReduce);
    * the quantized-exactness contract stays the same.
    */
  def gramFp(vecs: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val q = vecs.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col("id"), col("i"),
        round(col("v").cast("double") * Quant).cast("long").as("q"))
    q.select(col("id"), col("i").as("ia"), col("q").as("qa"))
      .join(q.select(col("id"), col("i").as("ib"), col("q").as("qb")), "id")
      .groupBy(col("ia").as("i"), col("ib").as("j"))
      .agg(sum(col("qa").cast(DecimalType(38, 0)) * col("qb")).as("c"))
  }

  /** Dominant eigenvector of an (i, j, c) matrix table by `iters` rounds
    * of fixed-point power iteration. Each round is one matvec (join +
    * aggregate) and one exact rescale: w is summed in DECIMAL(38,0), then
    * v' = (w·1e6) div max|w| — integer division, which BOTH engines
    * truncate toward zero, so every iterate is bit-identical to the
    * oracle's unrolled CTEs. The rescale replaces float normalization;
    * the returned vector is direction-only at max-component scale 1e6.
    * Starting vector: all-ones·1e6 (deterministic; orthogonal-start
    * failure is measure-zero and detectable as an all-zero result).
    */
  def powerIterationFp(mat: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var v = mat.select(col("i").as("j")).distinct()
      .select(col("j"), lit(Quant).cast(DecimalType(38, 0)).as("v"))
    for (_ <- 1 to iters) {
      val w = mat.join(v, "j")
        .groupBy(col("i"))
        .agg(sum(col("c") * col("v")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = w.crossJoin(broadcast(m))
        .select(col("i").as("j"),
          expr(s"CAST((w * $Quant) div m AS DECIMAL(38,0))").as("v"))
    }
    v.select(col("j").as("i"), col("v").cast("long").as("v_fp"))
  }
}
