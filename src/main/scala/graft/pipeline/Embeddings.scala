package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-column transforms for training-data preparation: L2
 * normalization and symmetric int8 quantization. Pure per-row expression
 * work — map-only at any scale, no UDFs.
 */
object Embeddings {

  /** x / ‖x‖₂ (zero vectors pass through unchanged). Norm via the native
    * codegen'd DotProduct expression — same FP order as the sum-of-squares
    * fold it replaced. */
  def l2Normalize(v: Column): Column = {
    val norm = graft.functions.vfunctions.vec_norm(v)
    when(norm > 0, transform(v, x => x / norm)).otherwise(v)
  }

  /** Symmetric per-vector int8 quantization: q_i = round(x_i · 127 / max|x|)
    * (zero vectors quantize to zeros). Returns array<int> in [-127, 127]. */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x)))
    when(maxAbs > 0,
      transform(v, x => round(x * lit(127.0) / maxAbs, 0).cast("int")))
      .otherwise(transform(v, x => lit(0)))
  }

  /** Seeded Gaussian projection planes (outDim × inDim), shared between
    * `randomProject` and the SQL oracle that replays it as literals. */
  def gaussianPlanes(outDim: Int, inDim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(outDim)(Seq.fill(inDim)(rng.nextGaussian()))
  }

  /** Johnson–Lindenstrauss random projection to `planes.length` output
    * dimensions: out_j = x · plane_j. The planes ride the plan as array
    * literals and each dot product is the native codegen'd DotProduct
    * expression — map-only at any scale, the standard cheap dimensionality
    * reduction before clustering or coarse ANN at 100 TB. */
  def randomProject(v: Column, planes: Seq[Seq[Double]]): Column =
    array(planes.map(p => graft.functions.vfunctions.vec_dot(v, typedlit(p))): _*)
}
