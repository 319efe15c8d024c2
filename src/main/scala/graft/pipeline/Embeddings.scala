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
}
