package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Streaming log-sum-exp buffer: tracks the running max `m` and the scaled
 * linear sum `s = Σ exp(x_i - m)`, so `result = m + log(s)`. Mathematically
 * equal (up to FP reordering) to the reference's pairwise log-space fold
 * (reference: cc/mrlda/TermCombiner.java:19-35). Catalyst splits this into
 * partial (map-side) and final aggregation automatically — the same
 * combiner structure the reference hand-codes.
 */
case class LseBuf(var m: Double, var s: Double)

class LogSumExpAgg extends Aggregator[Double, LseBuf, Double] with Serializable {
  override def zero: LseBuf = LseBuf(Double.NegativeInfinity, 0.0)

  override def reduce(b: LseBuf, x: Double): LseBuf = {
    if (x.isNegInfinity) b
    else if (b.s == 0.0) { b.m = x; b.s = 1.0; b }
    else if (x <= b.m) { b.s += math.exp(x - b.m); b }
    else { b.s = b.s * math.exp(b.m - x) + 1.0; b.m = x; b }
  }

  override def merge(a: LseBuf, b: LseBuf): LseBuf = {
    if (b.s == 0.0) a
    else if (a.s == 0.0) b
    else if (a.m >= b.m) { a.s += b.s * math.exp(b.m - a.m); a }
    else { b.s += a.s * math.exp(a.m - b.m); b }
  }

  override def finish(b: LseBuf): Double =
    if (b.s == 0.0) Double.NegativeInfinity else b.m + math.log(b.s)

  override def bufferEncoder: Encoder[LseBuf] = Encoders.product[LseBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object LogSumExp {
  private lazy val fn = udaf(new LogSumExpAgg)
  /** Grouped aggregate column: logsumexp(x) over the group. */
  def logsumexp(c: Column): Column = fn(c)
}
