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
  /** The typed-Aggregator form (ObjectHashAggregate path) — kept for the
    * equivalence spec; production callers use `logsumexp`. */
  def logsumexpUdaf(c: Column): Column = fn(c)

  /** Grouped aggregate column: logsumexp(x) over the group. Declarative
    * (expression-based) aggregate — identical arithmetic to LogSumExpAgg,
    * but the buffer is two mutable doubles in an UnsafeRow, so it runs in
    * HashAggregateExec inside whole-stage codegen instead of the
    * ObjectHashAggregate + product-encoder path the udaf pays. */
  def logsumexp(c: Column): Column = {
    import org.apache.spark.sql.graftshim.shim
    shim.toColumn(LogSumExpDecl(shim.toExpr(c)).toAggregateExpression())
  }
}

/**
 * `logsumexp` as a DeclarativeAggregate: state (m, s) with
 * m = running max, s = Σ exp(x_i − m); result m + log(s). The update and
 * merge expression trees mirror `LogSumExpAgg.reduce`/`merge` branch for
 * branch, so the two forms produce bitwise-identical folds over the same
 * input order (pinned by a spec).
 */
case class LogSumExpDecl(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
    with org.apache.spark.sql.catalyst.trees.UnaryLike[
      org.apache.spark.sql.catalyst.expressions.Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.{DataType, DoubleType}

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "logsumexp"

  private lazy val m = AttributeReference("m", DoubleType, nullable = false)()
  private lazy val s = AttributeReference("s", DoubleType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(m, s)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(Double.NegativeInfinity), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = child
    // null or -Inf contributes nothing (LogSumExpAgg.reduce's first branch)
    val skip = Or(IsNull(x), EqualTo(x, Literal(Double.NegativeInfinity)))
    val empty = EqualTo(s, Literal(0.0))
    val xLeM = LessThanOrEqual(x, m)
    Seq(
      If(skip, m, If(empty, x, If(xLeM, m, x))),
      If(skip, s, If(empty, Literal(1.0),
        If(xLeM, Add(s, Exp(Subtract(x, m))),
          Add(Multiply(s, Exp(Subtract(m, x))), Literal(1.0))))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val bEmpty = EqualTo(s.right, Literal(0.0))
    val aEmpty = EqualTo(s.left, Literal(0.0))
    val aGe = GreaterThanOrEqual(m.left, m.right)
    Seq(
      If(bEmpty, m.left, If(aEmpty, m.right, If(aGe, m.left, m.right))),
      If(bEmpty, s.left, If(aEmpty, s.right,
        If(aGe, Add(s.left, Multiply(s.right, Exp(Subtract(m.right, m.left)))),
          Add(s.right, Multiply(s.left, Exp(Subtract(m.left, m.right))))))))
  }

  override lazy val evaluateExpression: org.apache.spark.sql.catalyst.expressions.Expression =
    If(EqualTo(s, Literal(0.0)), Literal(Double.NegativeInfinity), Add(m, Log(s)))

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): LogSumExpDecl = copy(child = c)
}
