package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Codegen'd dot product over two `array<double>` columns.
 *
 * The composable alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
 * is a higher-order function chain: Spark evaluates those interpreted
 * (CodegenFallback), materializing the products array and walking lambda
 * machinery per element. In the embedding paths (ANN brute-force scores
 * |corpus|×|queries| dots; LSH signatures take nPlanes dots per row) that
 * interpreter overhead IS the hot loop, so this is the "native Catalyst
 * Expression beats UDF beats composition" case from the design brief: one
 * tight fused loop, no intermediate array, inside whole-stage codegen.
 *
 * Semantics mirror the aggregate/zip_with composition exactly — same
 * left-to-right FP summation order (bitwise-identical results), null when
 * either array is null, when lengths differ (zip_with pads with null and
 * the fold absorbs it), or when any element is null.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true // null array => null result
  /** Nullable even over non-null children: length mismatch or a null
    * element yields null (the BinaryExpression default would derive
    * non-nullable from non-null inputs, making the output schema lie —
    * a collected row would then read the null slot as 0.0). */
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  int $i = 0;
         |  for (; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Row-level kernel behind NearestCentroids (static-forwarder object so
  * generated Java can call it — the GammaFuncs/TextKernels pattern). */
object VectorKernels {
  /** Indices of the `n` centroids nearest to `v` by squared L2, ordered by
    * (distance, index) — identical semantics (and FP arithmetic) to the
    * `d.sortBy(_._1).take(n)` driver formulation this replaced, where
    * Scala's stable sort breaks ties by centroid index. */
  def nearestCentroids(v: ArrayData, cents: ArrayData, n: Int): ArrayData = {
    val m = cents.numElements()
    val vd = v.toDoubleArray()
    val dist = new Array[Double](m)
    var i = 0
    while (i < m) {
      val ct = cents.getArray(i).toDoubleArray()
      var s = 0.0
      var j = 0
      while (j < ct.length) { val t = vd(j) - ct(j); s += t * t; j += 1 }
      dist(i) = s
      i += 1
    }
    val order = Array.range(0, m)
      .sortBy(i => (dist(i), i))(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
    new GenericArrayData(order.take(math.min(n, m)))
  }
}

/**
 * Indices of the n nearest centroids (squared L2, ties by index) for a
 * vector against a (typically literal/broadcast-sized) array of centroids.
 * Keeps IVF assignment/probing inside whole-stage codegen — the ScalaUDF
 * it replaced converted the vector AND the full centroid table to Scala
 * collections per row.
 */
case class NearestCentroids(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with Serializable {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any, c: Any): Any =
    VectorKernels.nearestCentroids(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.VectorKernels.nearestCentroids($v, $c, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroids =
    copy(left = l, right = r)
  override def prettyName: String = "vec_nearest_centroids"
}

/** Column facade for the vector expressions (functions-package style).
  * Inputs are cast to array<double> here — the expression is double-only. */
object vfunctions {
  private def arr(c: Column): Expression = {
    val e = shim.toExpr(c)
    e.dataType match {
      case ArrayType(DoubleType, _) => e
      case _ => Cast(e, ArrayType(DoubleType))
    }
  }
  private def arrArr(c: Column): Expression = {
    val e = shim.toExpr(c)
    e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => e
      case _ => Cast(e, ArrayType(ArrayType(DoubleType)))
    }
  }
  def vec_dot(a: Column, b: Column): Column = shim.toColumn(DotProduct(arr(a), arr(b)))
  /** ‖x‖₂ as sqrt(x·x) — same FP order as the sum-of-squares fold. */
  def vec_norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(vec_dot(a, a))
  /** indices of the n nearest centroids by squared L2 (ties by index) */
  def vec_nearest_centroids(v: Column, centroids: Column, n: Int): Column =
    shim.toColumn(NearestCentroids(arr(v), arrArr(centroids), n))
}
