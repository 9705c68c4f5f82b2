package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for `array<float>` dot products.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element and allocates an intermediate array per row —
  * at N² pairs × 64 dims that dominated the all-pairs similarity scans.
  * This expression reads both `ArrayData` buffers directly inside
  * whole-stage codegen: one fused loop, zero allocation.
  *
  * Summation is a sequential left fold in double precision — the same
  * order as the HOF version, so oracle results are unchanged.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  // Strictly array<float>: getFloat on a double-backed ArrayData would
  // silently read garbage, so reject any other element type at analysis.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Element-wise sum aggregate over `array<float>` columns → array<double>.
  *
  * A native TypedImperativeAggregate so vector means (k-means training,
  * centroid updates) are ONE hash aggregation with map-side partial
  * combine: each partition reduces to a single dim-width double buffer and
  * only k×dim partial sums cross the shuffle — versus posexplode, which
  * shuffles rows×dim exploded rows. Rows with null/mismatched-length
  * arrays are skipped (first non-empty row fixes the dimensionality).
  */
case class FloatVecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "float_vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.isEmpty) new Array[Double](n) else buf
    if (n == acc.length) {
      var i = 0
      while (i < n) { acc(i) += arr.getFloat(i); i += 1 }
    }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FloatVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FloatVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FloatVecSumAgg =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level handle for [[FloatVecDot]]. */
  def floatVecDot(a: Column, b: Column): Column =
    GraftSql.column(FloatVecDot(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** Column-level handle for [[FloatVecSumAgg]] (an aggregate function). */
  def floatVecSum(v: Column): Column =
    GraftSql.column(FloatVecSumAgg(GraftSql.expression(v))
      .toAggregateExpression())
}
