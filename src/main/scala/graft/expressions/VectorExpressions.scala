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

/** `round(x, 4)` for doubles WITHOUT the per-row BigDecimal: Spark's
  * RoundBase codegen allocates `BigDecimal.valueOf(x)` (through
  * `Double.toString`) for every row — measurable on the N²-pair cosine
  * scans (x06's cross join pays it 25M+ times). Delegates to
  * [[graft.functions.PortableMath.round4HalfUp]], the spec-pinned
  * bit-identical twin of that definition (PortableMathSpec sweeps the
  * .5 grid), from BOTH the interpreted and the generated path — so the
  * surrounding stage stays whole-stage-codegen. Null-safe like round(). */
case class Round4HalfUp(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "round4_half_up"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double input, got ${other.simpleString}")
  }

  override def nullSafeEval(x: Any): Any =
    graft.functions.PortableMath.round4HalfUp(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.PortableMath.round4HalfUp($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL of a vector's SRP band keys in one pass — the signature stage of
  * the LSH pair generators ([[graft.operators.Dedup.embeddingLshPairs]]
  * family) as a single native expression. The expression-chain form
  * (numPlanes separate `round(float_vec_dot(v, ±1-literal), 4) >= 0`
  * bits concat'd into band keys) overflows whole-stage codegen's
  * method budget once planes × dim grows — at 144 planes the generated
  * method blows past the JIT threshold and evaluation degrades to
  * per-expression interpreted calls (measured 27 s for a 20k×144
  * signature at the 10× fixture; this expression does the identical
  * arithmetic in one tight primitive loop per row — sub-second).
  *
  * Bit r of band b is `sign(round₄(Σᵢ v[i]·signs[b·stride+r][i]))`:
  * double accumulation in ascending index order then BigDecimal
  * HALF_UP at 4 dp — EXACTLY `round(float_vec_dot(...), 4) >= 0`, so
  * keys are bit-identical to the chain it replaces and to the DuckDB
  * oracles (spec-pinned in DedupSpec). `stride` is the plane-index
  * stride between consecutive bands (= bits for the dense layout;
  * maxBits for [[graft.operators.Dedup.embeddingLshPairsScaled]]'s
  * prefix-truncatable layout). CodegenFallback is fine here: one call
  * does bands×bits×dim work, so interpretation overhead is amortized. */
case class SrpBandKeys(child: Expression, signs: Array[Array[Float]],
    numBands: Int, bits: Int, stride: Int)
    extends Expression with UnaryLike[Expression]
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "srp_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v0 = child.eval(input)
    if (v0 == null) return null
    val v = v0.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val keys = new Array[AnyRef](numBands)
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder(bits)
      var r = 0
      while (r < bits) {
        val sv = signs(b * stride + r)
        val n = math.min(dim, sv.length)
        var s = 0.0
        var i = 0
        while (i < n) {
          s += v.getFloat(i).toDouble * sv(i).toDouble
          i += 1
        }
        // allocation-free round-4 sign (bit-identical to the BigDecimal
        // HALF_UP definition — see PortableMath.round4HalfUp)
        val nonNeg = graft.functions.PortableMath.round4HalfUp(s) >= 0.0
        sb.append(if (nonNeg) '1' else '0')
        r += 1
      }
      keys(b) = org.apache.spark.unsafe.types.UTF8String
        .fromString(sb.toString)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** ALL of a vector's per-subspace nearest-centroid codes in one pass —
  * the assignment stage of k-means / product quantization
  * ([[graft.operators.Similarity.trainKMeans]], [[graft.operators.Pq]])
  * as a single native expression, the [[SrpBandKeys]] pattern applied
  * to codebook argmax: the expression-chain form (a `transform` HOF over
  * a ksub-entry `typedlit` evaluating one [[FloatVecDot]] per centroid,
  * then `array_position(array_max(...))`) is interpreted per centroid
  * per row and re-materializes the csims array — at m=16 × ksub=128 it
  * dominated the PQ encode/reconstruct pass (x203's recon leg measured
  * 6.5 s warm over 4 000 rows; this expression does the identical
  * arithmetic in one tight primitive loop — tens of ms).
  *
  * Subspace j (0-based) scores `v[j·sub ..)` against `units(j)` in
  * input order: dot accumulation is the [[FloatVecDot]] fold verbatim
  * (ascending index, double precision, n = min of lengths), and the
  * argmax keeps the FIRST maximum under `java.lang.Double.compare` —
  * exactly `array_position(cs, array_max(cs)) - 1`, including the
  * -0.0 < 0.0 ordering. Output: array<int> of `units.length` codes.
  * CodegenFallback is fine here: one call does m×ksub×sub work, so
  * interpretation overhead is amortized (the SrpBandKeys argument). */
case class PqCodes(child: Expression, units: Array[Array[Array[Float]]],
    sub: Int)
    extends Expression with UnaryLike[Expression]
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v0 = child.eval(input)
    if (v0 == null) return null
    val v = v0.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val m = units.length
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val book = units(j)
      var best = Double.NegativeInfinity
      var bestC = 0
      var first = true
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        val n = math.min(math.min(sub, cv.length), math.max(dim - off, 0))
        var s = 0.0
        var i = 0
        while (i < n) {
          s += v.getFloat(off + i).toDouble * cv(i).toDouble
          i += 1
        }
        if (first || java.lang.Double.compare(s, best) > 0) {
          best = s; bestC = c; first = false
        }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VectorExpressions {
  /** Column-level handle for [[FloatVecDot]]. */
  def floatVecDot(a: Column, b: Column): Column =
    GraftSql.column(FloatVecDot(
      GraftSql.expression(a), GraftSql.expression(b)))

  /** Column-level handle for [[Round4HalfUp]] — drop-in for
    * `round(x, 4)` on double columns (bit-identical, no BigDecimal). */
  def round4(x: Column): Column =
    GraftSql.column(Round4HalfUp(GraftSql.expression(x)))

  /** Column-level handle for [[PqCodes]]. */
  def pqCodes(v: Column, units: IndexedSeq[Seq[Seq[Float]]],
      sub: Int): Column =
    GraftSql.column(PqCodes(GraftSql.expression(v),
      units.map(_.map(_.toArray).toArray).toArray, sub))

  /** Nearest-centroid cell for a single codebook (m = 1): the
    * `array_position(array_max(transform(...)))` argmax as one native
    * call — [[PqCodes]] with one subspace covering the whole vector. */
  def argmaxCell(v: Column, unit: Seq[Seq[Float]]): Column =
    org.apache.spark.sql.functions.element_at(
      pqCodes(v, IndexedSeq(unit), Int.MaxValue / 2), 1)

  /** Column-level handle for [[SrpBandKeys]]. */
  def srpBandKeys(v: Column, signs: Array[Array[Float]], numBands: Int,
      bits: Int, stride: Int): Column =
    GraftSql.column(SrpBandKeys(GraftSql.expression(v), signs,
      numBands, bits, stride))

  /** Column-level handle for [[FloatVecSumAgg]] (an aggregate function). */
  def floatVecSum(v: Column): Column =
    GraftSql.column(FloatVecSumAgg(GraftSql.expression(v))
      .toAggregateExpression())
}
