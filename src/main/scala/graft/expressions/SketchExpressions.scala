package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; merge analysis
  * in Agarwal et al., "Mergeable Summaries", PODS 2012) as a native
  * aggregate — the bounded-state path to "top terms at 100 TB", where the
  * exact answer is a full shuffle of the distinct-term set (x25's TF-IDF
  * shape) but the sketch is one map-side pass with a `capacity`-entry
  * summary per task.
  *
  * Guarantees (the x70 self-adjudication contract):
  *  - each per-partition summary holds ≤ `capacity` entries, and an
  *    entry's estimate undercounts its partition-local frequency by at
  *    most n_p/(capacity+1) (each decrement round retires capacity+1
  *    occurrences);
  *  - the merge is a pointwise SUM of summaries — commutative and
  *    associative, so shuffle-fetch order cannot change the result (the
  *    merged map is bounded by map-tasks × capacity, never truncated
  *    mid-merge; truncation to `capacity` happens once, at eval, on the
  *    order-independent merged map);
  *  - summed undercounts telescope: est(x) ∈ [f(x) − n/(capacity+1), f(x)],
  *    and any term with global frequency > n/(capacity+1) must exceed the
  *    local threshold in at least one partition (pigeonhole), so it
  *    SURVIVES into the merged summary.
  *
  * Output: array<struct<term string, est long>> sorted (est desc, term
  * asc) — the ENTIRE merged summary, bounded by map-tasks × capacity
  * entries (index-metadata scale, like the IVF centroid tables), never
  * truncated: cutting to `capacity` at eval could evict a true heavy
  * hitter whose estimate sits just above its guarantee floor beneath a
  * crowd of mid-estimate tail terms, voiding the presence guarantee.
  * Callers take the prefix they need.
  */
case class MisraGriesTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {
  require(capacity >= 1, "capacity must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](capacity * 2)

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val term = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(term)
    if (cur != 0L || buf.containsKey(term)) buf.put(term, cur + 1L)
    else if (buf.size < capacity) buf.put(term, 1L)
    else {
      // decrement round: the new term and every stored term each give up
      // one occurrence — capacity+1 total per round, hence the bound
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    val it = from.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = into.get(e.getKey)
      into.put(e.getKey, cur + e.getValue)
    }
    into
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val top = entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(top.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      m.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * native aggregate — the POINT-FREQUENCY complement to
  * [[MisraGriesTopK]]: MG answers "which terms are heavy", CM answers
  * "how often did THIS term occur" for any term, in `depth × width`
  * longs of state per task regardless of corpus size.
  *
  * Each of the `depth` rows hashes a term to one of `width` counters and
  * increments it; the estimate for a term is the MIN of its `depth`
  * counters. Guarantees:
  *  - est(x) >= f(x) always (counters only ever over-count — every
  *    occurrence of x lands in all of x's counters);
  *  - est(x) <= f(x) + 2n/width per row with probability >= 1/2
  *    (Markov on the colliding mass), so >= 1 − 2^−depth after the min.
  *
  * The buffer is a flat long[depth*width]; merge is pointwise sum —
  * commutative, associative, order-independent — which is exactly why
  * the STANDARD update is used and not the conservative-update variant
  * (Estan & Varghese 2002): conservative update reads the current min
  * before incrementing, making the sketch depend on arrival order and
  * breaking partial-aggregation mergeability.
  *
  * The row-d bucket of term t is the first 32 bits of md5("d:" + t) mod
  * width — reproducible in plain SQL on BOTH engines
  * (`conv(substr(md5(concat('d:', t)), 1, 8), 16, 10) % width`), so an
  * oracle can rebuild the whole sketch and the estimates are
  * exact-checkable, not verdict-only.
  *
  * Output: array<long> of length depth*width, row-major (row d occupies
  * [d*width, (d+1)*width)).
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
  require(width >= 2, "width must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val term = v.asInstanceOf[UTF8String].toString
    var d = 0
    while (d < depth) {
      buf(d * width + CountMinSketch.bucket(d, term, width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
    copy(child = newChild)
}

object CountMinSketch {
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Row-d bucket of `term`: first 32 bits of md5("d:" + term), as an
    * unsigned value, mod width — the exact integer SQL
    * `conv(substr(md5(concat('d:', term)), 1, 8), 16, 10) % width`
    * computes. */
  def bucket(d: Int, term: String, width: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val h = md.digest(s"$d:$term"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (u % width).toInt
  }
}

/** KMV (k-minimum-values) distinct-value sketch (Bar-Yossef et al.
  * RANDOM'02; estimators and multiset-operation analysis in Beyer, Haas,
  * Reinwald, Sismanis & Gemulla, SIGMOD 2007) as a native aggregate —
  * the SET-OPERATION member of the sketch family: HLL (x70) answers
  * "how many distinct", but two HLLs cannot intersect; two KMV sketches
  * over the SAME hash function compose under union AND intersection
  * (Broder's bottom-k coordinated sample, "On the resemblance and
  * containment of documents", SEQUENCES 1997), giving cross-source
  * distinct-overlap estimates in k longs of state per group regardless
  * of corpus size.
  *
  * The buffer holds the k SMALLEST DISTINCT hash values seen; merge is
  * set-union-then-truncate — commutative, associative, and idempotent on
  * duplicates, so partial aggregation and shuffle-fetch order cannot
  * change the result. Hashes are supplied BY THE CALLER as longs from an
  * engine-portable integer expression (first 48 bits of md5 — the x87
  * discipline), so an oracle rebuilds the identical sketch with window
  * SQL and the ESTIMATES are exact-checkable, not verdict-only.
  *
  * Guarantees (Beyer et al. §4): with U(k) the k-th smallest hash as a
  * fraction of the hash space, (k−1)/U(k) is the unbiased distinct-count
  * estimator with relative standard error ~ 1/sqrt(k−2); a sketch
  * holding fewer than k values IS the complete distinct hash set (the
  * estimate is exact). Output: array<long>, ascending.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  require(k >= 2 && k <= 65536, "k must be in [2, 65536]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint (a portable integer hash), got " +
        other.simpleString)
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = v.asInstanceOf[Long]
    if (buf.size < k) buf.add(h)
    else if (h < buf.last) { if (buf.add(h)) buf.pollLast() }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new Array[Byte](4 + buf.size * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bytes
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object SketchExpressions {
  /** Column handle for [[MisraGriesTopK]] (an aggregate function). */
  def misraGriesTopK(term: Column, capacity: Int): Column =
    GraftSql.column(MisraGriesTopK(GraftSql.expression(term), capacity)
      .toAggregateExpression())

  /** Column handle for [[CountMinSketch]] (an aggregate function). */
  def countMinSketch(term: Column, depth: Int, width: Int): Column =
    GraftSql.column(CountMinSketch(GraftSql.expression(term), depth, width)
      .toAggregateExpression())

  /** Column handle for [[KmvSketch]] (an aggregate function); `hash`
    * must be a bigint from an engine-portable expression, canonically
    * `conv(substr(md5(x), 1, 12), 16, 10)` (48 bits — no sign trap). */
  def kmvSketch(hash: Column, k: Int): Column =
    GraftSql.column(KmvSketch(GraftSql.expression(hash), k)
      .toAggregateExpression())
}
