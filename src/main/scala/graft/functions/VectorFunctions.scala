package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns.
  *
  * Implemented with `zip_with`/`aggregate` higher-order functions in
  * *double* precision (float×float is exact in double; only the summation
  * order can differ across engines, which the oracles absorb by rounding).
  * No UDFs — these are Catalyst expressions and distribute trivially.
  */
object VectorFunctions {

  /** Dot product in double precision (sequential left fold). Backed by the
    * codegen'd [[graft.expressions.FloatVecDot]]; `dotHof` is the
    * higher-order-function reference implementation it must agree with. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.floatVecDot(a, b)

  /** HOF reference implementation of [[dot]] (interpreted; kept for
    * cross-checking the native expression in tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers should round before cross-engine compare. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine against a precomputed norm column (avoids recomputing norms
    * inside an all-pairs join — the norms are computed once per side). */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Symmetric int8 quantization scale: max|x| / 127 (floored at 1e-12 so
    * zero vectors don't divide by zero). 4× memory over float32 — the
    * standard ANN-index compression step. */
  def quantScale(v: Column): Column =
    greatest(array_max(transform(v, x => abs(x.cast("double")))) / 127.0,
      lit(1e-12))

  /** Quantized values (round-half-up, as DuckDB does) given a STAGED
    * scale attribute — pass `col("scale")`, not the [[quantScale]]
    * expression (HOF lambdas re-evaluate captured expression trees). */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") / scale).cast("long"))

  /** Max absolute reconstruction error of the quantized vector. */
  def quantMaxError(qv: Column, v: Column, scale: Column): Column =
    array_max(zip_with(qv, v, (q, x) => abs(q * scale - x.cast("double"))))
}
