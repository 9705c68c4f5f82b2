package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — multi-dimensional data layout
  * (Morton, "A computer oriented geodetic data base", IBM 1966; the
  * technique behind Delta Lake's OPTIMIZE ZORDER and the classic UB-tree
  * of Bayer 1997): interleaving the bits of several dimensions produces
  * a single sort key under which nearby keys cover small HYPER-RECTANGLES
  * of the dimension space, so range predicates on ANY of the dimensions
  * prune most files — the layout answer when one sort column can't serve
  * every query pattern.
  *
  * The key builder is a pure loop-unrolled Column expression (shifts,
  * masks, adds — codegen'd, zero-shuffle, no UDF): bit k of dimension i
  * lands at position k·d + i. Inputs must already be NORMALIZED integer
  * ranks in [0, 2^bits) — normalization is the caller's contract (an
  * affine min/max scale or an exact-rank pass, whichever the data
  * demands); out-of-range or null values fail loudly rather than fold
  * into a wrong key.
  *
  * [[localityReport]] is the audit that makes the layout claim
  * checkable: bucket rows by the TOP bits of the z-key (= the files a
  * z-sorted writer would produce) and report each bucket's per-dimension
  * bounding box — z-ordering is working exactly when every bucket's box
  * is a small fraction of the full space on every dimension at once.
  * One per-row expression pass + one buckets-sized aggregation.
  */
object ZOrder {

  /** Morton-interleave already-normalized dims (each in [0, 2^bits)).
    * d·bits must fit in a sign-safe long (≤ 62 bits). */
  def interleave(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    require(d >= 2 && d <= 4, s"interleave wants 2..4 dims, got $d")
    require(bits >= 1 && bits * d <= 62,
      s"bits*dims must be <= 62, got $bits*$d")
    (for (k <- 0 until bits; i <- 0 until d) yield
      shiftleft(shiftright(dims(i), k).bitwiseAND(lit(1L)), k * d + i))
      .reduce(_ + _)
  }

  /** Input plus a `zkey` column from `dimCols` (long columns already in
    * [0, 2^bits); null/out-of-range fails loudly). */
  def zkey(df: DataFrame, dimCols: Seq[String], bits: Int,
      out: String = "zkey"): DataFrame = {
    val lim = 1L << bits
    val checked = dimCols.map { n =>
      val c = col(n).cast("long")
      when(c.isNull || c < 0L || c >= lim,
        raise_error(concat(lit(s"ZOrder: dim '$n' value "),
          coalesce(col(n).cast("string"), lit("NULL")),
          lit(s" outside [0, $lim) — normalize dims before keying")))
          .cast("long"))
        .otherwise(c)
    }
    df.withColumn(out, interleave(checked, bits))
  }

  /** Per-z-bucket bounding boxes: bucket = zkey >> shift (so
    * 2^(bits·d − shift) buckets = the z-sorted writer's files), with
    * per-dim min/max and row count. Tight boxes on EVERY dim = the
    * z-order locality claim, audited. */
  def localityReport(df: DataFrame, dimCols: Seq[String], bits: Int,
      shift: Int): DataFrame = {
    val d = dimCols.size
    require(shift >= 0 && shift < bits * d,
      s"shift must be in [0, ${bits * d}), got $shift")
    val keyed = zkey(df, dimCols, bits)
      .withColumn("bucket", shiftright(col("zkey"), shift))
    val aggs = count(lit(1)).as("n") +: dimCols.flatMap(n =>
      Seq(min(col(n)).cast("long").as(s"${n}_min"),
        max(col(n)).cast("long").as(s"${n}_max")))
    keyed.groupBy(col("bucket")).agg(aggs.head, aggs.tail: _*)
  }
}
