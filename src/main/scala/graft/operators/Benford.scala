package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Benford first-digit audit (Newcomb 1881 / Benford 1938; Nigrini's
  * forensic-accounting application, JoA 1999) — the data-quality smoke
  * test for naturally-occurring numeric columns: amounts spanning
  * orders of magnitude should put ~30.1% of first digits on 1 and
  * ~4.6% on 9; synthetic, capped, copy-pasted, or fabricated columns
  * deviate hard. Cheap enough to run on every ingest alongside the
  * x140 profile.
  *
  * Inputs must be INTEGRAL columns (pre-quantize money to cents — the
  * Profiler convention; enforced on the analyzed dtype, never a silent
  * cast, the x157 lesson). Zeros and nulls are outside Benford's
  * domain (no leading significant digit) and are EXCLUDED from both
  * the counts and the shares — the report audits significant leading
  * digits, not completeness (x140 profiles nulls); the oracle mirrors
  * the exclusion. The first digit of |v| as rendered in base 10 is
  * engine-portable because BIGINT-to-string rendering is (doubles are
  * not — hence the integral contract).
  *
  * Scale shape: one stacked per-row expression pass + ONE map-side-
  * combined (column, digit) count aggregation (9 rows per column);
  * shares re-aggregate the 9-row frame; expected shares are pinned
  * micro literals of log10(1 + 1/d), so the whole report is
  * integer-exact.
  *
  * Returns (column_name, digit, n, share_micro, benford_micro,
  * dev_micro) — dev is |share − expected|, the per-digit deviation a
  * monitor thresholds on. */
object Benford {

  /** floor(log10(1 + 1/d) · 10⁶) for d = 1..9. */
  private val expectedMicro: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
    5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  def firstDigitReport(df: DataFrame,
      cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "benford: need at least one column")
    val names = cols.map(_._1)
    require(names.distinct.size == names.size,
      s"benford: duplicate column names: $names")
    cols.foreach { case (n, c) =>
      val dt = df.select(c).schema.head.dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"benford: column '$n' is $dt — first digits are only " +
          "engine-portable for integral types; pre-quantize (e.g. " +
          "round(x*100) cents) first")
    }
    val stacked = df.select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("column_name"), c.cast("long").as("v"))
      }: _*)).as("s"))
      .select(col("s.column_name").as("column_name"), col("s.v").as("v"))
    val counts = stacked
      .filter(col("v").isNotNull && col("v") =!= 0L)
      .withColumn("digit",
        substring(abs(col("v")).cast("string"), 1, 1).cast("int"))
      .groupBy(col("column_name"), col("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("column_name"))
      .agg(sum(col("n")).as("__nt"))
      .withColumnRenamed("column_name", "__cn")
    val expected = expectedMicro.foldLeft(lit(null).cast("long")) {
      case (acc, (d, m)) => when(col("digit") === d, m).otherwise(acc)
    }
    counts.join(totals, col("column_name") === col("__cn"))
      .withColumn("share_micro", expr("n * 1000000 DIV __nt"))
      .withColumn("benford_micro", expected)
      .withColumn("dev_micro",
        abs(col("share_micro") - col("benford_micro")))
      .select(col("column_name"), col("digit"), col("n"),
        col("share_micro"), col("benford_micro"), col("dev_micro"))
  }
}
