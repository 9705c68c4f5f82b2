package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RecordLinkage.linkScored: exact literal-sum scores, threshold
  * boundaries, block isolation, and the field-suffix contract. */
class RecordLinkageSpec extends SparkSpec {

  import RecordLinkage.FieldWeight

  private val fields = Seq(
    FieldWeight("name", col("name_l") === col("name_r"), 100L, -200L),
    FieldWeight("city", col("city_l") === col("city_r"), 50L, -75L))

  private def link(left: Seq[(Long, String, String, String)],
      right: Seq[(Long, String, String, String)],
      upper: Long, lower: Long) = {
    import spark.implicits._
    RecordLinkage.linkScored(
      left.toDF("id", "blk", "name", "city"),
      right.toDF("id", "blk", "name", "city"),
      "id", Seq("blk"), fields, upper, lower)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getString(5))))
      .toMap
  }

  test("scores are exact literal sums; decisions follow thresholds") {
    val out = link(
      left = Seq((1L, "b1", "ann", "rome"), (2L, "b1", "bob", "oslo")),
      right = Seq((10L, "b1", "ann", "rome"), (11L, "b1", "bob", "bern")),
      upper = 150L, lower = 0L)
    // (1,10): both agree  → 150 = upper boundary → match (>=)
    assert(out((1L, 10L)) == ((1, 1, 150L, "match")))
    // (2,11): name agrees, city disagrees → 100 - 75 = 25 → possible
    assert(out((2L, 11L)) == ((1, 0, 25L, "possible")))
    // (1,11): both disagree → -275 → non_match
    assert(out((1L, 11L)) == ((0, 0, -275L, "non_match")))
    // cross pair (2,10): -200 + (-75)? city oslo vs rome disagrees,
    // name bob vs ann disagrees → -275 → non_match
    assert(out((2L, 10L)) == ((0, 0, -275L, "non_match")))
  }

  test("blocking: pairs never cross block keys") {
    val out = link(
      left = Seq((1L, "b1", "ann", "rome")),
      right = Seq((10L, "b2", "ann", "rome")),
      upper = 150L, lower = 0L)
    assert(out.isEmpty, s"cross-block pair leaked: $out")
  }

  test("validation: empty fields and inverted thresholds are loud") {
    import spark.implicits._
    val df = Seq((1L, "b", "x", "y")).toDF("id", "blk", "name", "city")
    intercept[IllegalArgumentException] {
      RecordLinkage.linkScored(df, df, "id", Seq("blk"), Seq.empty, 1L, 0L)
    }
    intercept[IllegalArgumentException] {
      RecordLinkage.linkScored(df, df, "id", Seq("blk"), fields, 0L, 1L)
    }
  }
}
