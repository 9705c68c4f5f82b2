package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** mergeRetractionLedger semantics beyond the LedgerInvariantsSpec
  * sweep: the loud negative-net guard and the fully-deleted-group
  * zero row (current state, not absence). */
class RetractionLedgerSpec extends SparkSpec {

  test("negative net live rows fail loudly") {
    import spark.implicits._
    val l = Seq((1L, 1L, 10L, 0L), (1L, -2L, -20L, 1L))
      .toDF("bucket", "rows_delta", "value_delta", "batch_id")
    val e = intercept[Exception] {
      EventStreams.mergeRetractionLedger(l, "bucket").collect()
    }
    assert(e.getMessage.contains("without matching insert"), e.getMessage)
  }

  test("fully-deleted group reports a zero position, not absence") {
    import spark.implicits._
    val l = Seq((1L, 2L, 30L, 0L), (1L, -2L, -30L, 1L),
      (2L, 1L, 5L, 1L))
      .toDF("bucket", "rows_delta", "value_delta", "batch_id")
    val out = EventStreams.mergeRetractionLedger(l, "bucket")
      .orderBy(col("bucket")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 1L, 5L)))
  }
}
