package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion-impact audit — the right-to-be-forgotten planning step: a
  * takedown/opt-out list arrives, training shards are immutable files,
  * so the question is WHICH shards a delete set touches and what the
  * rewrite costs (GDPR art.17-driven deletes hit published corpora as
  * id lists; the pipeline answer is an impact report over the shard
  * manifest, not an in-place mutation). Per shard: document and byte
  * volumes, how much of each the delete list covers, and whether the
  * shard needs a rewrite at all — untouched shards are skipped by the
  * rewrite job, the x65/InsertOverwrite incremental discipline.
  *
  * Scale shape: the delete list joins the assignment on the id (ids are
  * the join key — AQE broadcasts a small list; a huge one shuffles both
  * sides exactly once), then ONE per-shard aggregation; shares are
  * integer half-up micro-rounded at 6dp. Deletes for unknown ids are
  * counted separately (`n_unmatched` on every row via a 1-row
  * broadcast) — a takedown id that matches nothing is an audit finding,
  * not silence. */
object DeletionImpact {

  /** Per-shard report: (shard, n_docs, n_bytes, n_deleted,
    * deleted_bytes, share_docs_deleted, share_bytes_deleted,
    * needs_rewrite, n_unmatched). `deletes` is a one-column id list
    * (duplicates collapse); ids carrying no assignment count into
    * `n_unmatched` only. */
  def report(assigned: DataFrame, deletes: DataFrame, idCol: String,
      shardCol: String, sizeCol: String): DataFrame = {
    val del = deletes.select(col(idCol)).distinct()
      .withColumn("__del", lit(1L))
    val marked = assigned
      .select(col(idCol), col(shardCol).as("shard"),
        col(sizeCol).cast("long").as("__sz"))
      .join(del, Seq(idCol), "left")
    val perShard = marked.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__sz")).as("n_bytes"),
        sum(coalesce(col("__del"), lit(0L))).as("n_deleted"),
        sum(when(col("__del").isNotNull, col("__sz")).otherwise(lit(0L)))
          .as("deleted_bytes"))
    val unmatched = del.join(
        assigned.select(col(idCol)), Seq(idCol), "left_anti")
      .agg(count(lit(1)).as("n_unmatched"))
    perShard.crossJoin(broadcast(unmatched))
      .select(col("shard"), col("n_docs"), col("n_bytes"),
        col("n_deleted"), col("deleted_bytes"),
        expr("CAST((n_deleted*2000000 + n_docs) DIV (2*n_docs) " +
          "AS DOUBLE)/1000000.0").as("share_docs_deleted"),
        expr("CASE WHEN n_bytes > 0 THEN " +
          "CAST((deleted_bytes*2000000 + n_bytes) DIV (2*n_bytes) " +
          "AS DOUBLE)/1000000.0 ELSE 0.0 END").as("share_bytes_deleted"),
        (col("n_deleted") > 0).as("needs_rewrite"),
        col("n_unmatched"))
  }
}
