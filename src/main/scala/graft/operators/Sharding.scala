package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard-rebalancing planning — the data-ops question before any
  * re-partition of a 100 TB corpus: "if I grow N shards to M, what
  * fraction of the data moves?" Two strategies are planned side by
  * side over one scan:
  *
  *  - `mod`: shard = hash(id) mod N — the naive layout; growing N
  *    remaps almost everything (expected stay fraction 1/lcm-ish,
  *    ≈ N/M only when N divides M).
  *  - `hrw`: Highest-Random-Weight / rendezvous hashing (Thaler &
  *    Ravishankar, IEEE/ACM ToN 1998) — shard = argmax over s of
  *    hash(id, s); growing N→M moves EXACTLY the keys whose new
  *    winner is one of the added shards, expected (M−N)/M — the
  *    minimal-disruption property consistent hashing buys.
  *
  * The hash primitive is the engine-portable md5 (first-8-hex-chars
  * bucket for mod, full-hex lexicographic argmax for hrw — ties would
  * need an md5 collision, and both engines break them first-index
  * anyway). Everything is one per-row expression pass over the id
  * column + ONE (strategy, old, new) count aggregation — the per-row
  * argmax is O(M) over a literal-sized shard list, no joins, no
  * windows; the movement matrix is ≤ 2·N·M rows.
  */
object Sharding {

  private def hrwShard(idStr: org.apache.spark.sql.Column, n: Int) = {
    val arr = transform(sequence(lit(0), lit(n - 1)),
      s => md5(concat(idStr, lit(":"), s.cast("string"))))
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  private def modShard(idStr: org.apache.spark.sql.Column, n: Int) =
    pmod(conv(substring(md5(idStr), 1, 8), 16, 10).cast("long"), lit(n))
      .cast("int")

  /** Movement matrix (strategy, old_shard, new_shard, n_rows, moved)
    * for re-sharding `nOld` → `nNew`, both strategies. */
  def rebalancePlan(df: DataFrame, idCol: String, nOld: Int,
      nNew: Int): DataFrame = {
    require(nOld >= 1 && nNew >= 1 && nOld != nNew,
      s"bad shard counts $nOld -> $nNew")
    val idStr = col(idCol).cast("string")
    val assigned = df.select(
      modShard(idStr, nOld).as("mod_old"),
      modShard(idStr, nNew).as("mod_new"),
      hrwShard(idStr, nOld).as("hrw_old"),
      hrwShard(idStr, nNew).as("hrw_new"))
    assigned
      .select(explode(array(
        struct(lit("mod").as("strategy"), col("mod_old").as("old_shard"),
          col("mod_new").as("new_shard")),
        struct(lit("hrw").as("strategy"), col("hrw_old").as("old_shard"),
          col("hrw_new").as("new_shard")))).as("r"))
      .select(col("r.*"))
      .groupBy("strategy", "old_shard", "new_shard")
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("moved", col("old_shard") =!= col("new_shard"))
  }

  /** Per-strategy movement summary: (strategy, n_total, n_moved,
    * moved_micro) — the number a capacity plan quotes. */
  def rebalanceSummary(plan: DataFrame): DataFrame =
    plan.groupBy("strategy")
      .agg(sum(col("n_rows")).as("n_total"),
        sum(when(col("moved"), col("n_rows")).otherwise(lit(0L)))
          .as("n_moved"))
      .withColumn("moved_micro", expr("n_moved * 1000000 div n_total"))
}
