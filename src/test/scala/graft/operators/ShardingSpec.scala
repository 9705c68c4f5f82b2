package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharding.rebalancePlan: the HRW minimal-disruption invariant, mass
  * conservation, summary math, and validation. */
class ShardingSpec extends SparkSpec {

  private def plan(n: Int, nOld: Int, nNew: Int) = {
    import spark.implicits._
    Sharding.rebalancePlan((1L to n).toDF("id"), "id", nOld, nNew)
  }

  test("HRW grow: moved keys land ONLY on the new shards; mod doesn't") {
    val p = plan(400, 3, 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4)))
    // rendezvous: a key's winner among 4 differs from its winner among 3
    // only when shard 3 wins — every moved row's new_shard must be 3
    val hrwMoved = p.filter(r => r._1 == "hrw" && r._5)
    assert(hrwMoved.nonEmpty && hrwMoved.forall(_._3 == 3), hrwMoved.toSeq)
    // naive mod: at least one key moves between two OLD shards
    val modCross = p.filter(r =>
      r._1 == "mod" && r._5 && r._3 < 3)
    assert(modCross.nonEmpty, "mod-hash should remap across old shards")
    // mass conservation: each strategy accounts for every input row
    Seq("mod", "hrw").foreach { s =>
      assert(p.filter(_._1 == s).map(_._4).sum == 400L, s)
    }
  }

  test("HRW shrink: orphans of removed shards redistribute, others stay") {
    val p = plan(300, 4, 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getBoolean(4)))
    // every hrw move must originate from the removed shard 3
    val hrwMoved = p.filter(r => r._1 == "hrw" && r._4)
    assert(hrwMoved.nonEmpty && hrwMoved.forall(_._2 == 3), hrwMoved.toSeq)
  }

  test("summary: moved fraction is the truncating micro ratio") {
    val s = Sharding.rebalanceSummary(plan(400, 3, 4))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (tot, moved, micro) = s("hrw")
    assert(tot == 400L && micro == moved * 1000000L / 400L, s)
    // HRW expected movement is (M-N)/M = 25%; allow generous slack
    assert(moved > 40 && moved < 160, s"hrw moved $moved of 400")
    val (_, movedMod, _) = s("mod")
    assert(movedMod > moved, "mod must move more than rendezvous")
  }

  test("validation: equal or non-positive shard counts are loud") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sharding.rebalancePlan(df, "id", 4, 4)
    }
    intercept[IllegalArgumentException] {
      Sharding.rebalancePlan(df, "id", 0, 4)
    }
  }
}
