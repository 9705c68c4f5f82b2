package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for queries the DuckDB oracle can't hash-check. */
class CoreQueriesSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("e"))
    approx.join(exact, "l_returnflag").collect().foreach { r =>
      val (a, e) = (r.getAs[Long]("a").toDouble, r.getAs[Long]("e").toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: approx $a exact $e")
    }
  }

  test("every oracle-less query still returns rows") {
    graft.SparkEntry.queries.keys
      .filterNot(graft.SparkEntry.oracleSql.keySet)
      .foreach { name =>
        val n = graft.SparkEntry.queries(name)(spark, sf0001).count()
        assert(n > 0, s"$name returned no rows")
      }
  }
}
