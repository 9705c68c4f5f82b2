package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev utility + the shared shuffle-counting rule behind ScaleSpec's
  * registry-wide budgets: print `name shuffle-count` for every registered
  * query (or the names passed as args). Usage: PlanAudit [sfDir] */
object PlanAudit {

  /** Count SHUFFLE exchanges in a physical-plan string: hash/range/
    * single-partition Exchange nodes, excluding BroadcastExchange and
    * ReusedExchange lines (whose simpleString embeds the reused child's
    * 'Exchange ...' text and would double-count). */
  private val shuffleEx =
    "(?<!Broadcast)Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r

  def shuffleCount(plan: String): Int = plan.linesIterator
    .filterNot(_.contains("ReusedExchange"))
    .map(l => shuffleEx.findAllIn(l).size).sum

  def shuffleCount(df: DataFrame): Int =
    shuffleCount(df.queryExecution.executedPlan.toString)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n =
        try shuffleCount(fn(spark, sfDir)).toString
        catch { case e: Throwable => s"ERR ${e.getMessage.take(80)}" }
      println(s"[planaudit] $name $n")
    }
    spark.stop()
  }
}
