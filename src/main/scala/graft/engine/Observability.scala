package graft.engine

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, JobSucceeded}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Per-query attribution — the engine-side analogue of the reference's
  * yuki_snowflake_dbt_tags package + its README analysis query
  * (`/root/reference/README.md:102-119`): every model build runs under a
  * job group whose description is a JSON tag (see [[QueryTags]]); this
  * listener captures each Spark job's group tag and wall time, and
  * [[Observability.report]] reproduces the README query's shape —
  * avg execution time + execution count grouped by job/model/
  * materialization, ordered by avg desc.
  */
final class RunResultsListener extends SparkListener {

  final case class JobRecord(jobId: Int, tag: String, startMs: Long,
      var endMs: Long = -1L, var succeeded: Boolean = false)

  private val jobs = mutable.Map[Int, JobRecord]()

  override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
    val tag = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description")))
      .getOrElse("")
    jobs(e.jobId) = JobRecord(e.jobId, tag, e.time)
  }

  override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
    jobs.get(e.jobId).foreach { r =>
      r.endMs = e.time
      r.succeeded = e.jobResult == JobSucceeded
    }
  }

  /** Completed job records as rows (tag JSON still packed). */
  def snapshot: Seq[(Int, String, Long, Boolean)] = synchronized {
    jobs.values.toSeq.sortBy(_.jobId)
      .filter(_.endMs >= 0)
      .map(r => (r.jobId, r.tag, r.endMs - r.startMs, r.succeeded))
  }
}

object Observability {

  /** Install a listener on the session; returns it for later reporting. */
  def attach(spark: SparkSession): RunResultsListener = {
    val l = new RunResultsListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  /** Raw per-job run results as a DataFrame (tag fields extracted). */
  def runResults(spark: SparkSession, l: RunResultsListener): DataFrame = {
    import spark.implicits._
    l.snapshot.toDF("job_id", "tag", "execution_ms", "succeeded")
      .withColumn("job", get_json_object(col("tag"), "$.job"))
      .withColumn("dbt_model", get_json_object(col("tag"), "$.dbt_model"))
      .withColumn("materialization", get_json_object(col("tag"), "$.materialization"))
      .withColumn("invocation_id", get_json_object(col("tag"), "$.invocation_id"))
      .filter(col("dbt_model").isNotNull)
      .drop("tag")
  }

  /** The README.md:109-119 analysis query, reproduced over captured
    * metrics: GROUP BY ALL job/model/materialization, AVG + COUNT,
    * ORDER BY avg desc. */
  def report(spark: SparkSession, l: RunResultsListener): DataFrame =
    runResults(spark, l)
      .groupBy(col("job"), col("dbt_model"), col("materialization"))
      .agg(avg(col("execution_ms")).as("average_execution_ms"),
        count(lit(1)).as("executions"))
      .orderBy(col("average_execution_ms").desc)

  /** Persist run results for later analysis (the reference keeps them in
    * Snowflake query_history; we land a parquet table). */
  def persist(spark: SparkSession, l: RunResultsListener, table: String): Unit =
    runResults(spark, l).write.mode("append").format("parquet")
      .saveAsTable(table)
}
