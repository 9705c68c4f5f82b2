package graft.engine

import org.apache.spark.sql.SparkSession

/** Serialized mutation of session-global SQL confs.
  *
  * Spark SQL confs are SESSION-global: a save/set/restore around one
  * write can interleave with another thread's save/set/restore in the
  * same session (Project.run builds up to `target.threads` nodes
  * concurrently) and leak the temporary value into an unrelated plan —
  * e.g. dynamic partitionOverwriteMode bleeding into a static overwrite
  * that then silently keeps stale partitions. Every graft code path that
  * must flip a conf for the duration of an action routes through
  * [[withConf]], which holds one JVM-wide lock across set + action +
  * restore. Only the conf-sensitive sections serialize; the Spark jobs
  * they launch still use the full executor parallelism, and on a real
  * cluster the lock is driver-side only (confs are resolved at plan
  * time, not during distributed execution).
  */
object SessionConf {
  private val lock = new Object

  def withConf[T](spark: SparkSession, kvs: (String, String)*)(
      body: => T): T = lock.synchronized {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
