package graft.operators

import org.apache.spark.sql.SparkSession

/** Scoped SparkSession-conf overrides for batch queries (the batch
  * sibling of `EventStreams.withStreamConf`): set, run, restore.
  * Bodies serialize on one JVM-wide lock because the window mutates
  * SHARED session conf — two concurrent scopes on the same session
  * would race the set/restore and could leave the wrong values pinned.
  * Verify/Bench run queries sequentially, so the lock is normally
  * uncontended; true parallel use should clone with `newSession()`
  * instead (independent conf, no lock needed).
  *
  * IMPORTANT for lazily-executed DataFrames: Spark applies most conf
  * at EXECUTION time, not plan-build time — a query that must run
  * under the overrides has to be materialized inside `body`
  * (e.g. `localCheckpoint(true)`), not just constructed.
  */
object ConfScope {

  private val lock = new Object

  def withConf[T](spark: SparkSession, confs: Map[String, String])(body: => T): T =
    lock.synchronized {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
}
