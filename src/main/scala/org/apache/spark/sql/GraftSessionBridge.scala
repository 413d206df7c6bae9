package org.apache.spark.sql

/** Access bridge to `SparkSession.cloneSession()` (declared
  * `private[sql]` in Spark): a clone shares the SparkContext and the
  * shared state (catalog, cache manager) but COPIES the session state —
  * per-session conf, temp views, and the registered function surface —
  * so a conf toggle on the clone can never leak into the parent
  * session's parse path. Used by
  * [[graft.history.ScheduledQueries.runPresto]] to scope
  * `spark.sql.ansi.doubleQuotedIdentifiers` to the query-pack dialect
  * without serializing against (or perturbing) concurrent plain
  * `spark.sql` callers. */
object GraftSessionBridge {
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()
}
