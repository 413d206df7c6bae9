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

  /** Register (or REPLACE) a function in ONE session's own registry —
    * the clone's copy, never the parent's. This is what makes
    * pack-SCOPED semantic overrides possible: a Presto name whose
    * semantics CONFLICT with the same-named Spark builtin
    * (`regexp_extract` returning NULL vs `''` on no-match, `split_part`
    * NULL vs `''` out of range, `from_unixtime` returning TIMESTAMP vs
    * STRING) can be Presto-faithful inside `runPresto` while plain
    * `spark.sql` on the caller's session keeps Spark's documented
    * behavior. Session-wide injection could never do both. */
  def registerFunction(s: SparkSession,
      ident: catalyst.FunctionIdentifier,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[catalyst.expressions.Expression] =>
        catalyst.expressions.Expression): Unit =
    s.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
