package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The operator-coverage query registry (SURVEY.md §2).
  *
  * Each entry is a Spark DataFrame pipeline over the TESTDATA.md parquet
  * tables plus, when the semantics are ANSI-SQL expressible, a DuckDB
  * oracle string with identical column aliases. Money aggregations use
  * exact integer-cents arithmetic — floor(x*100 + 0.5) on both sides — so
  * the hash compare is summation-order-insensitive (see the q1 comment).
  *
  * Registrations live in per-family trait files under `graft/queries/`
  * ([[SqlQueries]], [[ClassifyQueries]], [[RulesQueries]],
  * [[AlertsQueries]], [[DedupQueries]], [[AnnQueries]], [[TextQueries]],
  * [[EvalQueries]], [[PipelineQueries]]) sharing [[RegistryBase]]'s
  * `register` API; this object mixes them into the one registry that
  * Verify/Bench/SparkEntry consume.
  */
object Queries
    extends SqlQueries with ClassifyQueries with RulesQueries
    with AlertsQueries with DedupQueries with AnnQueries
    with TextQueries with EvalQueries with PipelineQueries {

  lazy val registry: Map[String, (SparkSession, String) => DataFrame] =
    entries.map { case (k, (f, _)) => k -> f }.toMap
  lazy val oracles: Map[String, String] =
    entries.collect { case (k, (_, Some(o))) => k -> o }.toMap
}
