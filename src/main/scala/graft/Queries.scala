package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** The operator-coverage query registry (SURVEY.md §2).
  *
  * Each entry is a Spark DataFrame pipeline over the TESTDATA.md parquet
  * tables plus, when the semantics are ANSI-SQL expressible, a DuckDB
  * oracle string with identical column aliases. Float aggregations are
  * cast to DECIMAL on both sides so the hash compare is order-insensitive.
  */
object Queries {

  private type Q = (SparkSession, String) => DataFrame

  private val entries = scala.collection.mutable.LinkedHashMap[String, (Q, Option[String])]()

  private def register(name: String, oracle: String)(fn: Q): Unit =
    entries(name) = (fn, Some(oracle))

  private def registerNoOracle(name: String)(fn: Q): Unit =
    entries(name) = (fn, None)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------------
  // SQL surface (SURVEY §2.5) — scheduled-query style aggregation
  // ---------------------------------------------------------------------------

  // TPC-H Q1 shape: the canonical historical-store aggregation
  // (reference delegates these to Athena; we are the engine).
  register(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
      |       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ---------------------------------------------------------------------------
  // Public accessors for SparkEntry
  // ---------------------------------------------------------------------------

  lazy val registry: Map[String, Q] = entries.map { case (k, (f, _)) => k -> f }.toMap
  lazy val oracles: Map[String, String] =
    entries.collect { case (k, (_, Some(o))) => k -> o }.toMap
}
