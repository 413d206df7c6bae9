package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SCALE.md): AQE's skew-join handles most
  * cases at runtime; these explicit salting helpers cover the patterns AQE
  * cannot re-plan — stateful groupings and non-AQE-eligible joins — and
  * document the technique as a first-class engine tool.
  */
object Skew {

  /** Salted equi-join of a skewed big side against a small-ish side:
    * the big side gets a deterministic salt in [0, salts) derived from a
    * stable row fingerprint; the small side is replicated `salts`× so every
    * (key, salt) bucket finds its match. Replication factor × |small| rows
    * is the cost; the win is splitting a hot key across `salts` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial agg on
    * (key, salt), final agg on key. Spark's hash aggregate already does
    * map-side partials; this forces an intermediate REDUCTION for extreme
    * single-key skew where one reducer would otherwise take the whole key. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum("__partial").as("n"))
}
