package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dolma-style tag-then-filter curation (Soldaini et al. 2024): attribute
  * TAGGING (the expensive corpus pass) is decoupled from FILTERING (a
  * cheap declarative config over the skinny per-doc attribute table), so
  * iterating on thresholds — the loop a curation team actually runs —
  * never re-runs the taggers. At 100 TB the attribute table is ~10⁻³ of
  * corpus bytes; a config change costs one attribute-table scan instead
  * of a corpus re-read.
  *
  * The reference's engine has no curation surface; this module composes
  * graft's own proven taggers ([[TextAnalysis]] quality/langid/
  * repetition, the d1 fingerprint verdict) behind one attribute schema.
  */
object Curation {

  /** One declarative filter rule: attribute, comparator, literal.
    * Literals parse boolean first, then numeric, else compare as string
    * (string/boolean literals support `==`/`!=` only). */
  final case class AttrRule(attr: String, op: String, value: String) {
    def toColumn: Column = {
      val c = col(attr)
      def cmp[T](v: T): Column = op match {
        case ">=" => c >= v
        case ">"  => c > v
        case "<=" => c <= v
        case "<"  => c < v
        case "==" => c === v
        case "!=" => c =!= v
        case other =>
          throw new IllegalArgumentException(s"unknown comparator '$other'")
      }
      value.toLowerCase match {
        case "true" | "false" =>
          require(op == "==" || op == "!=",
            s"boolean rule on '$attr' supports ==/!= only")
          cmp(value.toLowerCase.toBoolean)
        case _ => value.toDoubleOption match {
          case Some(d) => cmp(d)
          case None =>
            require(op == "==" || op == "!=",
              s"string rule on '$attr' supports ==/!= only")
            cmp(value)
        }
      }
    }
  }

  /** AND of all rules (empty config keeps everything). */
  def compileConfig(rules: Seq[AttrRule]): Column =
    rules.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))

  /** Filter an attribute table (or any frame carrying the attribute
    * columns) by a declarative config. */
  def applyConfig(attrs: DataFrame, rules: Seq[AttrRule]): DataFrame =
    attrs.where(compileConfig(rules))

  /** The tagging pass: ONE corpus scan computes every scan-side
    * attribute (token/char counts, quality, language, repetition), plus
    * the exact-dedup canonical verdict (is this doc the min-id holder of
    * its normalized-text fingerprint?) — one md5-keyed pre-combined
    * groupBy and a hash-keyed join back; document text never shuffles
    * (only the 16-byte fingerprint does). Returns the skinny per-doc
    * attribute table (doc_id, n_tokens, n_chars, quality, langid,
    * rep_frac, is_canonical) that [[applyConfig]] filters. */
  def tagAttributes(docs: DataFrame, textCol: String, idCol: String,
      stopwords: Seq[String],
      langs: Seq[(String, Seq[String])]): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      length(col(textCol)).cast(LongType).as("n_chars"),
      TextAnalysis.qualityScore(col(textCol), stopwords).as("quality"),
      TextAnalysis.langId(col(textCol), langs).as("langid"),
      TextAnalysis.repetitionFraction(col(textCol), 2).as("rep_frac"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp"))
    val canon = base.groupBy("__fp").agg(min(col("doc_id")).as("__keep"))
    base.join(canon, Seq("__fp"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars"), col("quality"),
        col("langid"), col("rep_frac"),
        (col("doc_id") === col("__keep")).as("is_canonical"))
  }

  private def fpFrame(batch: DataFrame, textCol: String): DataFrame =
    batch.select(TextAnalysis.fingerprint(col(textCol)).as("__fp"))

  /** Incremental tagging under the [[BatchStore]] contract: tag ONE
    * arriving batch, deciding `is_canonical` against every PRIOR batch's
    * fingerprints (first occurrence across the stream wins; within the
    * batch, min doc_id). The store holds only distinct 16-byte
    * fingerprints per batch partition; the prior read is pruned to the
    * batch's own fingerprint set via a broadcast left-semi (the
    * substring-store rule: per-batch cost is batch-proportional, the
    * store side is scan + probe). The batch's partition writes LAST with
    * per-partition overwrite, so a retried batch replaces its partial
    * and never reads it ([[BatchStore.readStore]] excludes the in-flight
    * id). */
  def attributeStoreStep(batch: DataFrame, storeDir: String, batchId: Long,
      textCol: String, idCol: String, stopwords: Seq[String],
      langs: Seq[(String, Seq[String])],
      probeCap: Long = BatchStore.ProbeBroadcastCap,
      maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val scanAttrs = batch.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
      length(col(textCol)).cast(LongType).as("n_chars"),
      TextAnalysis.qualityScore(col(textCol), stopwords).as("quality"),
      TextAnalysis.langId(col(textCol), langs).as("langid"),
      TextAnalysis.repetitionFraction(col(textCol), 2).as("rep_frac"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp"))
    val batchFps = scanAttrs.select("__fp").distinct().localCheckpoint()
    // broadcast-hinted only when the batch's fingerprint set is provably
    // small; a fat batch shuffles the semi instead of failing the stream
    val prior = BatchStore.readStore(spark, storeDir, "fingerprints",
        fpFrame(batch.limit(0), textCol), batchId)
      .join(BatchStore.probeSide(batchFps, probeCap), Seq("__fp"), "left_semi")
      .distinct()
    val canon = scanAttrs.groupBy("__fp").agg(min(col("doc_id")).as("__keep"))
    val attrs = scanAttrs
      .join(canon, Seq("__fp"))
      .join(prior.withColumn("__seen", lit(true)), Seq("__fp"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_chars"), col("quality"),
        col("langid"), col("rep_frac"),
        (col("doc_id") === col("__keep") && col("__seen").isNull)
          .as("is_canonical"))
      .localCheckpoint() // pin the verdict before the store mutates
    BatchStore.writeBatchPart(batchFps, s"$storeDir/fingerprints",
      s"$storeDir/compactions/fingerprints", batchId)
    BatchStore.autoCompact(spark, s"$storeDir/fingerprints",
      s"$storeDir/compactions/fingerprints", maxStoreParts, batchId)(
      attributeStoreCompact(spark, storeDir, _, _))
    attrs
  }

  /** Fold committed fingerprint partitions under the marker protocol —
    * membership is a SET, so the merge is distinct (store bytes drop
    * when batches share fingerprints). */
  def attributeStoreCompact(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compact(spark, s"$storeDir/fingerprints",
      s"$storeDir/compactions/fingerprints", None, compactId, upToBatchId,
      df => df.drop("batch_id").distinct())
}
