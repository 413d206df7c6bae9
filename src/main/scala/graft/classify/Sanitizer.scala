package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Key sanitization before the historical sink
  * (streamalert/shared/firehose.py:42-44,131-166): every (nested) key has
  * `\W` runs replaced with `_` so Athena/Hive accepts the column names.
  *
  * Here it is a pure schema rewrite: we rebuild the struct projection with
  * renamed fields — Catalyst collapses it into the output schema, so no data
  * is rewritten, only names. */
object Sanitizer {

  def sanitizeName(name: String): String = name.replaceAll("\\W", "_")

  private def sanitizeColumn(c: Column, dt: DataType): Column = dt match {
    case st: StructType =>
      struct(st.fields.map(f =>
        sanitizeColumn(c.getField(f.name), f.dataType).as(sanitizeName(f.name))): _*)
    case ArrayType(et: StructType, _) =>
      transform(c, e => sanitizeColumn(e, et))
    case _ => c
  }

  /** Rename all (nested) columns of the DataFrame. */
  def sanitizeKeys(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      sanitizeColumn(col("`" + f.name + "`"), f.dataType).as(sanitizeName(f.name))
    }
    df.select(cols.toSeq: _*)
  }
}
