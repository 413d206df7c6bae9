package graft

import org.scalatest.funsuite.AnyFunSuite

/** The "verbatim" claim, pinned at the byte level: the SQL texts the
  * sq_presto_* rows execute must be EXACTLY the texts in the reference's
  * own source files (scheduled_queries/sample/athena.py query string;
  * rule_promotion/statistic.py templates) — not a paraphrase. A reference
  * upgrade that edits its packs fails here first. */
class PrestoVerbatimTextSpec extends AnyFunSuite {

  private def read(p: String): String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  test("sample pack SQL text equals athena.py's query string byte-for-byte") {
    val py = "/root/reference/scheduled_queries/sample/athena.py"
    assume(new java.io.File(py).isFile)
    val src = read(py)
    val start = src.indexOf("query=\"\"\"")
    val end = src.indexOf("\"\"\"", start + 9)
    assert(start >= 0 && end > start, "athena.py query string not found")
    val refSql = src.substring(start + 9, end)
    assert(Queries.prestoSampleSql === refSql,
      "embedded sample SQL diverged from the reference text")
  }

  test("promotion count/info templates equal statistic.py's byte-for-byte") {
    val py = "/root/reference/streamalert/rule_promotion/statistic.py"
    assume(new java.io.File(py).isFile)
    val src = read(py)
    // _COUNT_QUERY_TEMPLATE: a ("...") parenthesized single string
    assert(src.contains(
      "\"" + Queries.cqTemplate + "\""),
      "count template diverged from statistic.py")
    assert(src.contains("\"" + Queries.cqWhereFragment + "\""),
      "where fragment diverged from statistic.py")
    // _INFO_QUERY_TEMPLATE is two adjacent string literals; both halves
    // must appear, and their concatenation is what we execute
    val halves = Seq(
      "\"SELECT id, rule_name, created, cluster, log_source, source_entity, \"",
      "\"record FROM alerts WHERE dt >= '{date}-{hour:02}' AND \"",
      "\"rule_name = '{rule_name}' ORDER BY created DESC\"")
    halves.foreach(h => assert(src.contains(h),
      s"info-template fragment missing from statistic.py: $h"))
    assert(Queries.infoTemplate ===
      halves.map(_.stripPrefix("\"").stripSuffix("\"")).mkString,
      "executed info template is not the concatenation of the source halves")
  }
}
