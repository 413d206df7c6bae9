package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Conf-format parity: every schema file the reference ships
  * (reference conf/schemas JSON files, read-only) must load through our
  * conf loader — the "a user of the reference can switch" contract for the
  * schema surface. */
class ConfParitySpec extends AnyFunSuite {
  private val confDir = new java.io.File("/root/reference/conf/schemas")

  test("every reference conf/schemas file loads") {
    assume(confDir.isDirectory)
    val files = confDir.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)
    assert(files.nonEmpty)
    val loaded = files.flatMap { f =>
      val schemas = LogSchema.loadConfJson(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      info(f"${f.getName}%-20s -> ${schemas.size} log types")
      schemas
    }
    assert(loaded.length >= 50, s"expected dozens of log types, got ${loaded.length}")
    // no duplicate names within a file set
    assert(loaded.map(_.name).distinct.length == loaded.length)
  }

  test("cloudtrail: json_path + envelope-free explosion config survives") {
    assume(confDir.isDirectory)
    val ct = LogSchema.loadConfJson(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(confDir, "cloudtrail.json").toPath), "UTF-8"))
    val events = ct.find(_.name == "cloudtrail:events").get
    assert(events.jsonPath.contains("Records[*]") || events.jsonPath.contains("Records[]"))
    assert(events.schema.fields.contains("eventName"))
  }

  test("cloudwatch:events carries v2 normalization with paths and functions") {
    assume(confDir.isDirectory)
    val cw = LogSchema.loadConfJson(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(confDir, "cloudwatch.json").toPath), "UTF-8"))
    val events = cw.find(_.name == "cloudwatch:events").get
    assert(events.normalization.nonEmpty)
    // simple form: bare path array
    assert(events.normalization("event_name").head.path == Seq("detail", "eventName"))
    // param form: path + function
    val ip = events.normalization("ip_address").head
    assert(ip.path == Seq("detail", "sourceIPAddress"))
    assert(ip.function.isDefined)
  }
}
