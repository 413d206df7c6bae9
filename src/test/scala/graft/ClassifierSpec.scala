package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.classify._

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // RocksDB state store: avoids the HDFS-backed store's per-file shell
      // exec (chmod/readlink) churn on local filesystems
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Fixtures mirror the reference unit tests
  * (tests/unit/streamalert/classifier/test_parsers_{json,csv,kv,syslog}.py):
  * same behaviors — strict key check, coercion, optionals, log_patterns,
  * json_path explosion, envelope — asserted through our Column pipelines. */
class ClassifierSpec extends AnyFunSuite {
  import FieldType._
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val jsonSchema = LogSchema(
    name = "test:json",
    parser = ParserKind.Json,
    schema = TStruct.of(
      "name" -> TString, "count" -> TInteger, "score" -> TFloat,
      "ok" -> TBoolean, "tags" -> TList,
      "detail" -> TStruct.of("a" -> TString, "b" -> TInteger)),
    optionalTopLevelKeys = Set("tags"))

  private val csvSchema = LogSchema(
    name = "test:csv", parser = ParserKind.Csv,
    schema = TStruct.of("host" -> TString, "port" -> TInteger, "msg" -> TString))

  private val kvSchema = LogSchema(
    name = "test:kv", parser = ParserKind.Kv,
    schema = TStruct.of("user" -> TString, "result" -> TString, "code" -> TInteger))

  private val syslogSchema = LogSchema(
    name = "test:syslog", parser = ParserKind.Syslog,
    schema = TStruct.of(
      "timestamp" -> TString, "host" -> TString,
      "application" -> TString, "message" -> TString))

  private def classify(schemas: Seq[LogSchema], lines: Seq[String]) =
    new Classifier(schemas).classify(lines.toDF("value"))

  test("json: valid record parses with coercion and optional back-fill") {
    val line = """{"name":"n1","count":"42","score":1.5,"ok":"True","detail":{"a":"x","b":7}}"""
    val out = classify(Seq(jsonSchema), Seq(line)).forType("test:json")
    val row = out.selectExpr(
      "record.name", "record.count", "record.score", "record.ok",
      "record.tags", "record.detail.b").collect()(0)
    assert(row.getString(0) == "n1")
    assert(row.getLong(1) == 42L)
    assert(row.getDouble(2) == 1.5)
    assert(row.getBoolean(3) == true)
    assert(row.getSeq[String](4) == Seq.empty) // optional list back-filled
    assert(row.getLong(5) == 7L)
  }

  test("json: extra key or missing key fails strict check") {
    val extra = """{"name":"n","count":1,"score":1.0,"ok":true,"detail":{"a":"x","b":1},"zzz":1}"""
    val missing = """{"name":"n","count":1,"score":1.0,"ok":true}"""
    val c = classify(Seq(jsonSchema), Seq(extra, missing))
    assert(c.forType("test:json").count() == 0)
    assert(c.invalid.count() == 2)
  }

  test("json: int coercion failure invalidates the record") {
    val bad = """{"name":"n","count":"notanint","score":1.0,"ok":true,"detail":{"a":"x","b":1}}"""
    val c = classify(Seq(jsonSchema), Seq(bad))
    assert(c.invalid.count() == 1)
  }

  test("json: nested-struct strictness (native one-pass validation path)") {
    def line(detail: String) =
      s"""{"name":"n","count":1,"score":1.0,"ok":true,"detail":$detail}"""
    val cases = Seq(
      line("""{"a":"x","b":1}""")          -> true,  // exact nested keys
      line("""{"a":"x","b":1,"c":2}""")    -> false, // extra nested key
      line("""{"a":"x"}""")                -> false, // missing nested key
      line("""{"a":"x","b":"notint"}""")   -> false, // nested coercion failure
      line("""{"a":"x","b":""}""")         -> true,  // falsey value skipped
      line("""null""")                     -> false, // required nested struct null
      line(""""stringnotobject"""")        -> false) // wrong nested shape
    // float leaves must match Spark's cast acceptance: inf/nan spellings
    // that Double.parseDouble alone rejects are valid (probed vs try_cast)
    val floatSchema = LogSchema(
      name = "test:float", parser = ParserKind.Json,
      schema = TStruct.of("x" -> TFloat, "n" -> TStruct.of("y" -> TFloat)))
    val fl = classify(Seq(floatSchema), Seq(
      """{"x":"inf","n":{"y":"-Inf"}}""",
      """{"x":"nan","n":{"y":"1.5"}}""",
      """{"x":"notafloat","n":{"y":"1.5"}}"""))
    assert(fl.forType("test:float").count() == 2)
    assert(fl.invalid.count() == 1)
    val c = classify(Seq(jsonSchema), cases.map(_._1))
    assert(c.forType("test:json").count() == cases.count(_._2))
    assert(c.invalid.count() == cases.count(!_._2))
    // two-level nesting with an optional inner struct
    val deep = LogSchema(
      name = "test:deep", parser = ParserKind.Json,
      schema = TStruct.of(
        "id" -> TInteger,
        "outer" -> TStruct.of(
          "mid" -> TStruct.of("leaf" -> TFloat), "tag" -> TString)))
    val deepCases = Seq(
      """{"id":1,"outer":{"mid":{"leaf":2.5},"tag":"t"}}"""   -> true,
      """{"id":1,"outer":{"mid":{"leaf":"x"},"tag":"t"}}"""   -> false, // leaf coercion
      """{"id":1,"outer":{"mid":{},"tag":"t"}}"""             -> false, // missing leaf
      """{"id":1,"outer":{"tag":"t"}}"""                      -> false) // missing mid
    val d = classify(Seq(deep), deepCases.map(_._1))
    assert(d.forType("test:deep").count() == deepCases.count(_._2))
  }

  test("json_path: one payload explodes into N child records with envelope") {
    val schema = LogSchema(
      name = "cloudtrail:events", parser = ParserKind.Json,
      schema = TStruct.of("eventName" -> TString, "awsRegion" -> TString),
      jsonPath = Some("Records[]"),
      envelope = Some(TStruct.of("requestId" -> TString)))
    val line =
      """{"requestId":"r-1","Records":[
        |{"eventName":"PutObject","awsRegion":"us-east-1"},
        |{"eventName":"GetObject","awsRegion":"us-west-2"}]}""".stripMargin.replace("\n", "")
    val out = classify(Seq(schema), Seq(line)).forType("cloudtrail:events")
    val rows = out.selectExpr("record.eventName", s"${LogSchema.EnvelopeKey}.requestId")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("GetObject", "r-1"), ("PutObject", "r-1")))
  }

  test("log_patterns gate classification (fnmatch globs)") {
    val schema = jsonSchema.copy(
      name = "test:patterned",
      logPatterns = Map("name" -> Seq("prod-*")))
    val ok = """{"name":"prod-a","count":1,"score":1.0,"ok":true,"detail":{"a":"x","b":1}}"""
    val no = """{"name":"dev-a","count":1,"score":1.0,"ok":true,"detail":{"a":"x","b":1}}"""
    val c = classify(Seq(schema), Seq(ok, no))
    assert(c.forType("test:patterned").count() == 1)
    assert(c.invalid.count() == 1)
  }

  test("csv: positional parse + column count check") {
    val c = classify(Seq(csvSchema), Seq(
      "web-1,8080,started",
      "web-2,9090,stopped,EXTRA",   // too many columns
      "web-3,notaport,x"))          // int coercion failure
    val ok = c.forType("test:csv")
      .selectExpr("record.host", "record.port").collect()
    assert(ok.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("web-1", 8080L)))
    assert(c.invalid.count() == 2)
  }

  test("kv: delimiter/separator split with field count check") {
    val c = classify(Seq(kvSchema), Seq(
      "user=alice result=ok code=200",
      "user=bob result=fail",            // too few fields
      "user=carol result=ok code=200 x=1")) // too many
    val ok = c.forType("test:kv").selectExpr("record.user", "record.code").collect()
    assert(ok.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("alice", 200L)))
    assert(c.invalid.count() == 2)
  }

  test("kv: duplicate keys fall back to the schema key at their position (parsers.py:795-801)") {
    val dup = LogSchema(
      name = "test:kv_dup", parser = ParserKind.Kv,
      schema = TStruct.of("user" -> TString, "user2" -> TString, "code" -> TInteger))
    val c = classify(Seq(dup), Seq(
      "user=alice user=bob code=200",   // repeated 'user' -> 'user2' at position 1
      "user=x user2=y code=1",          // explicit keys still work
      "user=a user=b user=c"))          // third dup -> 'code', fails int coercion
    val ok = c.forType("test:kv_dup")
      .selectExpr("record.user", "record.user2", "record.code").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(ok.toSeq == Seq(("alice", "bob", 200L), ("x", "y", 1L)))
    assert(c.invalid.count() == 1)
  }

  test("kv: seeded fuzz against a direct port of the reference extract (parsers.py:786-812)") {
    // in-test oracle: the reference's _extract_record, ported line-for-line
    def refExtract(data: String, schemaKeys: Seq[String]): Option[Map[String, String]] = {
      val fields = data.split(" ").filter(_.nonEmpty)
      if (fields.length != schemaKeys.length) return None
      val payload = scala.collection.mutable.LinkedHashMap[String, String]()
      fields.zipWithIndex.foreach { case (field, index) =>
        if (field.contains("=")) {
          val Array(key, value) = field.split("=", 2)
          if (payload.contains(key)) payload(schemaKeys(index)) = value
          else payload(key) = value
        } // else: logged + skipped in the reference
      }
      Some(payload.toMap)
    }
    val schemaKeys = Seq("k1", "k2", "k3")
    val dup = LogSchema(
      name = "test:kv_fuzz", parser = ParserKind.Kv,
      schema = TStruct.of("k1" -> TString, "k2" -> TString, "k3" -> TString))
    val rnd = new scala.util.Random(42)
    val lines = (0 until 300).map { _ =>
      val n = 2 + rnd.nextInt(3) // 2-4 fields: exercises the count check
      (0 until n).map { _ =>
        val key = schemaKeys(rnd.nextInt(3))
        if (rnd.nextInt(10) == 0) s"v${rnd.nextInt(5)}" // no separator
        else s"$key=v${rnd.nextInt(5)}"
      }.mkString(" ")
    }.distinct
    val c = classify(Seq(dup), lines)
    val types = c.tagged.select("value", "log_schema_type").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val recs = c.forType("test:kv_fuzz")
      .selectExpr("value", "record.k1", "record.k2", "record.k3").collect()
      .map(r => r.getString(0) -> Map(
        "k1" -> r.getString(1), "k2" -> r.getString(2), "k3" -> r.getString(3)))
      .toMap
    lines.foreach { line =>
      // reference validity: exact key-set match after extraction
      refExtract(line, schemaKeys).filter(_.keySet == schemaKeys.toSet) match {
        case Some(m) =>
          assert(types(line).contains("test:kv_fuzz"), s"'$line' should classify")
          assert(recs(line) == m, s"'$line': ${recs.get(line)} vs $m")
        case None =>
          assert(types(line).isEmpty, s"'$line' should NOT classify")
      }
    }
  }

  test("csv: nested CSV-in-CSV cell (parsers.py:732-740)") {
    val nested = LogSchema(
      name = "test:csv_nested", parser = ParserKind.Csv,
      schema = TStruct.of(
        "host" -> TString,
        "inner" -> TStruct.of("code" -> TInteger, "msg" -> TString)),
      csvDelimiter = ",", csvQuote = "'")
    // the inner cell is itself CSV, quoted in the outer row
    val c = classify(Seq(nested), Seq("web-1,'200,ok'"))
    val r = c.forType("test:csv_nested")
      .selectExpr("record.host", "record.inner.code", "record.inner.msg").collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "web-1")
    assert(r(0).getLong(1) == 200L && r(0).getString(2) == "ok")
  }

  test("csv within json via json_path (parsers.py:676-683)") {
    val schema = LogSchema(
      name = "test:csv_in_json", parser = ParserKind.Csv,
      schema = TStruct.of("host" -> TString, "port" -> TInteger),
      jsonPath = Some("logs[]"))
    val line = """{"logs":["web-1,8080","web-2,9090"],"other":"x"}"""
    val out = classify(Seq(schema), Seq(line)).forType("test:csv_in_json")
      .selectExpr("record.host", "record.port").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == Seq(("web-1", 8080L), ("web-2", 9090L)))
  }

  test("default matchers library registers under reference names") {
    val m = graft.rules.DefaultMatchers.registry
    assert(m.contains("guard_duty") && m.contains("user_login") &&
      m.contains("is_config_compliance") && m.contains("is_auto_remediation"))
    import org.apache.spark.sql.functions._
    val rec = struct(lit("GuardDuty Finding").as("detail-type"))
    val got = Seq(1).toDF("x").select(m("guard_duty")(rec)).collect()(0).getBoolean(0)
    assert(got)
  }

  test("syslog: regex parse into 4 fields") {
    val line = "Jan 10 19:35:33 vagrant-ubuntu-trusty-64 sudo: session opened for root"
    val out = classify(Seq(syslogSchema), Seq(line)).forType("test:syslog")
    val r = out.selectExpr("record.timestamp", "record.host", "record.application",
      "record.message").collect()(0)
    assert(r.getString(0) == "Jan 10 19:35:33")
    assert(r.getString(1) == "vagrant-ubuntu-trusty-64")
    assert(r.getString(2) == "sudo")
    assert(r.getString(3) == "session opened for root")
  }

  test("first matching schema wins, in declared order") {
    // A kv line that would also parse under a looser kv schema declared later
    val strict = kvSchema.copy(name = "test:kv_strict")
    val loose = LogSchema(name = "test:kv_loose", parser = ParserKind.Kv,
      schema = TStruct.of("user" -> TString, "result" -> TString, "code" -> TString))
    val c = classify(Seq(strict, loose), Seq("user=a result=b code=1"))
    assert(c.tagged.select("log_schema_type").collect()(0).getString(0) == "test:kv_strict")
  }

  test("conf JSON loader round-trips the reference schema format") {
    val conf =
      """{
        |  "my:log": {
        |    "schema": {"a": "string", "b": "integer", "nested": {"x": "float"},
        |               "open": {}, "lst": []},
        |    "parser": "json",
        |    "configuration": {
        |      "optional_top_level_keys": ["lst"],
        |      "log_patterns": {"a": ["x-*"]},
        |      "json_path": "Records[]",
        |      "envelope_keys": {"env1": "string"}
        |    }
        |  }
        |}""".stripMargin
    val loaded = LogSchema.loadConfJson(conf)
    assert(loaded.size == 1)
    val s = loaded.head
    assert(s.name == "my:log" && s.parser == ParserKind.Json)
    assert(s.schema.fields("b") == TInteger)
    assert(s.schema.fields("open") == TAnyMap)
    assert(s.optionalTopLevelKeys == Set("lst"))
    assert(s.jsonPath.contains("Records[]"))
    assert(s.envelope.exists(_.fields.contains("env1")))
  }
}
