package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.core.FieldType._
import graft.rules._
import graft.testing._

/** Port of the reference's rule-integration-test shape: the
  * cloudtrail_put_object_acl_public rule
  * (rules/community/cloudwatch_events/cloudtrail_put_object_acl_public.py:16-38)
  * with its paired JSON test events, through the real classify→rules path. */
class RuleTestHarnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cloudwatchEvents = LogSchema(
    name = "cloudwatch:events",
    parser = ParserKind.Json,
    schema = TStruct.of(
      "account" -> TInteger,
      "detail" -> TStruct.of(
        "eventName" -> TString,
        "requestParameters" -> TStruct.of(
          "bucketName" -> TString,
          "acl" -> TString))))

  // the rule: PutObjectAcl with a public-ish grant, excluding allowed buckets
  private val publicAclRule = Rule(
    "cloudtrail_put_object_acl_public",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" -> Seq("requestParameters"))),
    rec =>
      rec.getField("detail").getField("eventName") === "PutObjectAcl" &&
        Helpers.containsAny(rec.getField("detail").getField("requestParameters")
          .getField("acl"), Seq("AllUsers", "AuthenticatedUsers")) &&
        !rec.getField("detail").getField("requestParameters")
          .getField("bucketName").isin("allowed-bucket"))

  private val eventsJson =
    """[
      |  {"description": "public-read ACL triggers",
      |   "log": "cloudwatch:events", "service": "s3", "source": "test-bucket",
      |   "data": {"account": 12345, "detail": {"eventName": "PutObjectAcl",
      |     "requestParameters": {"bucketName": "secret-bucket",
      |       "acl": "http://acs.amazonaws.com/groups/global/AllUsers"}}},
      |   "trigger_rules": ["cloudtrail_put_object_acl_public"]},
      |  {"description": "private ACL does not trigger",
      |   "log": "cloudwatch:events", "service": "s3", "source": "test-bucket",
      |   "data": {"account": 12345, "detail": {"eventName": "PutObjectAcl",
      |     "requestParameters": {"bucketName": "b", "acl": "private"}}},
      |   "trigger_rules": []},
      |  {"description": "allowed bucket excluded",
      |   "log": "cloudwatch:events", "service": "s3", "source": "test-bucket",
      |   "data": {"account": 12345, "detail": {"eventName": "PutObjectAcl",
      |     "requestParameters": {"bucketName": "allowed-bucket",
      |       "acl": "AllUsers"}}},
      |   "trigger_rules": []},
      |  {"description": "classify only",
      |   "log": "cloudwatch:events", "service": "s3", "source": "test-bucket",
      |   "data": {"account": 1, "detail": {"eventName": "GetObject",
      |     "requestParameters": {"bucketName": "b", "acl": ""}}},
      |   "classify_only": true}
      |]""".stripMargin

  test("rule test events run through real classify -> rules, assertions hold") {
    val events = RuleTestEvent.fromJson(eventsJson)
    assert(events.length == 4)
    val harness = new RuleTestHarness(Seq(cloudwatchEvents), Seq(publicAclRule))
    val results = harness.run(spark, events)
    results.foreach(r => info(r.report))
    assert(results.forall(_.passed))
    assert(results(0).triggered == Set("cloudtrail_put_object_acl_public"))
    assert(results(1).triggered.isEmpty)
  }

  test("untested rules are reported (handler.py:294-302)") {
    val extraRule = Rule("never_tested", RuleOpts(logs = Seq("cloudwatch:events")),
      _ => lit(false))
    val harness = new RuleTestHarness(Seq(cloudwatchEvents),
      Seq(publicAclRule, extraRule))
    assert(harness.untestedRules(RuleTestEvent.fromJson(eventsJson)) == Seq("never_tested"))
  }

  // `compress: true` (event.py:37,80-81,271-272): data is zlib-compressed
  // into the kinesis wire shape and must classify + trigger identically
  // after the engine's own base64→inflate decode column.
  test("compress flag round-trips through the kinesis zlib decode path") {
    val compressedJson =
      """[
        |  {"description": "compressed public ACL still triggers",
        |   "log": "cloudwatch:events", "service": "kinesis", "source": "stream",
        |   "compress": true,
        |   "data": {"account": 12345, "detail": {"eventName": "PutObjectAcl",
        |     "requestParameters": {"bucketName": "secret-bucket",
        |       "acl": "AllUsers"}}},
        |   "trigger_rules": ["cloudtrail_put_object_acl_public"]},
        |  {"description": "compressed private ACL stays quiet",
        |   "log": "cloudwatch:events", "service": "kinesis", "source": "stream",
        |   "compress": true,
        |   "data": {"account": 12345, "detail": {"eventName": "PutObjectAcl",
        |     "requestParameters": {"bucketName": "b", "acl": "private"}}},
        |   "trigger_rules": []}
        |]""".stripMargin
    val events = RuleTestEvent.fromJson(compressedJson)
    assert(events.forall(_.compress))
    val harness = new RuleTestHarness(Seq(cloudwatchEvents), Seq(publicAclRule))
    val results = harness.run(spark, events)
    results.foreach(r => info(r.report))
    assert(results.forall(_.passed))
    assert(results(0).triggered == Set("cloudtrail_put_object_acl_public"))
    assert(results(1).triggered.isEmpty)
  }

  // Gunzip's header sniff must match zlib.decompress(record, 47)
  // (kinesis.py:55): gzip framing, zlib framing, and raw-text passthrough.
  test("gunzip decode handles gzip, zlib and passthrough framings") {
    import graft.functions.Gunzip
    def gzipBytes(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    def zlibBytes(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    assert(Gunzip.decode(gzipBytes("""{"gz": true}""")).toString == """{"gz": true}""")
    assert(Gunzip.decode(zlibBytes("""{"zlib": true}""")).toString == """{"zlib": true}""")
    assert(Gunzip.decode("plain text".getBytes("UTF-8")).toString == "plain text")
    // corrupt bodies behind valid-looking magic bytes must pass through as
    // text on BOTH framings — the reference's `except zlib.error` arm
    // (kinesis.py:56-58) fires for a bad stream regardless of which header
    // the auto-detect sniffed
    val fakeGzip = Array(0x1f, 0x8b, 0x41, 0x42, 0x43).map(_.toByte)
    assert(Gunzip.decode(fakeGzip).toString == new String(fakeGzip, "UTF-8"))
    val truncated = gzipBytes("""{"gz": true}""").take(6)
    assert(Gunzip.decode(truncated).toString == new String(truncated, "UTF-8"))
  }
}
