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

  test("v1 normalized_types.json loads and merges into reference schemas") {
    assume(confDir.isDirectory)
    val v1File = new java.io.File("/root/reference/conf/normalized_types.json")
    assume(v1File.isFile)
    val v1 = LogSchema.loadNormalizedTypesJson(new String(
      java.nio.file.Files.readAllBytes(v1File.toPath), "UTF-8"))
    assert(v1.contains("cloudtrail") && v1.contains("osquery"))
    val ct = LogSchema.loadConfJson(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(confDir, "cloudtrail.json").toPath), "UTF-8"))
    val merged = LogSchema.mergeV1Normalization(ct, v1)
    val events = merged.find(_.name == "cloudtrail:events").get
    // v1 key names resolved to declared-schema paths at load time
    assert(events.normalization("sourceAddress").map(_.path) == Seq(Seq("sourceIPAddress")))
    assert(events.normalization("region").map(_.path).contains(Seq("awsRegion")))
    // v1 'region' lists original keys ['region','awsRegion']; only awsRegion
    // exists in this schema, so only it resolves
    assert(!events.normalization("region").map(_.path).contains(Seq("region")))
    // digest has none of the v1 keys -> untouched
    assert(merged.find(_.name == "cloudtrail:digest").get.normalization.isEmpty)
  }

  test("a v1-sourced normalized type extracts through the Normalizer column path") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val schema = LogSchema(
      name = "demo:v1norm", parser = ParserKind.Json,
      schema = FieldType.TStruct.of(
        "eventName" -> FieldType.TString,
        "detail" -> FieldType.TStruct.of("remote_ip" -> FieldType.TString)))
    val v1 = Map("demo" -> Map(
      "destinationAddress" -> Seq("remote_ip"),  // nested hit
      "eventType" -> Seq("eventType")))          // absent from schema -> dropped
    val Seq(merged) = LogSchema.mergeV1Normalization(Seq(schema), v1)
    assert(merged.normalization("destinationAddress").map(_.path)
      == Seq(Seq("detail", "remote_ip")))
    assert(!merged.normalization.contains("eventType"))
    val typed = new graft.classify.Classifier(Seq(merged))
      .classify(Seq("""{"eventName":"x","detail":{"remote_ip":"1.2.3.4"}}""").toDF("value"))
      .forType("demo:v1norm")
      .withColumn(graft.classify.Normalizer.NormalizationKey,
        graft.classify.Normalizer.normalizationCol(
          col("record"), merged.normalization, Some(merged.schema)))
    val vals = typed.select(graft.classify.Normalizer.valuesForNormalizedType(
      col(graft.classify.Normalizer.NormalizationKey), "destinationAddress"))
      .collect()(0).getSeq[String](0)
    assert(vals == Seq("1.2.3.4"))
  }

  test("Pipeline.fromConfDir assembles the engine from the reference conf tree") {
    assume(new java.io.File("/root/reference/conf/schemas").isDirectory)
    val spark = TestSpark.spark
    import spark.implicits._
    val conf = graft.streaming.Pipeline.loadConfDir("/root/reference/conf")
    assert(conf.schemas.length >= 50)
    assert(conf.dataSources.contains("prod"))
    assert(conf.outputs.nonEmpty && conf.lookupTables.nonEmpty)
    assert(conf.threatIntelJson.isDefined)
    // v1 normalization merged into the loaded schemas
    assert(conf.schemas.find(_.name == "cloudtrail:events")
      .exists(_.normalization.contains("sourceAddress")))
    // a runnable pipeline over the reference's own fixture event
    val eventFile = new java.io.File(
      "/root/reference/rules/community/cloudwatch_events/cloudtrail_put_object_acl_public.json")
    assume(eventFile.isFile)
    val events = graft.testing.RuleTestEvent.fromJson(new String(
      java.nio.file.Files.readAllBytes(eventFile.toPath), "UTF-8"))
    val rule = graft.rules.Rule("any_cloudwatch",
      graft.rules.RuleOpts(logs = Seq("cloudwatch:events")),
      rec => org.apache.spark.sql.functions.lit(true))
    val pipeline = graft.streaming.Pipeline.fromConfDir(
      "/root/reference/conf", Seq(rule))
    val alerts = pipeline.alertsFor(events.map(_.dataJson).toDF("value"))
    assert(alerts.count() >= 1)
  }

  test("threat_intel / lookup_tables / outputs conf files load and wire up") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    assume(new java.io.File("/root/reference/conf/threat_intel.json").isFile)

    // threat_intel.json: ioc-type mapping inverted, exclusions honored
    val ioc = Seq(("1.2.3.4", "ip")).toDF("ioc_value", "sub_type")
    val ti = graft.rules.ThreatIntel.fromConfJson(
      read("/root/reference/conf/threat_intel.json"), ioc)
    val norm = Seq(1).toDF("x")
      .withColumn(graft.classify.Normalizer.RecordIdKey, lit("r1"))
      .withColumn(graft.classify.Normalizer.NormalizationKey,
        map(lit("sourceAddress"), array(struct(
          array(lit("1.2.3.4")).as("values"),
          lit(null).cast("string").as("function"),
          lit(true).as("send_to_artifacts")))).cast(
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            graft.classify.Normalizer.entryType)))
    val annotated = ti.annotate(norm)
    val hit = annotated.select(element_at(col(ti.IocKey), "ip")).collect()(0)
    assert(hit.getSeq[String](0) == Seq("1.2.3.4"))
    // 10.x is RFC1918-excluded by the reference conf
    val norm10 = norm.withColumn(graft.classify.Normalizer.NormalizationKey,
      map(lit("sourceAddress"), array(struct(
        array(lit("10.1.2.3")).as("values"),
        lit(null).cast("string").as("function"),
        lit(true).as("send_to_artifacts")))).cast(
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          graft.classify.Normalizer.entryType)))
    assert(ti.annotate(norm10).select(size(map_keys(col(ti.IocKey))))
      .collect()(0).getInt(0) == 0)

    // lookup_tables.json: s3 tier -> plan-literal map, dynamo tier -> join
    val confs = graft.rules.LookupTables.parseConfJson(
      read("/root/reference/conf/lookup_tables.json"))
    assert(confs.map(_.driver).toSet == Set("dynamodb", "s3"))
    val tables = graft.rules.LookupTables.fromConf(confs,
      s3Fetch = (_, _) => """{"k1":"v1"}""",
      dynamoSource = _ => Seq(("pk1", "pv1")).toDF("partition-key", "value-column"))
    val got = Seq("k1").toDF("k")
      .select(tables.get("s3-backed-table", col("k"), lit("dflt")))
      .collect()(0).getString(0)
    assert(got == "v1")
    val joined = tables.joinLookup(Seq("pk1").toDF("k"),
      "dynamo-backed-table", col("k"), "v")
    assert(joined.select("v").collect()(0).getString(0) == "pv1")

    // outputs.json: service -> descriptors across all three value shapes
    val outs = graft.alerts.Outputs.loadOutputsJson(
      read("/root/reference/conf/outputs.json"))
    assert(graft.alerts.Outputs.isConfigured("aws-lambda:sample-lambda", outs))
    assert(graft.alerts.Outputs.isConfigured("aws-s3:bucket", outs))
    assert(!graft.alerts.Outputs.isConfigured("aws-s3:nope", outs))
    assert(!graft.alerts.Outputs.isConfigured("not-a-service:x", outs))
  }

  test("cluster data_sources filters candidate schemas per (service, resource)") {
    val clusterFile = new java.io.File("/root/reference/conf/clusters/prod.json")
    assume(clusterFile.isFile && confDir.isDirectory)
    val ds = DataSources.loadClusterJson(new String(
      java.nio.file.Files.readAllBytes(clusterFile.toPath), "UTF-8"))
    assert(ds.contains("kinesis"))
    val schemas = confDir.listFiles().filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).toSeq.flatMap(f => LogSchema.loadConfJson(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
    val (resource, allowed) = ds("kinesis").head
    val cands = DataSources.candidates(schemas, ds, "kinesis", resource)
    assert(cands.nonEmpty)
    assert(cands.map(_.name.split(':').head).forall(allowed.contains))
    // order preserved for first-match-wins classification
    assert(cands == schemas.filter(cands.contains))
    intercept[IllegalArgumentException] {
      DataSources.candidates(schemas, ds, "nope", resource)
    }
    intercept[IllegalArgumentException] {
      DataSources.candidates(schemas, ds, "kinesis", "not-a-resource")
    }
  }

  test("cloudtrail: json_path + envelope-free explosion config survives") {
    assume(confDir.isDirectory)
    val ct = LogSchema.loadConfJson(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(confDir, "cloudtrail.json").toPath), "UTF-8"))
    val events = ct.find(_.name == "cloudtrail:events").get
    assert(events.jsonPath.contains("Records[*]") || events.jsonPath.contains("Records[]"))
    assert(events.schema.fields.contains("eventName"))
  }

  test("reference test event classifies through the reference's own conf schema") {
    assume(confDir.isDirectory)
    val spark = TestSpark.spark
    import spark.implicits._
    // the reference's own rule-test fixture (read at runtime, read-only)
    val eventFile = new java.io.File(
      "/root/reference/rules/community/cloudwatch_events/cloudtrail_put_object_acl_public.json")
    assume(eventFile.isFile)
    val events = graft.testing.RuleTestEvent.fromJson(
      new String(java.nio.file.Files.readAllBytes(eventFile.toPath), "UTF-8"))
    assert(events.nonEmpty)
    val schemas = LogSchema.loadConfJson(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(confDir, "cloudwatch.json").toPath), "UTF-8"))
    val classified = new graft.classify.Classifier(schemas)
      .classify(events.map(_.dataJson).toDF("value"))
    val types = classified.tagged.select("log_schema_type")
      .collect().map(r => Option(r.getString(0)))
    // every fixture event declares log = cloudwatch:events and must classify so
    events.zip(types).foreach { case (e, t) =>
      info(s"${e.description}: classified=$t expected=${e.log}")
      assert(t.contains(e.log))
    }
    // and the conf's own v2 normalization extracts the event name
    val cw = schemas.find(_.name == "cloudwatch:events").get
    val normed = classified.forType("cloudwatch:events")
      .withColumn(graft.classify.Normalizer.NormalizationKey,
        graft.classify.Normalizer.normalizationCol(
          org.apache.spark.sql.functions.col("record"), cw.normalization, Some(cw.schema)))
    val names = normed.select(org.apache.spark.sql.functions.array_join(
      graft.classify.Normalizer.valuesForNormalizedType(
        org.apache.spark.sql.functions.col(graft.classify.Normalizer.NormalizationKey),
        "event_name"), ",")).as[String].collect()
    assert(names.forall(_ == "PutObjectAcl"))
  }

  test("reference rule re-authored in Scala passes the reference's own test events") {
    assume(confDir.isDirectory)
    import org.apache.spark.sql.functions._
    val eventFile = new java.io.File(
      "/root/reference/rules/community/cloudwatch_events/cloudtrail_put_object_acl_public.json")
    assume(eventFile.isFile)
    val events = graft.testing.RuleTestEvent.fromJson(
      new String(java.nio.file.Files.readAllBytes(eventFile.toPath), "UTF-8"))
    val schemas = LogSchema.loadConfJson(new String(java.nio.file.Files.readAllBytes(
      new java.io.File(confDir, "cloudwatch.json").toPath), "UTF-8"))

    // the rule body (cloudtrail_put_object_acl_public.py:16-38) over the
    // REAL conf schema: `detail` is a `{}` open map, so requestParameters
    // arrives as raw JSON text — deep substring search + bucket exclusion
    val publicAcls = Seq(
      "http://acs.amazonaws.com/groups/global/AllUsers",
      "http://acs.amazonaws.com/groups/global/AuthenticatedUsers")
    val rule = graft.rules.Rule(
      "cloudtrail_put_object_acl_public",
      graft.rules.RuleOpts(logs = Seq("cloudwatch:events"),
        reqSubkeys = Map.empty), // open-map detail: guard expressed in-body
      rec => {
        val detail = rec.getField("detail")
        val reqParams = element_at(detail, "requestParameters")
        reqParams.isNotNull &&
          element_at(detail, "eventName") === "PutObjectAcl" &&
          graft.rules.Helpers.rawJsonHasSubstring(reqParams, publicAcls) &&
          !get_json_object(reqParams, "$.bucketName")
            .isin("example-bucket-to-ignore") // _PUBLIC_BUCKETS (rule file :12)
      })
    val harness = new graft.testing.RuleTestHarness(schemas, Seq(rule))
    val results = harness.run(TestSpark.spark, events)
    results.foreach(r => info(r.report))
    assert(results.forall(_.passed))
    assert(results.exists(_.triggered.nonEmpty)) // at least one firing event
  }

  test("scheduled_queries.json pack groups load and drive the ExecutionManager") {
    import graft.history.ScheduledQueries
    import graft.history.ScheduledQueries.QueryPackDef
    val confFile = new java.io.File("/root/reference/conf/scheduled_queries.json")
    assume(confFile.isFile)
    // the reference conf shape parses via the same loadConfDir surface as
    // every other conf file
    val conf = graft.streaming.Pipeline.loadConfDir("/root/reference/conf")
    val sq = conf.scheduledQueries.get
    assert(!sq.enabled) // reference ships it disabled
    assert(sq.destinationStream.contains("KINESIS_STREAM"))
    assert(sq.groups.map(_.name) == Seq("sample"))
    assert(sq.groups.head.scheduleExpression == "rate(1 hour)")

    // a pack in the reference's QueryPackConfiguration shape
    // (scheduled_queries/sample/athena.py:18-50: name/description/query
    // with {param} placeholders/params/tags) binds to its group by tag and
    // launches through the ExecutionManager
    val pack = QueryPackDef(
      name = "athena_any_query",
      query = "SELECT 'window {utcdatehour_minus1hour}' AS w",
      params = Seq("utcdatehour_minus1hour"),
      tags = Seq("sample"))
    val outside = QueryPackDef(name = "other", query = "SELECT 1 AS one",
      tags = Seq("not_sample"))
    assert(ScheduledQueries.packsForGroup("sample", Seq(pack, outside)) == Seq(pack))

    import scala.concurrent.ExecutionContext.Implicits.global
    val mgr = new ScheduledQueries.ExecutionManager(TestSpark.spark)
    val handles = ScheduledQueries.startGroup(mgr, "sample", Seq(pack, outside),
      java.time.Instant.parse("2024-01-01T12:00:00Z"))
    assert(handles.keySet == Set("athena_any_query"))
    val rows = scala.concurrent.Await.result(
      handles("athena_any_query").result, scala.concurrent.duration.Duration("60s"))
    assert(rows.map(_.getString(0)) == Seq("window 2024-01-01-11"))

    // registration-time validation: unknown declared params fail loudly
    // (the reference's generate_query KeyError, moved to construction)
    intercept[IllegalArgumentException](
      QueryPackDef(name = "bad", query = "SELECT 1", params = Seq("nope"),
        tags = Seq("sample")))
    intercept[IllegalArgumentException](
      QueryPackDef(name = "untagged", query = "SELECT 1"))
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
