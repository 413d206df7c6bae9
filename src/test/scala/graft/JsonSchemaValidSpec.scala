package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.core.FieldType._
import graft.classify.CompiledSchema
import graft.functions.JsonSchemaValid

/** Differential test: the native one-pass validator must agree with the
  * column-path validity on every probe record — the two implementations
  * back the same classification decision. */
class JsonSchemaValidSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = LogSchema(
    name = "t:diff", parser = ParserKind.Json,
    schema = TStruct.of(
      "a" -> TString, "n" -> TInteger, "f" -> TFloat, "b" -> TBoolean,
      "lst" -> TList, "open" -> TAnyMap,
      "nest" -> TStruct.of("x" -> TString, "y" -> TInteger)),
    optionalTopLevelKeys = Set("lst", "open"))

  private val probes = Seq(
    // valid
    """{"a":"s","n":1,"f":1.5,"b":true,"nest":{"x":"v","y":2}}""",
    """{"a":"s","n":"42","f":"2.5","b":"True","lst":["1"],"open":{"k":"v"},"nest":{"x":"v","y":"7"}}""",
    // strict key failures
    """{"a":"s","n":1,"f":1.0,"b":true,"nest":{"x":"v","y":2},"extra":1}""",
    """{"a":"s","f":1.0,"b":true,"nest":{"x":"v","y":2}}""",
    """{"a":"s","n":1,"f":1.0,"b":true,"nest":{"x":"v"}}""",
    """{"a":"s","n":1,"f":1.0,"b":true,"nest":{"x":"v","y":2,"z":9}}""",
    // coercion failures
    """{"a":"s","n":"NaNope","f":1.0,"b":true,"nest":{"x":"v","y":2}}""",
    """{"a":"s","n":1,"f":"xx","b":true,"nest":{"x":"v","y":2}}""",
    """{"a":"s","n":1,"f":1.0,"b":true,"nest":{"x":"v","y":"bad"}}""",
    // falsey skips survive
    """{"a":"","n":null,"f":1.0,"b":false,"nest":{"x":"v","y":2}}""",
    // structural junk
    """not json at all""",
    """[1,2,3]""",
    """{"a":{"deep":1},"n":1,"f":1.0,"b":true,"nest":{"x":"v","y":2}}""",
    """{"a":"s","n":{"o":1},"f":1.0,"b":true,"nest":{"x":"v","y":2}}""")

  test("native validator agrees with the column path on all probes") {
    val cs = CompiledSchema(schema)
    val df = probes.toDF("value")
    val both = df.select(
      col("value"),
      JsonSchemaValid.column(col("value"), schema.schema, schema.optionalTopLevelKeys)
        .as("native"),
      cs.rawParse(col("value")).map(r => cs.validFromRaw(col("value"), r))
        .getOrElse(lit(false)).as("columnar"))
      .collect()
    both.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"divergence on ${r.getString(0)}: native=${r.getBoolean(1)} columnar=${r.getBoolean(2)}")
    }
    // and sanity: the first two probes are valid, the key/coercion ones not
    assert(both(0).getBoolean(1) && both(1).getBoolean(1))
    assert(!both(2).getBoolean(1) && !both(6).getBoolean(1))
  }

  test("seeded fuzz: native and column paths agree on random records") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "n", "f", "b", "lst", "open", "nest", "zzz")
    def randValue(): String = rnd.nextInt(8) match {
      case 0 => "\"str\""
      case 1 => rnd.nextInt(100).toString
      case 2 => "1.5"
      case 3 => "true"
      case 4 => "null"
      case 5 => """["x"]"""
      case 6 => """{"x":"v","y":2}"""
      case 7 => "\"\""
    }
    val fuzz = (0 until 300).map { _ =>
      val n = rnd.nextInt(keys.length) + 1
      rnd.shuffle(keys).take(n).map(k => s""""$k":${randValue()}""")
        .mkString("{", ",", "}")
    }
    val cs = CompiledSchema(schema)
    val rows = fuzz.toDF("value").select(
      col("value"),
      JsonSchemaValid.column(col("value"), schema.schema, schema.optionalTopLevelKeys)
        .as("native"),
      cs.rawParse(col("value")).map(r => cs.validFromRaw(col("value"), r))
        .getOrElse(lit(false)).as("columnar"))
      .collect()
    rows.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"fuzz divergence on ${r.getString(0)}")
    }
  }
}
