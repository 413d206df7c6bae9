package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Glob

/** Column-first re-expression of the reference's rule helper library
  * (rules/helpers/base.py:35-253 + streamalert/shared/utils.py:13-145).
  *
  * Everything here compiles to built-in Catalyst expressions (startswith /
  * endswith / contains / rlike / bitwise ops) so rules using helpers remain
  * codegen'd predicates — the reference evaluates these per-record in Python.
  * CIDR matching is plan-time constant folding of the network + mask; the
  * runtime check is one AND + one comparison per CIDR.
  */
object Helpers {

  /** starts_with_any (base.py:57-72). */
  def startsWithAny(text: Column, prefixes: Seq[String]): Column =
    prefixes.map(p => text.startsWith(p)).reduceOption(_ || _).getOrElse(lit(false))

  /** ends_with_any (base.py:75-90). */
  def endsWithAny(text: Column, suffixes: Seq[String]): Column =
    suffixes.map(sfx => text.endsWith(sfx)).reduceOption(_ || _).getOrElse(lit(false))

  /** contains_any (base.py:93-108). */
  def containsAny(text: Column, substrings: Seq[String]): Column =
    substrings.map(ss => text.contains(ss)).reduceOption(_ || _).getOrElse(lit(false))

  /** matches_any — fnmatch globs (base.py:111-127), compiled to anchored
    * regexes at plan-build time. */
  def matchesAny(text: Column, patterns: Seq[String]): Column =
    patterns.map(p => text.rlike(Glob.toRegex(p))).reduceOption(_ || _).getOrElse(lit(false))

  /** path_matches_any (base.py:35-54) — PurePath.match semantics: pattern
    * without '/' matches the basename; '*' does not cross '/'. */
  def pathMatchesAny(path: Column, patterns: Seq[String]): Column =
    patterns.map { p =>
      val target = if (p.contains("/")) path else element_at(split(path, "/"), -1)
      val regex = Glob.toRegex(p).replace(".*", "[^/]*")
      target.rlike(regex)
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** last_hour(epoch_seconds, hours) (base.py:130-147): timestamp within the
    * trailing N hours of processing time. */
  def lastHour(epochSeconds: Column, hours: Int = 1): Column =
    epochSeconds.cast(LongType) >= (unix_timestamp() - hours * 3600L)

  /** valid_ip (base.py:172-189): parseable IPv4 dotted-quad. */
  private val Ipv4Regex =
    "^((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)$"
  def validIp(ip: Column): Column = ip.rlike(Ipv4Regex)

  /** Dotted-quad string -> numeric ip (null for invalid). */
  def ipToLong(ip: Column): Column = {
    val parts = split(ip, "\\.")
    when(validIp(ip),
      element_at(parts, 1).cast(LongType) * 16777216L +
      element_at(parts, 2).cast(LongType) * 65536L +
      element_at(parts, 3).cast(LongType) * 256L +
      element_at(parts, 4).cast(LongType))
  }

  /** in_network(ip, cidrs) (base.py:192-215): CIDR membership; network base
    * and mask are folded to literals at plan-build time. */
  def inNetwork(ip: Column, cidrs: Seq[String]): Column = {
    val ipNum = ipToLong(ip)
    cidrs.map { cidr =>
      val Array(net, prefixStr) = cidr.split("/")
      val prefix = prefixStr.toInt
      val netNum = net.split("\\.").map(_.toLong)
        .foldLeft(0L)((acc, o) => acc * 256 + o)
      val mask = if (prefix == 0) 0L else (0xFFFFFFFFL << (32 - prefix)) & 0xFFFFFFFFL
      ipNum.isNotNull && (ipNum.bitwiseAND(lit(mask)) === lit(netNum & mask))
    }.reduceOption(_ || _).getOrElse(lit(false))
  }

  /** random_bool(probability) (base.py:150-158) — sampling helper. */
  def randomBool(probability: Double): Column = rand() <= probability

  /** safe_json_loads (base.py:161-169): parse-or-empty over a string field. */
  def safeJsonLoads(text: Column, schema: org.apache.spark.sql.types.DataType): Column =
    from_json(text, schema)

  // -------------------------------------------------------------------------
  // Typed-record deep search (shared/utils.py:79-145 get_keys BFS +
  // rules/helpers/base.py:144-224 data_has_value family).
  //
  // The reference BFS-walks the parsed dict at runtime; here the record's
  // StructType is declared, so the walk happens at PLAN TIME: every scalar
  // leaf reachable from the record — descending structs, arrays, and maps —
  // becomes a codegen'd boolean term, arrays/maps fold with `exists`. No
  // JSON re-parse, no UDF, and Catalyst prunes untouched columns.
  // -------------------------------------------------------------------------

  /** The normalization metadata key, excluded from deep search exactly as
    * the reference excludes it (utils.py:128-135). */
  private val SkipKeys = Set(graft.classify.Normalizer.NormalizationKey)

  /** OR `pred` across every scalar leaf under `rec` (declared type `dt`). */
  private def anyLeaf(rec: Column, dt: DataType)(
      pred: (Column, DataType) => Column): Column = dt match {
    case st: StructType =>
      st.fields.filterNot(f => SkipKeys.contains(f.name))
        .map(f => anyLeaf(rec.getField(f.name), f.dataType)(pred))
        .toSeq.reduceOption(_ || _).getOrElse(lit(false))
    case at: ArrayType =>
      coalesce(exists(rec, e => anyLeaf(e, at.elementType)(pred)), lit(false))
    case mt: MapType =>
      coalesce(exists(map_values(rec), v => anyLeaf(v, mt.valueType)(pred)),
        lit(false))
    case leaf => coalesce(pred(rec, leaf), lit(false))
  }

  /** data_has_value (base.py:144-160): exact equality against any leaf of a
    * compatible type (Python `==` never equates str with int, so string
    * needles only test string leaves, numeric only numeric, etc.). */
  def dataHasValue(rec: Column, recType: DataType, needle: Any): Column =
    anyLeaf(rec, recType) { (c, dt) =>
      (needle, dt) match {
        case (_: String, StringType)                       => c === lit(needle)
        case (_: Boolean, BooleanType)                     => c === lit(needle)
        case (n, _) if n.isInstanceOf[Number] && dt.isInstanceOf[NumericType] =>
          c === lit(needle)
        case _ => lit(false)
      }
    }

  /** data_has_value_with_substring (base.py:163-179): substring match
    * against any string leaf. */
  def dataHasValueWithSubstring(rec: Column, recType: DataType, needle: String): Column =
    anyLeaf(rec, recType) {
      case (c, StringType) => c.contains(needle)
      case _               => lit(false)
    }

  /** data_has_value_from_list (base.py:182-200): fnmatch-glob match of any
    * non-empty string leaf against any needle. */
  def dataHasValueFromList(rec: Column, recType: DataType, globs: Seq[String]): Column =
    anyLeaf(rec, recType) {
      case (c, StringType) => c =!= "" && matchesAny(c, globs)
      case _               => lit(false)
    }

  /** data_has_value_from_substring_list (base.py:203-224): any needle a
    * substring of any non-empty string leaf. */
  def dataHasValueFromSubstringList(rec: Column, recType: DataType,
      needles: Seq[String]): Column =
    anyLeaf(rec, recType) {
      case (c, StringType) => c =!= "" && containsAny(c, needles)
      case _               => lit(false)
    }

  /** get_keys (utils.py:79-145): every value under a field named `key`,
    * anywhere in the record, as one flat array (pre-order over the declared
    * schema; the reference documents its BFS result as unordered).
    * All matching fields must share one scalar type — a plan-time error
    * otherwise, where the reference would silently return mixed types.
    * Null values are treated as absent (a typed struct cannot distinguish
    * a JSON-absent key from an explicit null). */
  def getKeys(rec: Column, recType: DataType, key: String): Column = {
    def walk(c: Column, dt: DataType): Seq[(Column, DataType)] = dt match {
      case st: StructType =>
        val self = st.fields.filter(f => f.name == key && !SkipKeys.contains(key))
          .map { f =>
            val v = c.getField(f.name)
            (when(v.isNotNull, array(v)).otherwise(array().cast(
              ArrayType(f.dataType))), f.dataType)
          }.toSeq
        val nested = st.fields.filterNot(f => SkipKeys.contains(f.name))
          .flatMap(f => walk(c.getField(f.name), f.dataType)).toSeq
        self ++ nested
      case at: ArrayType =>
        walk(element_at(c, 1), at.elementType) match {
          case Seq() => Seq()
          case hits  =>
            // re-walk per element and flatten: one array per match path
            hits.indices.map { i =>
              val eltType = hits(i)._2
              (coalesce(flatten(transform(c, e =>
                walk(e, at.elementType)(i)._1)), array().cast(ArrayType(eltType))),
                eltType)
            }
        }
      case mt: MapType if !SkipKeys.contains(key) =>
        // direct lookup only; map VALUES have no declared keys to descend
        Seq((when(map_contains_key(c, lit(key)),
          array(element_at(c, lit(key)))).otherwise(array().cast(
            ArrayType(mt.valueType))), mt.valueType))
      case _ => Seq()
    }
    val hits = walk(rec, recType)
    require(hits.nonEmpty, s"get_keys: no field named '$key' in the declared schema")
    val types = hits.map(_._2).distinct
    require(types.size == 1,
      s"get_keys: fields named '$key' have mixed types ${types.mkString(",")}")
    concat(hits.map(_._1): _*)
  }

  /** get_first_key (utils.py:64-76): first get_keys hit or `default`. */
  def getFirstKey(rec: Column, recType: DataType, key: String,
      default: Column): Column =
    coalesce(try_element_at(getKeys(rec, recType, key), lit(1)), default)

  /** Deep value search over a RAW JSON payload — the dynamic-schema
    * fallback when no StructType is declared (e.g. probing an opaque
    * sub-document). Regex approximation of the reference semantics. */
  def rawJsonHasValue(rawJson: Column, value: String): Column = {
    val quoted = java.util.regex.Pattern.quote(jsonString(value))
    rawJson.rlike(s"[:,\\[]\\s*$quoted\\s*[,}\\]]")
  }

  def rawJsonHasSubstring(rawJson: Column, substrings: Seq[String]): Column =
    containsAny(rawJson, substrings)

  private def jsonString(v: String): String = "\"" + v + "\""
}
