package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
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

  /** get_first_key / deep value search over the RAW JSON payload
    * (shared/utils.py:79-145 BFS deep search; rules/helpers/base.py
    * data_has_value family). The declared-schema fast path is a static
    * field-path predicate (preferred; see SURVEY §7.4) — these dynamic
    * variants regex-scan the serialized record, matching the reference's
    * "value anywhere in the record" semantics for scalar needles.
    */
  def dataHasValue(rawJson: Column, value: String): Column = {
    val quoted = java.util.regex.Pattern.quote(jsonString(value))
    rawJson.rlike(s"[:,\\[]\\s*$quoted\\s*[,}\\]]")
  }

  def dataHasValueFromSubstringList(rawJson: Column, substrings: Seq[String]): Column =
    substrings.map(ss => rawJson.contains(ss)).reduceOption(_ || _).getOrElse(lit(false))

  private def jsonString(v: String): String = "\"" + v + "\""
}
