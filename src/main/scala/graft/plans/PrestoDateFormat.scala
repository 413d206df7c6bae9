package graft.plans

/** MySQL-style date format → JDK DateTimeFormatter pattern, for the
  * `date_parse` Presto alias (Presto/Athena use MySQL `%`-tokens —
  * presto.io/docs/current/functions/datetime.html, public docs; the
  * reference's users write them in CloudTrail/ALB packs). STRICT: an
  * unsupported `%x` throws instead of silently misparsing timestamps.
  * Literal runs are single-quoted so alphabetic separators (the ISO 'T',
  * 'Z') cannot collide with JDK pattern letters. */
object PrestoDateFormat {

  private val tokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy",
    'm' -> "MM", 'c' -> "M",
    'd' -> "dd", 'e' -> "d",
    'H' -> "HH", 'k' -> "H",
    'h' -> "hh", 'I' -> "hh", 'l' -> "h",
    'i' -> "mm",
    's' -> "ss", 'S' -> "ss",
    'f' -> "SSSSSS",
    'p' -> "a",
    'j' -> "DDD",
    'b' -> "MMM", 'M' -> "MMMM",
    'T' -> "HH:mm:ss",
    'r' -> "hh:mm:ss a")

  /** Tokens whose JDK mappings (EEE/EEEE/ww) Spark 4 REJECTS for parsing
    * (unsupportedLettersForParsing bans 'E'; week-based 'w' is banned
    * outright as DATETIME_WEEK_BASED_PATTERN) — mapping them would trade
    * this mapper's clean error for a confusing cross-version one at
    * runtime, so they throw the same strict exception as unknown tokens
    * (r18 advice). In OUTPUT mode (`date_format`, r19) the day-name
    * tokens are legal — 'E' is only banned for parsing — while %v stays
    * banned both ways (Spark rejects every week-based pattern letter in
    * both directions). */
  private val unparseable = Set('a', 'W', 'v')
  private val outputOnly: Map[Char, String] = Map('a' -> "EEE", 'W' -> "EEEE")

  def mysqlToJdk(fmt: String): String = mysqlToJdk(fmt, forOutput = false)

  def mysqlToJdk(fmt: String, forOutput: Boolean): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      // only letter-bearing runs can collide with JDK pattern letters;
      // plain separators (-, :, space) pass through unquoted
      if (s.exists(c => c.isLetter || c == '\''))
        out.append('\'').append(s.replace("'", "''")).append('\'')
      else out.append(s)
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        require(i + 1 < fmt.length, s"dangling %% at end of '$fmt'")
        val t = fmt.charAt(i + 1)
        if (t == '%') lit.append('%')
        else if (!forOutput && unparseable.contains(t))
          throw new IllegalArgumentException(
            s"date_parse: MySQL format token %$t is not supported for " +
              s"parsing (Spark 4 rejects its day-name/week-based JDK " +
              s"pattern) in '$fmt'")
        else if (forOutput && t == 'v')
          throw new IllegalArgumentException(
            s"date_format: MySQL format token %v is not supported " +
              s"(Spark rejects every week-based JDK pattern letter; " +
              s"use the week() function instead) in '$fmt'")
        else (if (forOutput) tokens ++ outputOnly else tokens).get(t) match {
          case Some(j) => flushLit(); out.append(j)
          case None => throw new IllegalArgumentException(
            s"date_${if (forOutput) "format" else "parse"}: unsupported " +
              s"MySQL format token %$t in '$fmt'")
        }
        i += 2
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }
}
