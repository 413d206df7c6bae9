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
    * (r18 advice). */
  private val unparseable = Set('a', 'W', 'v')

  def mysqlToJdk(fmt: String): String = {
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
        else if (unparseable.contains(t))
          throw new IllegalArgumentException(
            s"date_parse: MySQL format token %$t is not supported for " +
              s"parsing (Spark 4 rejects its day-name/week-based JDK " +
              s"pattern) in '$fmt'")
        else tokens.get(t) match {
          case Some(j) => flushLit(); out.append(j)
          case None => throw new IllegalArgumentException(
            s"date_parse: unsupported MySQL format token %$t in '$fmt'")
        }
        i += 2
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }
}
