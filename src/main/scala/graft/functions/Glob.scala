package graft.functions

/** fnmatch-style glob → anchored Java regex, done at plan-build time so the
  * runtime predicate is a plain codegen'd RLIKE.
  *
  * Reference uses Python fnmatch for log_patterns
  * (streamalert/classifier/parsers.py:216) and rule helpers
  * (rules/helpers/base.py `matches_any`/`path_matches_any`). Supported glob
  * atoms: `*` `?` `[seq]` `[!seq]`; everything else is quoted.
  */
object Glob {
  def toRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\["); }
          else {
            val body0 = glob.substring(i + 1, close)
            val body = if (body0.startsWith("!")) "^" + body0.drop(1) else body0
            sb.append('[').append(body.replace("\\", "\\\\")).append(']')
            i = close
          }
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    sb.append('$').toString
  }
}
