package graft.mql

/** Postgres-ARE → Java-regex dialect bridge for MQL's `~ ~* !~ !~*`
  * operators (reference surface: `docs/regexp.rst` — the patterns users
  * write are evaluated by Postgres in the reference, by Java's
  * `java.util.regex` in this engine via `rlike`).
  *
  * The two engines agree on the whole cheat-sheet core (literals, `.`,
  * quantifiers, alternation, groups, `[abc]`/`[0-9]`/`[^…]` classes,
  * anchors, escaped metacharacters, `\d \w \s` shorthands, `(?i)` inline
  * flags, backreferences, bounded `{m,n}`). This pass bridges the
  * documented divergences:
  *
  *  - **POSIX bracket classes** `[[:digit:]]` etc.: Postgres-native;
  *    Java would silently parse the inner `[:digit:]` as a literal
  *    character class. Translated to the `\p{…}` equivalents. Unknown
  *    class names fail loudly (as they do in Postgres).
  *  - **Word boundaries**: Postgres spells them `\y` (and `\m`/`\M` for
  *    word start/end); Java's `\y` is a pattern-syntax error. Translated
  *    to `\b` / `\b(?=\w)` / `\b(?<=\w)` outside character classes.
  *  - **Newline sensitivity**: Postgres `~` is non-newline-sensitive by
  *    default (`.` matches `\n`); Java's `.` does not. Compiled with
  *    `(?s)`, restoring reference behavior.
  *
  * Remaining documented divergence (not bridged): Java `\b` is a word
  * boundary while Postgres ARE treats `\b` as backspace — a pattern
  * relying on matching an actual backspace character via `\b` behaves
  * differently here. `\y` is the portable spelling.
  */
object RegexDialect {

  private val Posix = Map(
    "alpha" -> "\\p{Alpha}", "digit" -> "\\p{Digit}", "alnum" -> "\\p{Alnum}",
    "upper" -> "\\p{Upper}", "lower" -> "\\p{Lower}", "space" -> "\\p{Space}",
    "punct" -> "\\p{Punct}", "xdigit" -> "\\p{XDigit}", "cntrl" -> "\\p{Cntrl}",
    "print" -> "\\p{Print}", "graph" -> "\\p{Graph}", "blank" -> "\\p{Blank}",
    "word" -> "\\w")

  /** translate a Postgres-dialect pattern to the Java pattern `rlike`
    * evaluates; `caseInsensitive` compiles the `~*`/`!~*` forms */
  def toJava(pg: String, caseInsensitive: Boolean = false): String = {
    val sb = new StringBuilder(if (caseInsensitive) "(?is)" else "(?s)")
    var i = 0
    var inClass = false
    var classStart = -1 // position just after `[` (or `[^`): a `]` there is literal
    while (i < pg.length) {
      val c = pg.charAt(i)
      if (c == '\\' && i + 1 < pg.length) {
        val n = pg.charAt(i + 1)
        if (!inClass && n == 'y') sb.append("\\b")
        else if (!inClass && n == 'm') sb.append("\\b(?=\\w)")
        else if (!inClass && n == 'M') sb.append("\\b(?<=\\w)")
        else sb.append(c).append(n)
        i += 2
      } else if (inClass && c == '[' && i + 1 < pg.length && pg.charAt(i + 1) == ':') {
        val end = pg.indexOf(":]", i + 2)
        if (end < 0)
          throw new IllegalArgumentException(
            s"unterminated POSIX class in regex: ${pg.substring(i)}")
        val name = pg.substring(i + 2, end)
        sb.append(Posix.getOrElse(name,
          throw new IllegalArgumentException(
            s"invalid POSIX character class name [:$name:] in regex: $pg")))
        i = end + 2
      } else if (!inClass && c == '[') {
        inClass = true
        sb.append(c)
        i += 1
        if (i < pg.length && pg.charAt(i) == '^') { sb.append('^'); i += 1 }
        classStart = i
      } else if (inClass && c == ']' && i == classStart) {
        // POSIX: `]` first in a class is a literal; Java needs it escaped
        sb.append("\\]")
        i += 1
      } else if (inClass && c == ']') {
        inClass = false
        sb.append(c)
        i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
