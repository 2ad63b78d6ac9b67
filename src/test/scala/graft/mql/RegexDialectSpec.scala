package graft.mql

/** Golden conformance corpus for MQL's regex operators (`~ ~* !~ !~*`)
  * against the Postgres dialect the reference evaluates them in
  * (`docs/regexp.rst`; compiled via `dbobjects2.py`'s `meta_regexp`).
  * Each row is (pattern, input, matches-in-Postgres) — derived from the
  * reference cheat sheet and documented Postgres ARE behavior — asserted
  * end-to-end through parse → resolve → [[RegexDialect]] → `rlike`.
  *
  * Divergences that remain (documented in [[RegexDialect]]) get explicit
  * pinning tests so a behavior change can never be silent.
  */
class RegexDialectSpec extends SparkTestBase {

  // one file per candidate string; `t.s ~ pattern` selects a subset
  private val inputs = Seq(
    "calibration", "physics", "run-2026-03", "a.b", "axb", "aXb",
    "a\nb", "file-data-2026", "UPPER", "lower", "12345", "x9",
    "]literal", "word one", "backref-abab", "tab\tsep")
  private lazy val cat = new TinyCatalog(spark,
    inputs.zipWithIndex.map { case (s, i) =>
      (s"f$i", s"""{"t.s": ${ujsonStr(s)}}""")
    })

  /** minimal JSON string quoting for the fixture metadata */
  private def ujsonStr(s: String): String =
    "\"" + s.flatMap {
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    } + "\""

  private def matched(op: String, pattern: String): Set[String] = {
    import org.apache.spark.sql.functions.col
    Mql.query(spark, cat, s"""files from t:d where t.s $op "$pattern" """)
      .select(col("fid")).collect().map(_.getString(0)).toSet
  }

  private def strings(op: String, pattern: String): Set[String] =
    matched(op, pattern).map(f => inputs(f.drop(1).toInt))

  /** assert `pattern` (under `~`) matches exactly `want` of the inputs */
  private def conform(pattern: String, want: Set[String]): Unit = {
    val got = strings("~", pattern)
    assert(got == want,
      s"~ '$pattern': got ${got.mkString("{", ",", "}")} want ${want.mkString("{", ",", "}")}")
  }

  test("cheat-sheet core: identical in both dialects (docs/regexp.rst)") {
    conform("a.b", Set("a.b", "axb", "aXb", "a\nb")) // unanchored substring search
    conform("a\\.b", Set("a.b"))                     // escaped dot
    conform("^cal", Set("calibration"))              // anchored start
    conform("ics$", Set("physics"))                  // anchored end
    conform("^physics$", Set("physics"))             // whole string
    conform("a[xX]b", Set("axb", "aXb"))             // class list
    conform("run-[0-9]+", Set("run-2026-03"))        // range + one-or-more
    conform("a[^.x]b", Set("aXb", "a\nb"))           // negated class ([^…] spans \n in BOTH)
    conform("^x?9", Set("x9"))                       // optional
    conform("(ab)+", Set("backref-abab", "tab\tsep")) // group quantifier (unanchored)
    conform("(ab)\\1", Set("backref-abab"))          // backreference
    conform("cal|phys", Set("calibration", "physics"))
    conform("^[0-9]{5}$", Set("12345"))              // bounded repeat
    conform("\\d\\d", Set("run-2026-03", "file-data-2026", "12345"))
    conform("\\s", Set("word one", "tab\tsep", "a\nb"))
  }

  test("case-insensitive arm ~* and negations !~ / !~*") {
    assert(strings("~*", "upper") == Set("UPPER"))
    assert(strings("~*", "^LOWER$") == Set("lower"))
    // negation = complement among PRESENT string values
    assert(strings("!~", "a") == inputs.filterNot(_.contains("a")).toSet)
    assert(strings("!~*", "A") == inputs.filterNot(_.toLowerCase.contains("a")).toSet)
  }

  test("POSIX bracket classes translate (PG-native, Java-alien)") {
    conform("^[[:digit:]]+$", Set("12345"))
    conform("[[:upper:]]{2}", Set("UPPER"))
    conform("^[[:lower:]]+$", Set("calibration", "physics", "lower", "axb"))
    conform("[[:space:]]", Set("word one", "tab\tsep", "a\nb"))
    conform("[^[:alnum:][:space:]]", // punctuation-bearing strings
      Set("run-2026-03", "a.b", "file-data-2026", "]literal", "backref-abab"))
    conform("x[[:digit:]]", Set("x9"))
    // unknown class name fails loudly, as in Postgres
    assertThrows[IllegalArgumentException](strings("~", "[[:bogus:]]"))
  }

  test("PG word-boundary spellings \\y \\m \\M translate") {
    conform("\\yone\\y", Set("word one"))
    conform("\\yword\\y", Set("word one"))
    conform("\\mone", Set("word one"))   // word start
    conform("one\\M", Set("word one"))   // word end
    conform("\\ycal\\y", Set.empty)      // 'cal' is not a whole word
  }

  test("newline sensitivity: PG default, '.' crosses newlines") {
    conform("a.b", Set("a.b", "axb", "aXb", "a\nb"))
    conform("^a.b$", Set("a.b", "axb", "aXb", "a\nb"))
  }

  test("leading ] in a class is literal (POSIX), bridged for Java") {
    conform("^[]l]+iteral", Set("]literal"))
  }

  test("documented residual divergence: \\b is Java word-boundary, PG backspace") {
    // pinned so any dialect change surfaces here; portable spelling is \y
    assert(strings("~", "\\bone\\b") == Set("word one"))
  }
}
