package graft.mql

import org.apache.spark.sql.functions._

/** Golden corpus: every documented match/no-match example from
  * docs/mql.rst:490-580 plus the missing-key / type-strictness corners of
  * SURVEY.md §7.4, evaluated end-to-end (parse → resolve → compile →
  * filter) against a handcrafted metadata dict. */
class MetaSemanticsSpec extends SparkTestBase {

  // docs/mql.rst:500-512 metadata
  private val docMeta =
    """{
      |"data.run_type": "calibration",
      |"data.trigger_mask": [0,1,0,0,1],
      |"data.trigger_bits": {"muon": 1, "electron": 0},
      |"detector.modules": ["a1", "a2", "a3"],
      |"data.sequence": [1,1,2,3,5,8,13],
      |"data.bits": [0,1,1,0,0],
      |"data.e": 1.5,
      |"data.s": "1.5",
      |"data.debug": true,
      |"core.ts": 1591012800
      |}""".stripMargin.replace("\n", "")

  private lazy val cat = new TinyCatalog(spark, Seq(("f1", docMeta)))

  private def matches(where: String): Boolean =
    Mql.query(spark, cat, s"files from t:d where $where").count() == 1

  private def expectMatch(where: String): Unit =
    assert(matches(where), s"expected MATCH: $where")
  private def expectNoMatch(where: String): Unit =
    assert(!matches(where), s"expected NO match: $where")

  test("dict subscript (docs/mql.rst:515-518)") {
    expectMatch("""data.trigger_bits["muon"] == 1""")
    expectNoMatch("""data.trigger_bits["proton"] == 1""")
    expectMatch("data.trigger_mask[3] == 0")
  }

  test("[any]/[all] on dict values and arrays (docs/mql.rst:520-527)") {
    expectMatch("data.trigger_bits[any] == 1")
    expectMatch("data.trigger_bits[any] != 1") // electron=0
    expectNoMatch("data.trigger_bits[all] == 1")
    expectNoMatch("data.trigger_bits[all] != 1")
    expectMatch("data.trigger_bits[all] < 2")
  }

  test("in / not in array (docs/mql.rst:529-533)") {
    expectMatch(""""a1" in detector.modules""")
    expectMatch(""""xyz" not in detector.modules""")
  }

  test("negation duality (docs/mql.rst:534-538)") {
    expectNoMatch("data.trigger_bits[all] != 1")
    expectMatch("!(data.trigger_bits[all] == 1)")
  }

  test("len() (docs/mql.rst:539)") {
    expectMatch("len(data.trigger_mask) > 2")
    expectMatch("len(data.trigger_mask) == 5")
    expectNoMatch("len(data.trigger_bits) > 0") // dict is not an array
  }

  test("range vs elementwise (docs/mql.rst:559-574)") {
    expectNoMatch("data.sequence[any] in 6:7")
    expectMatch("data.sequence[any] >= 6 and data.sequence[any] <= 7")
  }

  test("[all] in set vs or of [all] (docs/mql.rst:576-580)") {
    expectNoMatch("data.bits[all] == 0 or data.bits[all] == 1")
    expectMatch("data.bits[all] in (0, 1)")
  }

  test("missing key => raw false, neg applies after") {
    expectNoMatch("no.such == 5")
    expectNoMatch("no.such != 5")
    expectMatch("!(no.such == 5)")
    expectNoMatch("no.such present")
    expectMatch("no.such not present")
    expectMatch("no.such[all] != 3") // vacuous forall
    expectNoMatch("no.such[any] != 3")
    expectNoMatch("len(no.such) >= 0")
    expectNoMatch("no.such in 1:10")
    expectMatch("no.such not in 1:10")
    expectNoMatch("no.such in (1,2)")
    expectMatch("no.such not in (1,2)")
  }

  test("number vs string strictness (docs/mql.rst:165-172)") {
    expectMatch("data.e == 1.5")
    expectNoMatch("data.e == \"1.5\"")
    expectMatch("""data.s == "1.5"""")
    expectNoMatch("data.s == 1.5")
    expectMatch("data.e > 1") // int/float widening
    expectNoMatch("data.s > 1") // string never compares to number
  }

  test("int/float widening") {
    expectMatch("data.trigger_bits[\"muon\"] == 1.0")
    expectMatch("data.e in 1:2")
    expectNoMatch("data.s in 1:2") // string value, numeric range
  }

  test("booleans") {
    expectMatch("data.debug == true")
    expectNoMatch("data.debug == false")
    expectNoMatch("data.debug == 1") // strict: bool is not a number
  }

  test("regex search is unanchored; * = case-insensitive") {
    expectMatch("""data.run_type ~ "alibr"""")
    expectNoMatch("""data.run_type ~ "ALIBR"""")
    expectMatch("""data.run_type ~* "ALIBR"""")
    expectMatch("""data.run_type !~ "xyz"""")
    expectNoMatch("""data.run_type !~ "calib"""")
    // regex against a number: type mismatch => false
    expectNoMatch("""data.e ~ "1.5"""")
  }

  test("regex dialect conformance (docs/regexp.rst)") {
    // unanchored substring search by default; ^ $ anchor; classes; escaped dot
    expectMatch("""data.run_type ~ "^calib"""")
    expectNoMatch("""data.run_type ~ "^alib"""")
    expectMatch("""data.run_type ~ "tion$"""")
    expectNoMatch("""data.run_type ~ "^calibration.$"""")
    expectMatch("""data.run_type ~ "^calibration$"""")
    expectMatch("""data.run_type ~ "cali.ration"""")
    expectMatch("""data.run_type ~ "[abc]alibration"""")
    expectNoMatch("""data.run_type ~ "[^abc]alibration"""")
    expectMatch("""data.run_type ~ "c(ali)+bration"""")
    expectMatch("""name ~ "f1\.dat"""")
    expectNoMatch("""name ~ "f2\.dat"""")
  }

  test("subscript out of range / wrong kind => false") {
    expectNoMatch("data.trigger_mask[99] == 0")
    expectNoMatch("""data.run_type["k"] == 1""")
    expectNoMatch("data.run_type[0] == \"c\"")
    // int subscript on a DICT: KeyError in the reference evaluator
    expectNoMatch("data.trigger_bits[0] == 1")
    expectMatch("!(data.trigger_bits[0] == 1)")
    // string subscript on an ARRAY
    expectNoMatch("""data.trigger_mask["muon"] == 1""")
  }

  test("[any] on scalar => false; [all] on scalar => vacuous true") {
    expectNoMatch("data.e[any] == 1.5")
    expectMatch("data.e[all] == 1.5") // ¬∃¬ on a non-array
  }

  test("object attributes") {
    expectMatch("size == 100")
    expectMatch("creator == u")
    expectMatch("namespace == t")
    expectMatch("""name ~ "f1"""")
    expectMatch("""created_timestamp > datetime("2020-01-01")""")
    expectMatch("""created_timestamp < datetime("2021-01-01")""")
  }

  test("datetime/date windows on numeric epoch metadata") {
    // core.ts = 1591012800 = 2020-06-01 12:00:00 UTC
    expectMatch("""core.ts == date("2020-06-01")""")
    expectNoMatch("""core.ts == date("2020-06-02")""")
    expectMatch("""core.ts != date("2020-06-02")""")
    expectMatch("""core.ts in date("2020-05-01"):date("2020-06-01")""")
    expectMatch("""core.ts >= datetime("2020-06-01 12:00:00")""")
    expectNoMatch("""core.ts > datetime("2020-06-01 12:00:00")""")
  }

  test("and/or of atoms with missing keys") {
    expectMatch("data.e == 1.5 and no.such not present")
    expectMatch("no.such == 1 or data.e == 1.5")
    expectNoMatch("no.such == 1 and data.e == 1.5")
  }
}
