package graft.metacat

import graft.mql.SparkTestBase
import Validation.{Category, Constraint}

/** Pins the reference's `validate_metadata` control flow
  * (validation.py:42-147): check precedence, element-wise list
  * validation, and the category closure of the server-side flow
  * (data_handler.py:603-627). */
class ValidationSpec extends SparkTestBase {

  private def errorsFor(metaJson: String, cs: Seq[Constraint]): Seq[String] = {
    import spark.implicits._
    Validation.validate(
      Seq(("f1", metaJson)).toDF("fid", "metadata_json"), cs)
      .collect().map(_.getString(1)).toSeq
  }

  private def catErrors(metaJson: String, cats: Seq[Category]): Seq[String] = {
    import spark.implicits._
    Validation.categoryViolations(
      Seq(("f1", metaJson)).toDF("fid", "metadata_json"), cats)
      .collect().map(_.getString(1)).toSeq
  }

  test("values present skips pattern/min/max (reference else-branch)") {
    val c = Seq(Constraint("a.x", typ = Some("int"), values = Nil,
      numValues = Seq(500), min = Some(0), max = Some(10)))
    // 500 violates max but IS the enum value -> reference accepts
    assert(errorsFor("""{"a.x":500}""", c).isEmpty)
    assert(errorsFor("""{"a.x":7}""", c).exists(_.contains("enumeration")))
  }

  test("type mismatch reports only the type error") {
    val c = Seq(Constraint("a.x", typ = Some("int"), min = Some(100)))
    val errs = errorsFor("""{"a.x":"tiny"}""", c)
    assert(errs.size == 1 && errs.head.contains("declared type int"))
  }

  test("declared type any accepts everything, no value checks") {
    val c = Seq(Constraint("a.x", typ = Some("any"), min = Some(100),
      pattern = Some("zzz")))
    assert(errorsFor("""{"a.x":1}""", c).isEmpty)
    assert(errorsFor("""{"a.x":"nope"}""", c).isEmpty)
  }

  test("boolean/list/dict typed parameters skip enum and range checks") {
    val cs = Seq(
      Constraint("a.b", typ = Some("boolean"), values = Seq("true")),
      Constraint("a.l", typ = Some("list"), min = Some(100)),
      Constraint("a.d", typ = Some("dict"), pattern = Some("x")))
    assert(errorsFor("""{"a.b":false,"a.l":[1],"a.d":{"k":1}}""", cs).isEmpty)
  }

  test("pattern applies only to text types and is start-anchored (re.match)") {
    // no declared type -> pattern not checked (validation.py:119 gates on typ)
    assert(errorsFor("""{"a.x":"nope"}""",
      Seq(Constraint("a.x", pattern = Some("t[0-9]")))).isEmpty)
    val txt = Seq(Constraint("a.x", typ = Some("text"), pattern = Some("t[0-9]")))
    assert(errorsFor("""{"a.x":"t5-suffix-ok"}""", txt).isEmpty) // prefix match
    assert(errorsFor("""{"a.x":"xt5"}""", txt).exists(_.contains("pattern")))
  }

  test("list values validate element-wise for min/max and pattern") {
    val rng = Seq(Constraint("a.n", typ = Some("int[]"), min = Some(0), max = Some(10)))
    assert(errorsFor("""{"a.n":[0,5,10]}""", rng).isEmpty)
    assert(errorsFor("""{"a.n":[0,11]}""", rng).exists(_.contains("above max")))
    assert(errorsFor("""{"a.n":[-1,5]}""", rng).exists(_.contains("below min")))
    val pat = Seq(Constraint("a.t", typ = Some("text[]"), pattern = Some("t[0-9]")))
    assert(errorsFor("""{"a.t":["t1","t2"]}""", pat).isEmpty)
    assert(errorsFor("""{"a.t":["t1","no"]}""", pat).exists(_.contains("pattern")))
  }

  // ---- category closure ----

  private val cats = Seq(
    Category("core", restricted = true, constraints = Seq(
      Constraint("core.run", typ = Some("int"), min = Some(0)),
      Constraint("core.tag"))),
    Category("open", restricted = false, constraints = Seq(
      Constraint("open.x", typ = Some("int")))))

  test("restricted category rejects undeclared parameters, accepts declared") {
    assert(catErrors("""{"core.run":5,"core.tag":"t"}""", cats).isEmpty)
    assert(catErrors("""{"core.other":1}""", cats)
      .exists(_.contains("not allowed in restricted category core")))
    // declared parameters still validate against their definitions
    assert(catErrors("""{"core.run":-3}""", cats).exists(_.contains("below min")))
  }

  test("non-restricted category allows undeclared params but checks declared ones") {
    assert(catErrors("""{"open.anything":"ok"}""", cats).isEmpty)
    assert(catErrors("""{"open.x":"not-int"}""", cats)
      .exists(_.contains("declared type int")))
  }

  test("nearest existing ancestor's restricted flag governs unknown subcategories") {
    // core.sub is not a category; ancestor core IS and is restricted
    assert(catErrors("""{"core.sub.k":1}""", cats)
      .exists(_.contains("category core is restricted")))
    // open.sub.k walks to non-restricted open -> allowed
    assert(catErrors("""{"open.sub.k":1}""", cats).isEmpty)
    // unrelated category paths have no categories at all -> allowed
    assert(catErrors("""{"free.k":1}""", cats).isEmpty)
  }

  test("dot-less keys are rejected (parameter without a category)") {
    assert(catErrors("""{"nocat":1}""", cats).exists(_.contains("without a category")))
    assert(catErrors("""{"nocat":1}""", Nil).exists(_.contains("without a category")))
  }
}
