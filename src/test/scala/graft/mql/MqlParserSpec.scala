package graft.mql

import org.scalatest.funsuite.AnyFunSuite
import Ast._

class MqlParserSpec extends AnyFunSuite {

  private def p(s: String): TopQ = MqlParser.parseTop(s)
  private def pf(s: String): FileQ = p(s) match {
    case TopFileQ(q) => q
    case other => fail(s"expected file query, got $other")
  }
  private def r(s: String, ns: Option[String] = None): FileQ =
    Rewrites.resolve(p(s), (a, b) => graft.metacat.DerivedCatalog.namedQueries.get((a, b)), ns) match {
      case TopFileQ(q) => q
      case other => fail(s"expected file query, got $other")
    }

  test("bare files") { assert(pf("files") == Bfq(Nil)) }

  test("bfq with dataset and where") {
    assert(r("files from dsns:ds0 where core.run > 500") ==
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0"))),
        where = Some(Cmp(MetaAttr("core.run"), ">", IntC(500)))))
  }

  test("comments stripped") {
    assert(r("files from dsns:ds0 # a comment\n where core.run > 5 # another") ==
      r("files from dsns:ds0 where core.run > 5"))
  }

  test("union flattening and sugar") {
    val q = r("union(files from dsns:ds0, [files from dsns:ds1, files from dsns:ds2])")
    assert(q.asInstanceOf[UnionQ].qs.length == 3)
  }

  test("join sugar and flattening") {
    val q = r("{files from dsns:ds0, join(files from dsns:ds1, files from dsns:ds2)}")
    assert(q.asInstanceOf[JoinQ].qs.length == 3)
  }

  test("minus is left-assoc, rhs binds postfixed expr") {
    val q = r("files from dsns:ds0 - files from dsns:ds1 - files from dsns:ds2")
    assert(q == MinusQ(MinusQ(
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0")))),
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds1"))))),
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds2"))))))
  }

  test("where binds to minus rhs") {
    val q = r("files from dsns:ds0 - files from dsns:ds1 where core.run > 2")
    val expected = MinusQ(
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0")))),
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds1"))),
        where = Some(Cmp(MetaAttr("core.run"), ">", IntC(2)))))
    assert(q == expected)
  }

  test("skip/limit sequential fold: limit 50 skip 50 is empty") {
    assert(r("files from dsns:ds0 limit 50 skip 50") == EmptyQ)
  }

  test("skip/limit fold: skip 100 limit 10") {
    assert(r("files from dsns:all skip 100 limit 10") ==
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "all"))),
        skip = 100, limit = Some(10), ordered = true))
  }

  test("skip then limit then skip composes in written order") {
    // skip 10 limit 20 skip 5 => skip 15, limit 15
    assert(r("files from dsns:all skip 10 limit 20 skip 5") ==
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "all"))),
        skip = 15, limit = Some(15), ordered = true))
  }

  test("limit 0 is empty") { assert(r("files from dsns:ds1 limit 0") == EmptyQ) }

  test("[all] converts to negated [any] with inverted op") {
    assert(r("files where core.runs[all] == 7") ==
      Bfq(Nil, where = Some(Cmp(ArrayAny("core.runs"), "!=", IntC(7), neg = true))))
    assert(r("files where core.runs[all] < 2") ==
      Bfq(Nil, where = Some(Cmp(ArrayAny("core.runs"), ">=", IntC(2), neg = true))))
  }

  test("[all] in set converts to neg-exists with inverted element predicate") {
    assert(r("files where core.runs[all] in (0, 1)") ==
      Bfq(Nil, where = Some(InSet(ArrayAny("core.runs"), List(IntC(0), IntC(1)),
        neg = true, elemInverted = true))))
    assert(r("files where core.runs[all] not in (0, 1)") ==
      Bfq(Nil, where = Some(InSet(ArrayAny("core.runs"), List(IntC(0), IntC(1)),
        neg = true, elemInverted = false))))
  }

  test("NOT pushes to leaves via De Morgan") {
    assert(r("files where !(core.run > 5 and opt.flag present)") ==
      Bfq(Nil, where = Some(MOr(List(
        Cmp(MetaAttr("core.run"), ">", IntC(5), neg = true),
        Present("opt.flag", neg = true))))))
  }

  test("!= vs not-in duality: ![any]== equals [all]!=") {
    assert(r("files where !(core.runs[any] == 3)") == r("files where core.runs[all] != 3"))
  }

  test("const in array; string gains regex OR") {
    assert(r("files where 5 in core.runs") ==
      Bfq(Nil, where = Some(Cmp(ArrayAny("core.runs"), "==", IntC(5)))))
    assert(r("""files where "x" in data.tags""") ==
      Bfq(Nil, where = Some(MOr(List(
        Cmp(ArrayAny("data.tags"), "==", StringC("x")),
        Cmp(MetaAttr("data.tags"), "~", StringC(".*x.*")))))))
    assert(r("""files where "x" not in data.tags""") ==
      Bfq(Nil, where = Some(MAnd(List(
        Cmp(ArrayAny("data.tags"), "==", StringC("x"), neg = true),
        Cmp(MetaAttr("data.tags"), "~", StringC(".*x.*"), neg = true))))))
  }

  test("datetime folds to float epoch") {
    assert(r("""files where core.ts > datetime("2020-01-01 00:00:00")""") ==
      Bfq(Nil, where = Some(Cmp(MetaAttr("core.ts"), ">", FloatC(1577836800.0)))))
  }

  test("date == expands to 24h window") {
    assert(r("""files where core.ts == date("2020-01-01")""") ==
      Bfq(Nil, where = Some(MAnd(List(
        Cmp(MetaAttr("core.ts"), ">=", FloatC(1577836800.0)),
        Cmp(MetaAttr("core.ts"), "<", FloatC(1577836800.0 + 86400)))))))
  }

  test("date range adds a day to the high end") {
    assert(r("""files where core.ts in date("2020-01-01"):date("2020-01-02")""") ==
      Bfq(Nil, where = Some(MAnd(List(
        Cmp(MetaAttr("core.ts"), ">=", FloatC(1577836800.0)),
        Cmp(MetaAttr("core.ts"), "<", FloatC(1577836800.0 + 2 * 86400)))))))
  }

  test("date in set rejected") {
    assertThrows[MqlSyntaxError](p("""files where core.ts in (date("2020-01-01"))"""))
  }

  test("mixed-type range rejected") {
    assertThrows[MqlSyntaxError](p("files where params.x in 3:5.0"))
  }

  test("subscripts") {
    assert(r("""files where core.bits["muon"] == 1 and core.runs[0] >= 100""") ==
      Bfq(Nil, where = Some(MAnd(List(
        Cmp(SubscriptKey("core.bits", "muon"), "==", IntC(1)),
        Cmp(SubscriptInt("core.runs", 0), ">=", IntC(100)))))))
  }

  test("len()") {
    assert(r("files where len(core.runs) == 3") ==
      Bfq(Nil, where = Some(Cmp(ArrayLen("core.runs"), "==", IntC(3)))))
  }

  test("object attributes vs meta attributes") {
    assert(r("""files where namespace == ns1 and size > 1000 and core.run == 5""") ==
      Bfq(Nil, where = Some(MAnd(List(
        Cmp(ObjectAttr("namespace"), "==", StringC("ns1")),
        Cmp(ObjectAttr("size"), ">", IntC(1000)),
        Cmp(MetaAttr("core.run"), "==", IntC(5)))))))
  }

  test("regex ops") {
    assert(r("""files where opt.note ~* "NOTE-o" and opt.note !~ "x"""") ==
      Bfq(Nil, where = Some(MAnd(List(
        Cmp(MetaAttr("opt.note"), "~*", StringC("NOTE-o")),
        Cmp(MetaAttr("opt.note"), "!~", StringC("x")))))))
  }

  test("file list with dids and fids") {
    assert(r("files ns1:f_1.dat, ns2:f_2.dat") ==
      FileListQ(List((Some("ns1"), "f_1.dat"), (Some("ns2"), "f_2.dat")), Nil))
    assert(r("fids F00000001, F00000002") ==
      FileListQ(Nil, List("F00000001", "F00000002")))
  }

  test("parents/children") {
    assert(r("parents(files from dsns:ds0)") ==
      ParentsOf(Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0"))))))
    assert(r("children(files from dsns:ds0 where core.run == 1)") ==
      ChildrenOf(Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0"))),
        where = Some(Cmp(MetaAttr("core.run"), "==", IntC(1))))))
  }

  test("with namespace scoping per docs") {
    val q = r("""with namespace = "x" union(files from A, with namespace = "y" join(files from B, files from C), files from D)""")
    val u = q.asInstanceOf[UnionQ]
    assert(u.qs(0) == Bfq(List(DatasetSel(DsExact(Some("x"), "A")))))
    assert(u.qs(1).asInstanceOf[JoinQ].qs.map(_.asInstanceOf[Bfq].datasets.head.spec) ==
      List(DsExact(Some("y"), "B"), DsExact(Some("y"), "C")))
    assert(u.qs(2) == Bfq(List(DatasetSel(DsExact(Some("x"), "D")))))
  }

  test("with scope is limited to the attached query (docs/mql.rst:425-441)") {
    // invalid per docs: the minus RHS gets no namespace
    assertThrows[Rewrites.MqlResolveError](
      r("""with namespace = "s" files from A - files from B"""))
    // parenthesized form is the documented correction
    val q = r("""with namespace = "s" (files from A - files from B)""")
    assert(q == MinusQ(
      Bfq(List(DatasetSel(DsExact(Some("s"), "A")))),
      Bfq(List(DatasetSel(DsExact(Some("s"), "B"))))))
  }

  test("explicit namespace overrides with") {
    val q = r("""with namespace = "x" union(files from A, files from y:B)""")
    val u = q.asInstanceOf[UnionQ]
    assert(u.qs(1) == Bfq(List(DatasetSel(DsExact(Some("y"), "B")))))
  }

  test("named query splice") {
    assert(r("files selected by q:runs_low") ==
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds1"))),
        where = Some(Cmp(MetaAttr("core.run"), "<", IntC(300)))))
  }

  test("named query inside union flattens") {
    val q = r("union(files selected by q:flagged, files from dsns:ds3)")
    assert(q.asInstanceOf[UnionQ].qs.length == 2)
  }

  test("datasets matching pattern translates glob") {
    assert(p("datasets matching dsns:ds*") ==
      TopDatasetQ(List(DatasetSel(DsPattern(Some("dsns"), "ds%")))))
  }

  test("datasets with subsets recursively having") {
    assert(p("datasets dsns:top with subsets recursively having ds.kind == shard") ==
      TopDatasetQ(List(DatasetSel(DsExact(Some("dsns"), "top"),
        withSubsets = true, recursively = true,
        having = Some(Cmp(MetaAttr("ds.kind"), "==", StringC("shard")))))))
  }

  test("queries query") {
    assert(p("""queries matching q:run* where q.len > 10""") ==
      TopQueryQ(Some(Left(DsPattern(Some("q"), "run%"))),
        Some(Cmp(MetaAttr("q.len"), ">", IntC(10)))))
  }

  test("filter with params") {
    val q = r("filter sample(0.5)(files from dsns:ds0)")
    assert(q == FilterQ("sample", List(FloatC(0.5)), Map.empty,
      List(Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0")))))))
  }

  test("filter with kw params") {
    val q = r("filter randomize(7, window=100)(files from dsns:ds0)")
    assert(q == FilterQ("randomize", List(IntC(7)), Map("window" -> IntC(100)),
      List(Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0")))))))
  }

  test("ordered flag") {
    assert(r("files from dsns:ds0 ordered") ==
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0"))), ordered = true))
  }

  test("empty propagation through set ops") {
    assert(r("union(files from dsns:ds0 limit 0, files from dsns:ds1)") ==
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds1")))))
    assert(r("join(files from dsns:ds0 limit 0, files from dsns:ds1)") == EmptyQ)
    assert(r("files from dsns:ds0 - files from dsns:ds1 limit 0") ==
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0")))))
  }

  test("chained wheres AND-merge into bfq") {
    assert(r("files from dsns:ds0 where core.run > 1 where core.run < 9") ==
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0"))),
        where = Some(MAnd(List(
          Cmp(MetaAttr("core.run"), ">", IntC(1)),
          Cmp(MetaAttr("core.run"), "<", IntC(9)))))))
  }

  test("where after limit stays outside bfq") {
    val q = r("files from dsns:ds0 limit 10 where core.run > 1")
    assert(q == WhereQ(
      Bfq(List(DatasetSel(DsExact(Some("dsns"), "ds0"))), limit = Some(10)),
      Cmp(MetaAttr("core.run"), ">", IntC(1))))
  }
}
