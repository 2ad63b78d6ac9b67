package graft.mql

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import Ast._

/** Print→parse→resolve round-trip fuzzing: for any normalized AST the
  * printer emits concrete MQL that parses and resolves back to the same
  * AST. Hardens the grammar against precedence/tokenization drift. */
class MqlRoundTripSpec extends AnyFunSuite {

  private val loader: (String, String) => Option[String] = (_, _) => None

  private def roundTrip(t: TopQ): Either[String, TopQ] =
    try Right(Rewrites.resolve(MqlParser.parseTop(MqlPrinter.print(t)), loader, None))
    catch { case e: Exception => Left(s"${e.getMessage} for: ${MqlPrinter.print(t)}") }

  // ---- generators (normalized forms only) ----
  // namespace-position names must not collide with keywords (same
  // restriction as the reference's contextual lexer); name-after-colon
  // positions accept keywords — covered by the explicit test below
  private val someReserved = Set("join", "fids", "skip", "file", "from")
  private val nameG: Gen[String] = (for {
    a <- Gen.choose('a', 'z'); b <- Gen.listOfN(3, Gen.alphaLowerChar)
  } yield (a :: b).mkString).filterNot(someReserved)

  private val metaNameG: Gen[String] =
    for (a <- nameG; b <- nameG) yield s"$a.$b"

  private val objAttrG: Gen[String] =
    Gen.oneOf("creator", "name", "namespace", "size")

  private val constG: Gen[Const] = Gen.oneOf(
    Gen.choose(-1000L, 1000L).map(IntC.apply),
    Gen.choose(-100.0, 100.0).map(d => FloatC(math.rint(d * 100) / 100)),
    nameG.map(StringC.apply),
    Gen.oneOf(true, false).map(BoolC.apply))

  private val numConstG: Gen[Const] = Gen.oneOf(
    Gen.choose(-1000L, 1000L).map(IntC.apply),
    Gen.choose(-100.0, 100.0).map(d => FloatC(math.rint(d * 100) / 100)))

  private val scalarG: Gen[Scalar] = Gen.oneOf(
    metaNameG.map(MetaAttr.apply),
    objAttrG.map(ObjectAttr.apply),
    metaNameG.map(ArrayAny.apply),
    Gen.zip(metaNameG, Gen.choose(0, 5)).map { case (n, i) => SubscriptInt(n, i) },
    Gen.zip(metaNameG, nameG).map { case (n, k) => SubscriptKey(n, k) },
    metaNameG.map(ArrayLen.apply))

  private val cmpOpG: Gen[String] =
    Gen.oneOf("<", "<=", ">", ">=", "==", "!=", "~", "~*", "!~", "!~*")

  private def rangeEnds: Gen[(Const, Const)] = Gen.oneOf(
    Gen.zip(Gen.choose(-100L, 0L), Gen.choose(1L, 100L)).map { case (a, b) => (IntC(a), IntC(b)) },
    Gen.zip(nameG, nameG).map { case (a, b) => if (a <= b) (StringC(a), StringC(b)) else (StringC(b), StringC(a)) })

  private val atomG: Gen[MetaExp] = Gen.oneOf(
    for (l <- scalarG; op <- cmpOpG; c <- constG; n <- Gen.oneOf(true, false))
      yield Cmp(l, op, c, n),
    for (l <- scalarG; (lo, hi) <- rangeEnds; n <- Gen.oneOf(true, false))
      yield InRange(l, lo, hi, n),
    for (l <- scalarG; vs <- Gen.nonEmptyListOf(constG).map(_.take(4)); n <- Gen.oneOf(true, false))
      yield InSet(l, vs, n),
    for (n <- metaNameG; neg <- Gen.oneOf(true, false)) yield Present(n, neg),
    // the [all] normalized forms
    for (n <- metaNameG; (lo, hi) <- rangeEnds)
      yield InRange(ArrayAny(n), lo, hi, neg = true, elemInverted = true),
    for (n <- metaNameG; vs <- Gen.nonEmptyListOf(numConstG).map(_.take(3)))
      yield InSet(ArrayAny(n), vs, neg = true, elemInverted = true))

  private def metaG(depth: Int): Gen[MetaExp] =
    if (depth <= 0) atomG
    else Gen.frequency(
      3 -> atomG,
      1 -> Gen.listOfN(2, metaG(depth - 1)).map(cs => MAnd(flattenAnd(cs))),
      1 -> Gen.listOfN(2, metaG(depth - 1)).map(cs => MOr(flattenOr(cs))))

  private def flattenAnd(cs: List[MetaExp]): List[MetaExp] =
    cs.flatMap { case MAnd(i) => i; case e => List(e) }
  private def flattenOr(cs: List[MetaExp]): List[MetaExp] =
    cs.flatMap { case MOr(i) => i; case e => List(e) }

  private val selG: Gen[DatasetSel] = for {
    ns <- nameG; n <- nameG
    spec <- Gen.oneOf[DsSpec](DsExact(Some(ns), n), DsPattern(Some(ns), n + "%"),
      DsRegexp(Some(ns), n))
    subs <- Gen.oneOf(0, 1, 2)
    hav <- Gen.option(atomG)
  } yield DatasetSel(spec, subs > 0, subs == 2, hav)

  private val bfqG: Gen[FileQ] = for {
    sels <- Gen.listOfN(2, selG).map(_.distinct)
    useDs <- Gen.oneOf(true, false)
    where <- Gen.option(metaG(1))
    limit <- Gen.option(Gen.choose(1L, 500L))
    skip <- Gen.oneOf(Gen.const(0L), Gen.choose(1L, 100L))
    ordered <- Gen.oneOf(true, false)
  } yield {
    val s = if (skip > 0 && limit.isEmpty) skip else skip
    Bfq(if (useDs) sels else Nil, where,
      skip = s, limit = limit.map(l => math.max(1L, l - 0)),
      ordered = ordered || s > 0)
  }

  private val fileListG: Gen[FileQ] = Gen.oneOf(
    Gen.listOfN(2, Gen.zip(nameG, nameG)).map(ds =>
      FileListQ(ds.distinct.map { case (a, b) => (Some(a), b) }, Nil)),
    Gen.listOfN(3, nameG).map(f => FileListQ(Nil, f.distinct)))

  private def fileG(depth: Int): Gen[FileQ] =
    if (depth <= 0) Gen.oneOf(bfqG, fileListG)
    else Gen.frequency(
      4 -> bfqG,
      1 -> fileListG,
      1 -> Gen.listOfN(2, fileG(depth - 1)).map(qs => normUnion(qs)),
      1 -> Gen.listOfN(2, fileG(depth - 1)).map(qs => normJoin(qs)),
      1 -> Gen.zip(fileG(depth - 1), fileG(depth - 1)).map { case (a, b) => MinusQ(a, b) },
      1 -> fileG(depth - 1).map(ParentsOf.apply),
      1 -> fileG(depth - 1).map(ChildrenOf.apply),
      1 -> Gen.zip(Gen.oneOf("hash", "stride"), Gen.choose(2L, 9L), fileG(depth - 1))
        .map { case (f, m, q) => FilterQ(f, List(IntC(m), IntC(0)), Map.empty, List(q)) })

  private def normUnion(qs: List[FileQ]): FileQ =
    UnionQ(qs.flatMap { case UnionQ(i) => i; case q => List(q) })
  private def normJoin(qs: List[FileQ]): FileQ =
    JoinQ(qs.flatMap { case JoinQ(i) => i; case q => List(q) })

  private val topG: Gen[TopQ] = Gen.frequency(
    6 -> fileG(2).map(TopFileQ.apply),
    1 -> Gen.listOfN(2, selG).map(s => TopDatasetQ(s.distinct)),
    1 -> Gen.option(atomG).map(w => TopQueryQ(None, w)))

  test("keywords are legal names after a colon") {
    val t = TopFileQ(Bfq(List(Ast.DatasetSel(DsExact(Some("bmtk"), "join")))))
    assert(roundTrip(t) == Right(t))
    val f = TopFileQ(FileListQ(List((Some("ns1"), "limit")), Nil))
    assert(roundTrip(f) == Right(f))
  }

  test("print -> parse -> resolve is identity on normalized ASTs") {
    val prop = Prop.forAll(topG) { t =>
      roundTrip(t) match {
        case Right(back) if back == t => true
        case Right(back) =>
          println(s"MISMATCH\n  orig: $t\n  back: $back\n  text: ${MqlPrinter.print(t)}")
          false
        case Left(err) =>
          println(s"PARSE FAIL: $err")
          false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
