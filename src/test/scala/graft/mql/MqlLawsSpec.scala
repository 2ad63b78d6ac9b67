package graft.mql

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import Ast._

/** Algebraic laws the reference guarantees (SURVEY.md §5), checked with
  * scalacheck over the pure front-end:
  *  - sequential skip/limit fold (docs/mql.rst:749-804)
  *  - NOT is an involution after push-down
  *  - [all]/[any] De Morgan duality at the AST level
  */
class MqlLawsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  private def resolve(q: String): FileQ =
    Rewrites.resolve(MqlParser.parseTop(q), (_, _) => None, None) match {
      case TopFileQ(f) => f
      case other => fail(other.toString)
    }

  // reference model of sequential skip/limit over a concrete stream
  private def modelSkipLimit(n: Int, clauses: List[(String, Int)]): Vector[Int] =
    clauses.foldLeft((0 until n).toVector) {
      case (acc, ("skip", k)) => acc.drop(k)
      case (acc, ("limit", k)) => acc.take(k)
      case (acc, _) => acc
    }

  test("skip/limit fold matches the stream model") {
    val clauseGen = for {
      kind <- Gen.oneOf("skip", "limit")
      k <- Gen.choose(0, 30)
    } yield (kind, k)
    val prop = Prop.forAll(Gen.listOfN(4, clauseGen), Gen.choose(0, 100)) {
      (clauses, n) =>
        // fold through the AST machinery
        val (skip, limit) = clauses.foldLeft((0L, Option.empty[Long])) {
          case ((s, l), ("skip", k)) => mergeSkipLimit(s, l, skip = k)
          case ((s, l), ("limit", k)) => mergeSkipLimit(s, l, limit = Some(k))
          case (acc, _) => acc
        }
        val folded = (0 until n).toVector
          .drop(skip.toInt)
          .take(limit.map(_.toInt).getOrElse(n))
        folded == modelSkipLimit(n, clauses)
    }
    check(prop)
  }

  test("parsed skip/limit chains fold to the same single clause") {
    // limit 50 skip 50 => empty; skip a limit b skip c == skip a+c limit b-c
    assert(resolve("files from a:d limit 50 skip 50") == EmptyQ)
    val q1 = resolve("files from a:d skip 10 limit 20 skip 5 limit 100")
    assert(q1 == Bfq(List(DatasetSel(DsExact(Some("a"), "d"))),
      skip = 15, limit = Some(15), ordered = true))
  }

  test("double negation is identity on meta expressions") {
    val exprs = Seq(
      "core.x > 5", "core.x not in 1:10", "core.x in (1, 2)",
      "opt.f present", "core.xs[any] == 3", "core.xs[all] != 3",
      "core.x > 5 and opt.f present", "core.x > 5 or core.y < 1")
    for (e <- exprs)
      assert(resolve(s"files where !(!($e))") == resolve(s"files where $e"),
        s"!!($e) != $e")
  }

  test("[all]/[any] duality through NOT") {
    assert(resolve("files where !(core.xs[any] == 3)") ==
      resolve("files where core.xs[all] != 3"))
    assert(resolve("files where !(core.xs[all] == 3)") ==
      resolve("files where core.xs[any] != 3"))
    assert(resolve("files where !(core.xs[any] in (1,2))") ==
      resolve("files where core.xs[all] not in (1,2)"))
    assert(resolve("files where !(core.xs[any] in 1:2)") ==
      resolve("files where core.xs[all] not in 1:2"))
  }

  test("De Morgan push-down") {
    assert(resolve("files where !(core.x > 5 and core.y < 1)") ==
      resolve("files where !(core.x > 5) or !(core.y < 1)"))
    assert(resolve("files where !(core.x > 5 or core.y < 1)") ==
      resolve("files where !(core.x > 5) and !(core.y < 1)"))
  }

  test("union/join flattening is associative") {
    assert(resolve("union(files from a:x, union(files from a:y, files from a:z))") ==
      resolve("union(union(files from a:x, files from a:y), files from a:z)"))
    assert(resolve("{files from a:x, {files from a:y, files from a:z}}") ==
      resolve("{{files from a:x, files from a:y}, files from a:z}"))
  }
}
