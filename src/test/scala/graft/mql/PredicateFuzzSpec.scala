package graft.mql

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.metacat.DerivedCatalog
import Ast._

/** Model-based differential fuzzing of the metadata predicate compiler:
  * a clean-room, pure-Scala second implementation of the truth table
  * (raw-false-then-XOR-neg, strict typing, [any]/[all] over arrays and
  * dict values) is evaluated against per-file model metadata computed
  * straight from the derivation rules; random predicates must produce the
  * same matching-file count through the whole engine (parse → resolve →
  * Variant compile → execute). */
class PredicateFuzzSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new DerivedCatalog(spark, dir)

  /** model rows: (metadata map, object attrs) straight from the derivation */
  private lazy val model: Seq[Map[String, Any]] = {
    spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice", "o_orderdate")
      .withColumn("ts", unix_timestamp(col("o_orderdate")))
      .collect().toSeq
      .filter(r => r.getLong(0) % 97 != 0) // not retired
      .map { r =>
        val k = r.getLong(0)
        val ck = r.getLong(1)
        val run = k % 1000
        val runs = Seq(run, run + 1000, run + 2000).take(1 + (k % 3).toInt)
        val tags = (0 to 3).map(i => s"tag${(k + i) % 7}").take(1 + (k % 4).toInt)
        val attrs = Map[String, Any](
          "@size" -> (k * 100 + ck % 100),
          "@creator" -> s"user${ck % 10}",
          "@namespace" -> s"ns${ck % 4}",
          "@name" -> s"f_$k.dat",
          "@created_timestamp" -> r.getLong(6))
        val base = attrs ++ Map[String, Any](
          "core.run" -> run,
          "core.status" -> r.getString(2),
          "core.priority" -> r.getString(3),
          "core.runs" -> runs,
          "core.bits" -> Map("muon" -> k % 2, "electron" -> (k + 1) % 2),
          "core.ts" -> r.getLong(6),
          "data.tags" -> tags,
          "data.price" -> r.getDouble(4),
          "data.weight" -> (if (k % 2 == 0) k % 100 else s"w${k % 100}"))
        val withFlag = if (k % 5 == 0) base + ("opt.flag" -> (k % 10 == 0)) else base
        if (k % 7 == 0) withFlag + ("opt.note" -> s"note-${r.getString(2)}-${k % 13}") else withFlag
      }
  }

  private def eval(m: Map[String, Any], e: MetaExp): Boolean =
    ModelEval.evalMeta(m, e)

  // ---- predicate generator over the real key population ----
  private val keysScalar = Seq("core.run", "core.status", "core.priority",
    "core.ts", "data.price", "data.weight", "opt.flag", "opt.note", "no.such")
  private val keysArray = Seq("core.runs", "data.tags", "core.bits", "no.such")

  private val constG: Gen[Const] = Gen.oneOf(
    Gen.choose(0L, 1100L).map(IntC.apply),
    Gen.choose(0.0, 3100.0).map(d => FloatC(math.rint(d * 10) / 10)),
    Gen.oneOf("O", "F", "P", "w41", "tag3", "note-F-5", "1-URGENT", "zzz",
      "user3", "ns2", "f_7.dat", "f_1").map(StringC.apply),
    Gen.choose(800000000L, 950000000L).map(t => FloatC(t.toDouble)), // epoch range
    Gen.choose(0L, 160000L).map(v => IntC(v * 100)), // size range
    Gen.oneOf(true, false).map(BoolC.apply))

  private val scalarG: Gen[Scalar] = Gen.frequency(
    4 -> Gen.oneOf(keysScalar).map(MetaAttr.apply),
    2 -> Gen.oneOf("size", "creator", "namespace", "name", "created_timestamp")
      .map(ObjectAttr.apply),
    2 -> Gen.oneOf(keysArray).map(ArrayAny.apply),
    1 -> Gen.zip(Gen.oneOf(keysArray), Gen.choose(0, 3)).map { case (n, i) => SubscriptInt(n, i) },
    1 -> Gen.oneOf("muon", "electron", "nope").map(k => SubscriptKey("core.bits", k)),
    1 -> Gen.oneOf(keysArray).map(ArrayLen.apply))

  private val atomG: Gen[MetaExp] = Gen.frequency(
    4 -> (for (l <- scalarG; op <- Gen.oneOf("<", "<=", ">", ">=", "==", "!=", "~", "~*", "!~");
      c <- constG; n <- Gen.oneOf(true, false)) yield Cmp(l, op, c, n)),
    2 -> (for (l <- scalarG; a <- Gen.choose(0L, 900L); b <- Gen.choose(0L, 2200L);
      n <- Gen.oneOf(true, false)) yield InRange(l, IntC(math.min(a, b)), IntC(math.max(a, b)), n)),
    2 -> (for (l <- scalarG; vs <- Gen.listOfN(3, constG); n <- Gen.oneOf(true, false))
      yield InSet(l, vs, n)),
    1 -> (for (k <- Gen.oneOf(keysScalar ++ keysArray); n <- Gen.oneOf(true, false))
      yield Present(k, n)),
    1 -> (for (l <- Gen.oneOf(keysArray).map(ArrayAny.apply); a <- Gen.choose(0L, 1000L);
      b <- Gen.choose(1000L, 2500L)) yield InRange(l, IntC(a), IntC(b), neg = true, elemInverted = true)),
    1 -> (for (l <- Gen.oneOf(keysArray).map(ArrayAny.apply); vs <- Gen.listOfN(2, constG))
      yield InSet(l, vs, neg = true, elemInverted = true)))

  private def predG(depth: Int): Gen[MetaExp] =
    if (depth <= 0) atomG
    else Gen.frequency(
      2 -> atomG,
      1 -> Gen.listOfN(2, predG(depth - 1)).map(cs =>
        MAnd(cs.flatMap { case MAnd(i) => i; case x => List(x) })),
      1 -> Gen.listOfN(2, predG(depth - 1)).map(cs =>
        MOr(cs.flatMap { case MOr(i) => i; case x => List(x) })))

  test("random predicates: engine count == clean-room model count") {
    val prop = Prop.forAll(predG(2)) { p =>
      val text = s"files from dsns:all where ${MqlPrinter.meta(p)}"
      val got =
        try Mql.query(spark, cat, text).count()
        catch {
          case e: Exception =>
            println(s"ENGINE ERROR for $text: ${e.getMessage}"); -1L
        }
      val want = model.count(m => eval(m, p)).toLong
      if (got != want)
        println(s"MISMATCH got=$got want=$want for: $text\n  ast: $p")
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  test("shredded and pure-Variant compilation agree") {
    val noShred = new DerivedCatalog(spark, dir) {
      override val shredding: Map[String, (String, MetaCompiler.ShredType)] = Map.empty
    }
    // bias towards the shredded keys
    val shredKeyG: Gen[Scalar] =
      Gen.oneOf("core.run", "core.status", "core.ts", "data.price").map(MetaAttr.apply)
    val g: Gen[MetaExp] = Gen.frequency(
      2 -> (for (l <- shredKeyG; op <- Gen.oneOf("<", ">=", "==", "!=", "~");
        c <- constG; n <- Gen.oneOf(true, false)) yield Cmp(l, op, c, n)),
      1 -> (for (l <- shredKeyG; a <- Gen.choose(0L, 900L); b <- Gen.choose(900L, 2200L);
        n <- Gen.oneOf(true, false)) yield InRange(l, IntC(a), IntC(b), n)),
      1 -> (for (l <- shredKeyG; vs <- Gen.listOfN(3, constG); n <- Gen.oneOf(true, false))
        yield InSet(l, vs, n)))
    val prop = Prop.forAll(g) { p =>
      val text = s"files from dsns:all where ${MqlPrinter.meta(p)}"
      val a = Mql.query(spark, cat, text).count()
      val b = Mql.query(spark, noShred, text).count()
      if (a != b) println(s"SHRED MISMATCH shredded=$a variant=$b for: $text")
      a == b
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
