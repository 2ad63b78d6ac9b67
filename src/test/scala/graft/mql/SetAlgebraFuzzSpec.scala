package graft.mql

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.metacat.DerivedCatalog
import Ast._
import ModelEval.MFile

/** Differential fuzzing of the file-set algebra: random resolved query
  * trees (BFQ + where/pagination, union, join, minus, provenance hops,
  * order-dependent and hash filters) run through the full engine and
  * through the clean-room model; the fid lists must agree exactly. */
class SetAlgebraFuzzSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new DerivedCatalog(spark, dir)

  private def fid(k: Long): String = f"F$k%08d"

  private lazy val modelFiles: Seq[(Boolean, MFile)] = {
    spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice", "o_orderdate")
      .withColumn("ts", unix_timestamp(col("o_orderdate")))
      .collect().toSeq
      .map { r =>
        val k = r.getLong(0)
        val run = k % 1000
        val runs = Seq(run, run + 1000, run + 2000).take(1 + (k % 3).toInt)
        val tags = (0 to 3).map(i => s"tag${(k + i) % 7}").take(1 + (k % 4).toInt)
        val base = Map[String, Any](
          "core.run" -> run,
          "core.status" -> r.getString(2),
          "core.priority" -> r.getString(3),
          "core.runs" -> runs,
          "core.bits" -> Map("muon" -> k % 2, "electron" -> (k + 1) % 2),
          "core.ts" -> r.getLong(6),
          "data.tags" -> tags,
          "data.price" -> r.getDouble(4),
          "data.weight" -> (if (k % 2 == 0) k % 100 else s"w${k % 100}"))
        val m1 = if (k % 5 == 0) base + ("opt.flag" -> (k % 10 == 0)) else base
        val m2 = if (k % 7 == 0) m1 + ("opt.note" -> s"note-${r.getString(2)}-${k % 13}") else m1
        (k % 97 != 0, MFile(fid(k), m2, Set(s"ds${k % 5}", "all")))
      }
  }

  private lazy val liveFiles: Seq[MFile] = modelFiles.collect { case (true, f) => f }
  private lazy val everyone: Seq[MFile] = modelFiles.map(_._2)

  private def parentOf(f: String): Option[String] = {
    val k = f.drop(1).toLong
    if (k >= 1) Some(fid((k - 1) / 2)) else None
  }

  // ---- generators ----
  private val dsG: Gen[DatasetSel] =
    Gen.oneOf("ds0", "ds1", "ds2", "ds3", "ds4", "all")
      .map(n => DatasetSel(DsExact(Some("dsns"), n)))

  private val atomG: Gen[MetaExp] = Gen.oneOf(
    for (op <- Gen.oneOf("<", ">=", "==", "!="); v <- Gen.choose(0L, 1000L);
      n <- Gen.oneOf(true, false)) yield Cmp(MetaAttr("core.run"), op, IntC(v), n),
    Gen.oneOf("O", "F", "P").map(s => Cmp(MetaAttr("core.status"), "==", StringC(s))),
    Gen.const(Present("opt.flag")),
    for (a <- Gen.choose(0L, 1500L); b <- Gen.choose(1500L, 3000L))
      yield InRange(ArrayAny("core.runs"), IntC(a), IntC(b)),
    Gen.oneOf(0, 1, 2, 3).map(i => Cmp(ArrayLen("data.tags"), "==", IntC(i + 1))))

  private val whereG: Gen[MetaExp] = Gen.frequency(
    3 -> atomG,
    1 -> Gen.listOfN(2, atomG).map(MAnd.apply),
    1 -> Gen.listOfN(2, atomG).map(MOr.apply))

  private val bfqG: Gen[FileQ] = for {
    sels <- Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, dsG).map(_.distinct))
    where <- Gen.option(whereG)
    paged <- Gen.oneOf(true, false)
    skip <- Gen.choose(0L, 50L)
    limit <- Gen.choose(10L, 400L)
  } yield
    if (paged) Bfq(sels, where, skip, Some(limit), ordered = true)
    else Bfq(sels, where)

  private def fileG(depth: Int): Gen[FileQ] = {
    val leaf = bfqG
    if (depth <= 0) leaf
    else {
      val sub = fileG(depth - 1)
      Gen.frequency(
        4 -> leaf,
        2 -> Gen.listOfN(2, sub).map(qs => UnionQ(qs.flatMap {
          case UnionQ(i) => i; case x => List(x)
        })),
        2 -> Gen.listOfN(2, sub).map(qs => JoinQ(qs.flatMap {
          case JoinQ(i) => i; case x => List(x)
        })),
        2 -> Gen.zip(sub, sub).map { case (a, b) => MinusQ(a, b) },
        1 -> sub.map(ParentsOf.apply),
        1 -> sub.map(ChildrenOf.apply),
        1 -> Gen.zip(Gen.choose(2L, 5L), sub).map { case (m, q) =>
          FilterQ("hash", List(IntC(m), IntC(m - 1)), Map.empty, List(q))
        },
        1 -> Gen.zip(Gen.choose(2L, 7L), sub).map { case (m, q) =>
          FilterQ("stride", List(IntC(m), IntC(0)), Map.empty, List(q))
        },
        1 -> Gen.zip(Gen.choose(1L, 40L), Gen.choose(5L, 200L), sub).map {
          case (s, l, q) => SkipLimitQ(forceOrdered(q), s, Some(l))
        })
    }
  }

  private def forceOrdered(q: FileQ): FileQ = q match {
    case b: Bfq => b.copy(ordered = true)
    case o: OrderedQ => o
    case other => OrderedQ(other)
  }

  test("random set-algebra trees: engine fids == model fids") {
    val prop = Prop.forAll(fileG(2)) { q =>
      val text = MqlPrinter.file(q)
      val got =
        try Mql.query(spark, cat, text).select("fid")
          .collect().map(_.getString(0)).toList.sorted
        catch {
          case e: Exception =>
            println(s"ENGINE ERROR for $text: ${e.getMessage}"); List("<error>")
        }
      val want = ModelEval.evalFile(
        Rewrites.resolve(TopFileQ(q) match { case t => t },
          (_, _) => None, None).asInstanceOf[TopFileQ].q,
        liveFiles, everyone, parentOf).sorted
      if (got != want)
        println(s"MISMATCH got=${got.size} want=${want.size} for: $text\n" +
          s"  onlyGot=${(got.toSet -- want.toSet).take(3)} onlyWant=${(want.toSet -- got.toSet).take(3)}")
      got == want
    }
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(80)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }
}
