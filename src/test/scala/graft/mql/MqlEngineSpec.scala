package graft.mql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.metacat.DerivedCatalog

/** Zero-arg filter a session conf can name — exercises the config-driven
  * loader (`spark.graft.filters`, filters.py:201-218 analog). */
class FirstThreeFilter extends Filters.GraftFilter {
  override def apply(spark: SparkSession, inputs: Seq[DataFrame],
      params: Seq[Ast.Const], kw: Map[String, Ast.Const]): DataFrame =
    inputs.head.orderBy("fid").limit(3)
}

/** End-to-end MQL over the derived catalog at sf0.001, validated against
  * independently-computed expectations from the raw orders table (the same
  * derivation rules, applied directly — not through the engine). */
class MqlEngineSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new DerivedCatalog(spark, dir)
  private lazy val orders = spark.read.parquet(s"$dir/orders.parquet").cache()

  private def q(text: String): DataFrame = Mql.query(spark, cat, text)
  private def liveOrders = orders.filter(col("o_orderkey") % 97 =!= 0)

  test("bfq: files from one dataset excludes retired") {
    val got = q("files from dsns:ds0").count()
    val want = liveOrders.filter(col("o_orderkey") % 5 === 0).count()
    assert(got == want && got > 0)
  }

  test("bfq: include_retired flag") {
    val got = Mql.query(spark, cat, "files from dsns:ds0", includeRetired = true).count()
    val want = orders.filter(col("o_orderkey") % 5 === 0).count()
    assert(got == want)
  }

  test("bfq: multi-dataset scan dedups by fid") {
    // every file is in ds(k%5) and in all => union of all+ds0 is just live files
    val got = q("files from dsns:all, dsns:ds0").count()
    assert(got == liveOrders.count())
  }

  test("where on variant metadata matches direct computation") {
    val got = q("files from dsns:all where core.run > 500 and core.status == F").count()
    val want = liveOrders.filter(col("o_orderkey") % 1000 > 500 &&
      col("o_orderstatus") === "F").count()
    assert(got == want && got > 0)
  }

  test("array any over derived runs") {
    // core.runs = [run, run+1000, run+2000][:1+k%3]; element in 1500:1700
    // means run in 500..700 with len>=2
    val got = q("files from dsns:all where core.runs[any] in 1500:1700").count()
    val run = col("o_orderkey") % 1000
    val want = liveOrders.filter(
      run.between(1500, 1700) ||
        (col("o_orderkey") % 3 >= 1 && (run + 1000).between(1500, 1700)) ||
        (col("o_orderkey") % 3 === 2 && (run + 2000).between(1500, 1700))).count()
    assert(got == want && got > 0)
  }

  test("conditional key present") {
    val got = q("files from dsns:all where opt.flag present").count()
    val want = liveOrders.filter(col("o_orderkey") % 5 === 0).count()
    assert(got == want && got > 0)
  }

  test("mixed-type key: number vs string strictness") {
    val gotNum = q("files from dsns:all where data.weight == 42").count()
    val wantNum = liveOrders.filter(col("o_orderkey") % 100 === 42 &&
      col("o_orderkey") % 2 === 0).count()
    assert(gotNum == wantNum)
    val gotStr = q("""files from dsns:all where data.weight == "w43"""").count()
    val wantStr = liveOrders.filter(col("o_orderkey") % 100 === 43 &&
      col("o_orderkey") % 2 === 1).count()
    assert(gotStr == wantStr && gotStr > 0)
  }

  test("union dedup, intersect, minus") {
    val u = q("union(files from dsns:ds1, files from dsns:ds2)").count()
    val wantU = liveOrders.filter(col("o_orderkey") % 5 === 1 || col("o_orderkey") % 5 === 2).count()
    assert(u == wantU)

    val j = q("{files from dsns:all, files from dsns:ds3}").count()
    val wantJ = liveOrders.filter(col("o_orderkey") % 5 === 3).count()
    assert(j == wantJ)

    val m = q("files from dsns:all - files from dsns:ds3").count()
    assert(m == liveOrders.count() - wantJ)
  }

  test("skip/limit pagination is id-ordered and exact") {
    val fids = q("files from dsns:all ordered skip 5 limit 3")
      .select("fid").collect().map(_.getString(0)).toList
    val want = liveOrders.select(
      concat(lit("F"), lpad(col("o_orderkey").cast("string"), 8, "0")).as("fid"))
      .orderBy("fid").collect().map(_.getString(0)).slice(5, 8).toList
    assert(fids == want)
  }

  test("file list by did and fid") {
    val byFid = q("fids F00000005, F00000010").select("fid")
      .collect().map(_.getString(0)).toList
    assert(byFid == List("F00000005", "F00000010"))
    val ns = orders.filter(col("o_orderkey") === 7)
      .select(concat(lit("ns"), (col("o_custkey") % 4).cast("string")))
      .collect().head.getString(0)
    val byDid = q(s"files $ns:f_7.dat").select("fid").collect().map(_.getString(0)).toList
    assert(byDid == List("F00000007"))
  }

  test("parents/children heap edges") {
    // children of file k are 2k+1, 2k+2
    val got = q("children(fids F00000003)").select("fid")
      .orderBy("fid").collect().map(_.getString(0)).toList
    assert(got == List("F00000007", "F00000008"))
    val p = q("parents(fids F00000007, F00000008)").select("fid")
      .collect().map(_.getString(0)).toList
    assert(p == List("F00000003"))
  }

  test("datasets query with pattern and having") {
    val all = Mql.query(spark, cat, "datasets matching dsns:ds*")
      .select("name").orderBy("name").collect().map(_.getString(0)).toList
    assert(all == List("ds0", "ds1", "ds2", "ds3", "ds4"))
    val frozen = Mql.query(spark, cat, "datasets matching dsns:* having frozen == true")
      .select("name").orderBy("name").collect().map(_.getString(0)).toList
    assert(frozen == List("ds0", "ds2", "ds4"))
  }

  test("datasets with subsets recursively") {
    val got = Mql.query(spark, cat, "datasets dsns:top with subsets recursively")
      .select("name").orderBy("name").collect().map(_.getString(0)).toList
    assert(got == List("all", "ds0", "ds1", "ds2", "ds3", "ds4", "top"))
    val oneLevel = Mql.query(spark, cat, "datasets dsns:top with subsets")
      .select("name").orderBy("name").collect().map(_.getString(0)).toList
    assert(oneLevel == List("all", "top"))
  }

  test("bfq from dataset with subsets recursively") {
    val got = q("files from dsns:top with subsets recursively").count()
    assert(got == liveOrders.count())
  }

  test("named query search") {
    val got = Mql.query(spark, cat, "queries matching q:run*")
      .select("name").collect().map(_.getString(0)).toList
    assert(got == List("runs_low"))
  }

  test("files selected by named query") {
    val got = q("files selected by q:flagged").count()
    val want = liveOrders.filter(col("o_orderkey") % 5 === 0).count()
    assert(got == want)
  }

  test("filter hash: partitions are disjoint and complete") {
    val parts = (0 until 3).map(r => q(s"filter hash(3, $r)(files from dsns:all)"))
    val counts = parts.map(_.count())
    assert(counts.sum == liveOrders.count())
    assert(parts(0).join(parts(1), Seq("fid"), "inner").count() == 0)
  }

  test("filter stride: every m-th by id order") {
    val got = q("filter stride(10, 0)(files from dsns:all ordered)")
      .select("fid").orderBy("fid").collect().map(_.getString(0)).toList
    val all = q("files from dsns:all ordered").select("fid")
      .collect().map(_.getString(0)).toList
    assert(got == all.zipWithIndex.filter(_._2 % 10 == 0).map(_._1))
  }

  test("filter sample: deterministic fraction") {
    val n = q("filter sample(0.25)(files from dsns:all)").count()
    val total = liveOrders.count()
    assert(n == total / 4 + (if (total % 4 > 0) 1 else 0) ||
      math.abs(n - total * 0.25) <= 1)
  }

  test("filter mix: weighted interleave with dedup, stops at exhaustion") {
    val got = q("filter mix(1, 1)(files from dsns:ds1, files from dsns:ds2)")
    val c1 = liveOrders.filter(col("o_orderkey") % 5 === 1).count()
    val c2 = liveOrders.filter(col("o_orderkey") % 5 === 2).count()
    val n = got.count()
    // disjoint inputs, equal ratios: stops when the smaller is exhausted
    assert(n >= 2 * math.min(c1, c2) && n <= math.min(c1, c2) * 2 + 1)
    assert(got.select("fid").distinct().count() == n)
  }

  test("mix re-attaches the row from the winning input") {
    import spark.implicits._
    val runsDb = Seq((1L, "good", 1.0)).toDF("key", "quality", "lumi")
    Filters.register("enrich_mix", new Filters.LookupJoinFilter(runsDb, "core.run", "mx"))
    // both inputs hold exactly the same single fid; equal scores tie to
    // the LAST input, so the emitted row must be the ENRICHED branch's —
    // not an arbitrary duplicate's (the round-2 regression this pins)
    val got = q("filter mix(1, 1)(fids F00000001, filter enrich_mix()(fids F00000001))")
    val rows = got
      .select(expr("try_variant_get(metadata, \"$['mx.quality']\", 'string')").as("q"))
      .collect()
    assert(rows.length == 1 && rows.head.getString(0) == "good")
  }

  test("summary ops") {
    val fs = q("files from dsns:ds2")
    val row = Mql.summaryCount(fs).collect().head
    assert(row.getLong(0) == liveOrders.filter(col("o_orderkey") % 5 === 2).count())
    val keys = Mql.summaryKeys(fs).collect().map(_.getString(0)).toSet
    assert(keys.contains("core.run") && keys.contains("data.tags"))
    assert(Mql.summaryKeyValues(q("files from dsns:ds2 limit 50"))
      .filter(col("key") === "core.status").count() <= 3)
  }

  test("external lookup-join filter enriches metadata") {
    import spark.implicits._
    val runsDb = Seq((1L, "good", 41.5), (2L, "bad", 0.0), (3L, "good", 7.25))
      .toDF("key", "quality", "lumi")
    Filters.register("enrich_runs", new Filters.LookupJoinFilter(runsDb, "core.run", "runs"))
    val out = q("filter enrich_runs()(files from dsns:all where core.run in (1, 2, 999)) where runs.quality == good")
    // run 1 and 2 get external columns; only run 1's quality is "good";
    // run 999 has no lookup row and fails the post-filter
    val runs = out.select(expr("cast(try_variant_get(metadata, \"$['core.run']\", 'long') as long)"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(runs == Set(1L))
    val lumi = out.limit(1)
      .select(expr("try_variant_get(metadata, \"$['runs.lumi']\", 'double')"))
      .collect().head.getDouble(0)
    assert(lumi == 41.5)
  }

  test("config-loadable user filter resolves by class name") {
    spark.conf.set("spark.graft.filters",
      "first3 = graft.mql.FirstThreeFilter , other=no.such.Class")
    try {
      val got = q("filter first3()(files from dsns:ds1)")
      assert(got.count() == 3)
      // unknown names still fail fast, and a bad class name only breaks
      // the entry that uses it
      assertThrows[IllegalArgumentException](q("filter nope()(files from dsns:ds1)"))
    } finally spark.conf.unset("spark.graft.filters")
    // unsetting the conf removes the mapping — the name must NOT linger
    // in any process-global registry (round-3 advice: the first session
    // to use a name pinned its class for the whole JVM)
    assertThrows[IllegalArgumentException](q("filter first3()(files from dsns:ds1)"))
  }

  test("dataset counts aggregation") {
    val counts = Mql.datasetCounts(cat)
      .filter(col("dataset_name") === "ds1")
      .collect().head
    val want = liveOrders.filter(col("o_orderkey") % 5 === 1).count()
    assert(counts.getAs[Long]("file_count") == want)
  }

  test("nested filters compose") {
    // hash then stride over the surviving stream
    val inner = q("filter hash(3, 1)(files from dsns:all)")
    val nested = q("filter stride(5, 0)(filter hash(3, 1)(files from dsns:all))")
    val innerIds = inner.select("fid").orderBy("fid").collect().map(_.getString(0))
    val want = innerIds.zipWithIndex.filter(_._2 % 5 == 0).map(_._1).toList
    assert(nested.select("fid").orderBy("fid").collect().map(_.getString(0)).toList == want)
  }

  test("explain produces three IRs") {
    val s = Mql.explain(spark, cat, "files from dsns:ds0 where core.run < 10 limit 5")
    assert(s.contains("-- parsed --") && s.contains("-- spark plan --"))
  }

  test("provenance closure: diamond min-depth, cycles, both directions") {
    import spark.implicits._
    //      A
    //     / \      diamond: D reachable from A at depth 2 via B or C
    //    B   C     E hangs off D; X<->Y is a 2-cycle feeding B
    //     \ /
    //      D - E
    val edges = Seq(
      ("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "E"),
      ("X", "Y"), ("Y", "X"), ("X", "B")
    ).toDF("parent_fid", "child_fid")
    val g = new graft.metacat.MetacatCatalog {
      def files: DataFrame = spark.emptyDataFrame
      def filesDatasets: DataFrame = spark.emptyDataFrame
      def datasets: DataFrame = spark.emptyDataFrame
      def parentChild: DataFrame = edges
      def datasetsParentChild: DataFrame = spark.emptyDataFrame
      def queries: DataFrame = spark.emptyDataFrame
      def namedQuerySource(ns: String, n: String): Option[String] = None
    }
    def closure(seed: String, anc: Boolean): Map[String, Long] =
      Mql.provenanceClosure(g, Seq(seed).toDF("fid"), ancestors = anc)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ancestors of E: D at 1, B and C at 2, A at 3 — and through the
    // X<->Y cycle: X at 3, Y at 4 (termination despite the cycle)
    assert(closure("E", anc = true) ==
      Map("D" -> 1L, "B" -> 2L, "C" -> 2L, "A" -> 3L, "X" -> 3L, "Y" -> 4L))
    // descendants of A: diamond D collapses to min depth 2
    assert(closure("A", anc = false) ==
      Map("B" -> 1L, "C" -> 1L, "D" -> 2L, "E" -> 3L))
    // a seed inside the cycle reaches itself (proper ancestor via Y)
    assert(closure("X", anc = true) == Map("Y" -> 1L, "X" -> 2L))
    // maxDepth caps the walk
    assert(Mql.provenanceClosure(g, Seq("E").toDF("fid"), maxDepth = 1)
      .collect().map(_.getString(0)).toSeq == Seq("D"))
  }
}
