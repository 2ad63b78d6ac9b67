package graft.mql

import graft.metacat.DerivedCatalog
import org.apache.spark.sql.functions._

/** Scale-shape checks for the order-sensitive filters: the round-1
  * implementations funneled data through a single partition (global
  * Window) or buffered whole rows on the driver (mix); these tests pin
  * the round-2 distributed shapes so they can't regress. */
class FilterScaleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new DerivedCatalog(spark, dir)

  private def plan(mql: String): String =
    Mql.query(spark, cat, mql).queryExecution.executedPlan.toString

  test("sample/stride plans contain no Window operator (no single-task global sort)") {
    // round 1 used Window.orderBy with no partitionBy — a one-task funnel
    assert(!plan("filter sample(0.25)(files from dsns:all)").contains("Window"))
    assert(!plan("filter stride(7, 2)(files from dsns:all)").contains("Window"))
  }

  test("mix streams through bounded chunks, result identical to one-chunk run") {
    val mql = "filter mix(2, 1)(files from dsns:ds1, files from dsns:ds2)"
    val oneChunk = Mql.query(spark, cat, mql).select("fid")
      .collect().map(_.getString(0)).toSeq
    val saved = Filters.MixChunk
    try {
      Filters.MixChunk = 37 // force many spill chunks
      val chunked = Mql.query(spark, cat, mql).select("fid")
        .collect().map(_.getString(0)).toSeq
      assert(chunked == oneChunk && chunked.nonEmpty)
      // global dedup across inputs held
      assert(chunked.distinct.size == chunked.size)
    } finally Filters.MixChunk = saved
  }

  test("mix dedup set is pruned across chunks; overlapping streams stay deduped") {
    // ds1 overlaps dsns:all entirely, so the cross-stream dedup is doing
    // real work here; a tiny MixChunk forces many prune passes
    val mql = "filter mix(1, 1)(files from dsns:ds1, files from dsns:all)"
    val oneChunk = Mql.query(spark, cat, mql).select("fid")
      .collect().map(_.getString(0)).toSeq
    val saved = Filters.MixChunk
    try {
      Filters.MixChunk = 13
      val pruned = Mql.query(spark, cat, mql).select("fid")
        .collect().map(_.getString(0)).toSeq
      assert(pruned == oneChunk && pruned.nonEmpty)
      assert(pruned.distinct.size == pruned.size)
    } finally Filters.MixChunk = saved
  }

  test("mix enforces its documented dedup ceiling with a clear error") {
    val saved = Filters.MixMaxDedup
    try {
      Filters.MixMaxDedup = 5
      val ex = intercept[IllegalStateException] {
        Mql.query(spark, cat,
          "filter mix(1, 1)(files from dsns:ds1, files from dsns:ds1)")
          .select("fid").collect()
      }
      assert(ex.getMessage.contains("MixMaxDedup"))
    } finally Filters.MixMaxDedup = saved
  }

  test("mix(1,1) alternates strictly across chunk boundaries") {
    val saved = Filters.MixChunk
    try {
      Filters.MixChunk = 11
      val got = Mql.query(spark, cat,
        "filter mix(1, 1)(files from dsns:ds0, files from dsns:ds3)")
        .select("fid").collect().map(_.getString(0))
      // ds0 (k%5==0) and ds3 (k%5==3) are disjoint, so equal ratios give
      // strict alternation (reference tiebreak: higher input index first)
      val mods = got.take(100).map(f => f.drop(1).toLong % 5)
      assert(mods.length == 100)
      assert(mods.grouped(2).forall(p => p(0) == 3 && p(1) == 0),
        s"not alternating: ${mods.take(12).mkString(",")}")
    } finally Filters.MixChunk = saved
  }
}
