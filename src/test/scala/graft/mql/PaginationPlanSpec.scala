package graft.mql

import graft.metacat.DerivedCatalog

/** PHYSICAL-PLAN assertion for the pagination path (`ordered skip N
  * limit M`, Planner.page): Catalyst must fold orderBy + offset + limit
  * into `TakeOrderedAndProject` — each partition keeps only its top
  * (skip+limit) rows and the driver merges k-way — never a GLOBAL sort
  * (range-exchange over the whole file set). The difference is invisible
  * at sf0.1 and fatal at a 100 TB catalog: a global sort shuffles every
  * row to produce 20 of them. Nothing else pins this shape; a Planner
  * refactor (e.g. routing page() through a window or a repartition)
  * would pass every correctness gate while regressing it. */
class PaginationPlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val cat = new DerivedCatalog(spark, dir)

  private def plan(text: String): String =
    Mql.query(spark, cat, text).queryExecution.executedPlan.toString

  test("ordered skip/limit plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("files from dsns:all ordered skip 100 limit 20")
    assert(p.contains("TakeOrderedAndProject"),
      s"pagination lost the top-k shape:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"pagination triggered a global range-exchange sort:\n$p")
  }

  test("folded skip/limit chains keep the top-k shape") {
    // skip⇒ordered rewrite + fold: net window [50, 80) of the id order
    val p = plan("files from dsns:all skip 40 limit 100 skip 10 limit 30")
    assert(p.contains("TakeOrderedAndProject"),
      s"folded pagination lost the top-k shape:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"folded pagination triggered a global range-exchange sort:\n$p")
  }

  test("limit without skip stays a CollectLimit/top-k, no sort exchange") {
    val p = plan("files from dsns:all ordered limit 20")
    assert(p.contains("TakeOrderedAndProject") || p.contains("CollectLimit"),
      s"plain ordered limit lost the limit pushdown:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"plain ordered limit triggered a global sort:\n$p")
  }
}
