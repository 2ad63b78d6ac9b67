package graft.metacat

import graft.mql.{Mql, SparkTestBase}
import org.apache.spark.sql.functions._

/** Bucketed layout: correctness preserved AND the fid joins run without a
  * shuffle on the bucketed side. */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val bucketed: MetacatCatalog = {
    val src = new DerivedCatalog(spark, dir)
    Bucketing.writeBucketed(spark, src, "gbuck", buckets = 4)
    Bucketing.catalog(spark, "gbuck")
  }

  test("bucketed catalog gives identical MQL results") {
    val derived = new DerivedCatalog(spark, dir)
    val q = "files from dsns:ds1 where core.run < 300"
    val a = Mql.query(spark, derived, q).select("fid")
    val b = Mql.query(spark, bucketed, q).select("fid")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("fid-bucketed intersect plans without shuffling the files side") {
    // force SMJ so bucketing (not broadcast) must remove the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val f = spark.table("gbuck.files")
      val fd = spark.table("gbuck.files_datasets")
      val plan = f.join(fd, Seq("fid"), "left_semi")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
