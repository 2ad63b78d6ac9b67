package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.metacat.{Bucketing, DerivedCatalog, Fsck, MetacatCatalog}
import graft.mql.Mql

/** Bucketed-storage A/B: the fid-join MQL family + fsck against the SAME
  * corpus stored plain (DerivedCatalog parquet) and fid-bucketed
  * ([[Bucketing]] managed tables), reporting planned Exchange counts and
  * median wall-clock for both. This is the end-to-end evidence for the
  * 100 TB layout claim: every catalog operator keyed on fid should drop
  * its join exchanges under bucketing, with wall-time following on the
  * shuffle-dominated shapes.
  *
  *   SPARK_GRAFT_SF_DIR=target/scale10x scripts/run.sh graft.BucketBench
  */
object BucketBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale10x")

    // the A/B holds the storage medium constant: BOTH catalogs are
    // on-disk managed tables built from the same source (a
    // session-cached DerivedCatalog would conflate layout with medium —
    // at 100 TB neither side lives in memory); only bucketing differs
    val source = new DerivedCatalog(spark, dir)
    val nFiles = source.files.count() // warm the shredded-store ingest
    Bucketing.writeBucketed(spark, source, "gplain10", buckets = 0)
    val plain = Bucketing.catalog(spark, "gplain10", source.shredding)
    val t0 = System.nanoTime()
    Bucketing.writeBucketed(spark, source, "gbuck10", buckets = cpus.toInt)
    val layoutSecs = (System.nanoTime() - t0) / 1e9
    val bucketed = Bucketing.catalog(spark, "gbuck10", source.shredding)
    println(f"BUCKETBENCH corpus=$nFiles files, one-time bucketed layout: $layoutSecs%.1f s")

    val queries: Seq[(String, MetacatCatalog => DataFrame)] = Seq(
      "bfq_where" -> (c => Mql.query(spark, c,
        "files from dsns:all where core.run > 500 and core.status == F")),
      "union_dedup" -> (c => Mql.query(spark, c,
        "union(files from dsns:ds1 where core.run < 300, files from dsns:ds2 where core.run < 300)")),
      "intersect" -> (c => Mql.query(spark, c,
        "{files from dsns:all where core.run < 600, files from dsns:ds2}")),
      "minus" -> (c => Mql.query(spark, c,
        "files from dsns:ds0 - files where core.run >= 500")),
      "parents" -> (c => Mql.query(spark, c,
        "parents(files from dsns:ds2 where core.run < 100)")),
      "with_provenance" -> (c => Mql.withProvenance(c, Mql.query(spark, c,
        "files from dsns:ds1 where core.run < 100"))),
      "fsck" -> (c => Fsck.audit(c)))

    for ((name, mk) <- queries) {
      val line = Seq("plain" -> plain, "bucketed" -> bucketed).map { case (tag, cat) =>
        val ex = mk(cat).queryExecution.executedPlan.toString
          .sliding("Exchange".length).count(_ == "Exchange")
        mk(cat).count() // warm
        val runs = (1 to 3).map { _ =>
          val s = System.nanoTime(); mk(cat).count(); (System.nanoTime() - s) / 1e9
        }.sorted
        f"$tag ex=$ex med=${runs(1)}%.2f min=${runs.head}%.2f"
      }.mkString("   ")
      println(f"BUCKETBENCH $name%-16s $line")
    }
    spark.stop()
  }
}
