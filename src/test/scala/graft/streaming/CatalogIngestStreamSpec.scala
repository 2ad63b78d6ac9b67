package graft.streaming

import graft.mql.SparkTestBase
import graft.metacat.ParquetCatalog
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming catalog ingest: idempotent declares under at-least-once
  * delivery, batch-boundary invisibility, and the ignoreExisting batch
  * contract it builds on. */
class CatalogIngestStreamSpec extends SparkTestBase {

  private def declareRows(n: Int, tag: String, ns: String = "ing") = {
    import spark.implicits._
    (0 until n).map { i =>
      (s"$tag$i", ns, s"f_$tag$i.dat", s"""{"core.run":$i}""", "tester", 100L + i)
    }.toDF("fid", "namespace", "name", "metadata_json", "creator", "size")
      .withColumn("created_timestamp", to_timestamp(lit("2026-03-01 00:00:00")))
  }

  test("ignoreExisting drops live fids and in-batch dups before any write") {
    val root = Files.createTempDirectory("graft-ing-idem-").toString
    val cat = new ParquetCatalog(spark, root)
    cat.createDataset("ing", "ds")
    val rows = declareRows(5, "I")
    cat.declareFiles(rows, dataset = Some(("ing", "ds")))
    // redeliver ALL five plus two new ones, with one new fid duplicated
    // in-batch: only the two new rows may land, each exactly once
    val redelivery = rows
      .unionByName(declareRows(7, "I").filter(col("fid").isin("I5", "I6")))
      .unionByName(declareRows(7, "I").filter(col("fid") === "I6"))
    cat.declareFiles(redelivery, dataset = Some(("ing", "ds")), ignoreExisting = true)
    assert(cat.files.count() == 7)
    assert(cat.files.groupBy("fid").count().filter(col("count") > 1).count() == 0)
    // membership rows also exactly once per fid
    assert(cat.filesDatasets.count() == 7)
    assert(cat.filesDatasets.groupBy("fid").count().filter(col("count") > 1).count() == 0)
    // the default posture still rejects redeclares
    intercept[IllegalArgumentException](cat.declareFiles(rows))
  }

  test("streamed overlapping micro-batches converge to the clean batch state") {
    val root = Files.createTempDirectory("graft-ing-stream-").toString
    val cat = new ParquetCatalog(spark, root, mergeOnRead = true)
    cat.createDataset("ing", "ds")
    val rows = declareRows(40, "S")
    CatalogIngestStream.runDeclareToCatalog(
      spark, rows, col("size") < 120L, cat, ("ing", "ds"))
    // batch 1 = size<120 (20 rows), batch 2 = all 40 (20 redelivered):
    // final state is exactly the 40 distinct declares
    assert(cat.files.count() == 40)
    assert(cat.files.groupBy("fid").count().filter(col("count") > 1).count() == 0)
    assert(cat.filesDatasets.count() == 40)
    // validation still bound per micro-batch: metadata is queryable
    assert(cat.files.filter(
      expr("try_variant_get(metadata, \"$['core.run']\", 'long')") === 33L).count() == 1)
  }
}
