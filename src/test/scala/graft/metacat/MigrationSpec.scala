package graft.metacat

import graft.mql.{Mql, SparkTestBase}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Migration round trip: materialize the derived catalog into the
  * production ParquetCatalog layout and verify the engine returns
  * identical results over both — the "switch storage, keep queries"
  * property. */
class MigrationSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val migrated: ParquetCatalog = {
    val root = Files.createTempDirectory("graft-mig-").toString
    val src = new DerivedCatalog(spark, dir)
    val dst = new ParquetCatalog(spark, root)
    dst.declareFiles(src.files.withColumn("metadata_json", to_json(col("metadata"))))
    src.datasets.select("namespace", "name", "frozen", "monotonic", "metadata")
      .collect().foreach { r =>
        dst.createDataset(r.getString(0), r.getString(1), r.getBoolean(2),
          r.getBoolean(3), metadataJson = "{}")
      }
    src.filesDatasets.select("dataset_namespace", "dataset_name").distinct()
      .collect().foreach { r =>
        val members = src.filesDatasets
          .filter(col("dataset_namespace") === r.getString(0) &&
            col("dataset_name") === r.getString(1))
        dst.addTo(members, r.getString(0), r.getString(1), checkFlags = false)
      }
    dst.addProvenance(src.parentChild)
    graft.metacat.DerivedCatalog.namedQueries.foreach { case ((ns, n), srcText) =>
      dst.saveNamedQuery(ns, n, srcText)
    }
    dst
  }

  private val queriesToCheck = Seq(
    "files from dsns:ds0 where core.run > 500 and core.status == F",
    "files from dsns:all where core.runs[any] in 1500:1700",
    "union(files from dsns:ds1, files from dsns:ds2) where opt.flag present",
    "parents(files from dsns:ds2 where core.run < 100)",
    "files from dsns:all ordered skip 5 limit 7",
    "files selected by q:runs_low",
    "filter hash(3, 1)(files from dsns:all)")

  test("identical MQL results over derived and migrated catalogs") {
    val derived = new DerivedCatalog(spark, dir)
    for (q <- queriesToCheck) {
      val a = Mql.query(spark, derived, q).select("fid")
      val b = Mql.query(spark, migrated, q).select("fid")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"mismatch for: $q")
    }
  }

  test("migrated catalog preserves metadata values through JSON round trip") {
    // k%5==1: k=46 -> int weight 46; k=41 -> string weight "w41"
    val qInt = "files from dsns:ds1 where data.weight == 46"
    val qStr = """files from dsns:ds1 where data.weight == "w41""""
    val derived = new DerivedCatalog(spark, dir)
    for (q <- Seq(qInt, qStr)) {
      val m = Mql.query(spark, migrated, q).count()
      val d = Mql.query(spark, derived, q).count()
      assert(m == d && m > 0, s"$q: migrated=$m derived=$d")
    }
  }
}
