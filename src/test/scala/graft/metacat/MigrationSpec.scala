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

  test("v1 JSON-text store migrates in place to the shredded v2 layout") {
    val root = Files.createTempDirectory("graft-v1-").toString
    val src = new DerivedCatalog(spark, dir)
    // hand-write a v1 layout: metadata as JSON text at rest
    val v1 = src.files
      .withColumn("metadata_json", to_json(col("metadata")))
      .select(ParquetCatalog.FilesDeclareSchema.fields.map(f => col(f.name)).toIndexedSeq: _*)
    v1.write.partitionBy("namespace").parquet(s"$root/files")

    val shred = Map(
      "core.run" -> (("_s_core_run", graft.mql.MetaCompiler.ShredNum)),
      "core.status" -> (("_s_core_status", graft.mql.MetaCompiler.ShredStr)))
    val cat = new ParquetCatalog(spark, root, shred)
    // opening the v1 layout with v2 code must fail loudly, not read nulls
    assertThrows[IllegalStateException](cat.files.count())

    val n = cat.migrateV1Files()
    assert(n == src.files.count())
    // post-migration: physical Variant + populated shred columns
    val f = cat.files
    assert(f.schema("metadata").dataType.typeName == "variant")
    val row = f.filter(col("fid") === "F00000046")
      .select(col("_s_core_run"),
        expr("try_variant_get(metadata, \"$['core.run']\", 'long')")).collect().head
    assert(row.getDouble(0) == 46.0 && row.getLong(1) == 46L)
    // shredded predicate path returns the same rows as the derived catalog
    val q = "files from dsns:ds1 where core.run < 300"
    // memberships/queries for the migrated root: reuse only the files
    // table semantics — compare raw metadata filters instead of BFQ
    val a = f.filter(expr("try_variant_get(metadata, \"$['core.run']\", 'long')") < 300
      && !col("retired")).select("fid")
    val b = src.files.filter(
      expr("try_variant_get(metadata, \"$['core.run']\", 'long')") < 300
      && !col("retired")).select("fid")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"mismatch for: $q")
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
