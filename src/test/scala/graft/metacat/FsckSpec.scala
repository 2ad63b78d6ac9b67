package graft.metacat

import graft.mql.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The audit must actually DETECT corruption — the gate corpus is
  * consistent (all-zero counts), so this spec plants one violation of
  * every invariant in an in-memory catalog and asserts the exact
  * per-check counts. */
class FsckSpec extends SparkTestBase {

  test("fsck counts each planted violation exactly once") {
    import spark.implicits._
    val corrupt = new MetacatCatalog {
      // F1, F2 exist; F2 stored TWICE (duplicate_fid = 1 fid)
      def files: DataFrame =
        Seq("F1", "F2", "F2").toDF("fid")
          .withColumn("retired", lit(false))
      // F1 ok; FX dangles (dangling_membership = 1); dsns:ghost missing
      // (missing_dataset = 1 — the (dsns, d1) membership is fine)
      def filesDatasets: DataFrame = Seq(
        ("F1", "dsns", "d1"),
        ("FX", "dsns", "d1"),
        ("F1", "dsns", "ghost")).toDF("fid", "dataset_namespace", "dataset_name")
      def datasets: DataFrame = Seq(("dsns", "d1")).toDF("namespace", "name")
      // one edge with a missing parent, one with a missing child
      def parentChild: DataFrame = Seq(
        ("F1", "F2"), ("FGONE", "F1"), ("F2", "FGONE2"))
        .toDF("parent_fid", "child_fid")
      // one endpoint missing from datasets (dangling_ds_edge counts the
      // ENDPOINT occurrences: (dsns, nope) appears once)
      def datasetsParentChild: DataFrame = Seq(
        ("dsns", "d1", "dsns", "nope"))
        .toDF("parent_namespace", "parent_name", "child_namespace", "child_name")
      def queries: DataFrame = spark.emptyDataFrame
      def namedQuerySource(namespace: String, name: String): Option[String] = None
    }
    val got = Fsck.audit(corrupt).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "dangling_membership" -> 1L,
      "dangling_parent_fid" -> 1L,
      "dangling_child_fid" -> 1L,
      "missing_dataset" -> 1L,
      "dangling_ds_edge" -> 1L,
      "duplicate_fid" -> 1L), s"got $got")
  }

  test("fsck is all-green on a consistent ParquetCatalog after mutations") {
    val root = java.nio.file.Files.createTempDirectory("graft-fsck-").toString
    val cat = new ParquetCatalog(spark, root)
    cat.createDataset("zds", "a")
    import spark.implicits._
    cat.declareFiles(
      (0 until 6).map(i =>
        (f"Z$i%08d", "zns", s"z_$i.dat", s"""{"core.run":$i}""", "t", 10L + i))
        .toDF("fid", "namespace", "name", "metadata_json", "creator", "size")
        .withColumn("created_timestamp", to_timestamp(lit("2026-03-01 00:00:00"))),
      dataset = Some(("zds", "a")))
    cat.retireFiles(Seq("Z00000001"))
    cat.removeFiles(Seq("Z00000002"))
    val got = Fsck.audit(cat).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L), s"consistent catalog flagged: $got")
    assert(got.size == 6)
  }
}
