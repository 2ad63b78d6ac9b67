package graft.metacat

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** PHYSICAL-PLAN assertions for the merge-on-read overlays — the shapes
  * that must hold at a 100 TB catalog:
  *
  *  - the base (corpus-sized) side of every fold joins the log-derived
  *    key sets via BROADCAST joins, never a sort-merge join that would
  *    shuffle the whole base table per read
  *  - the latest-wins windows run over the MUTATION-sized log frames
  *    only — no Window over the base scan
  *
  * A regression here (e.g. a fold rewritten so Catalyst picks SMJ)
  * would still pass every correctness gate at sf0.01 while costing a
  * corpus-wide shuffle per read at scale — exactly the class of defect
  * only a plan assertion catches. */
class MorPlanSpec extends SparkTestBase {

  private def seeded(): ParquetCatalog = {
    val root = Files.createTempDirectory("graft-morplan-").toString
    val cat = new ParquetCatalog(spark, root, mergeOnRead = true)
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      (f"Q$i%04d", "alpha", s"q_$i.dat", s"""{"core.run":$i}""", "t", 100L + i)
    }.toDF("fid", "namespace", "name", "metadata_json", "creator", "size")
      .withColumn("created_timestamp", to_timestamp(lit("2026-02-01 00:00:00")))
    cat.createDataset("mp", "d")
    cat.declareFiles(rows, dataset = Some(("mp", "d")))
    // populate every log: file mutations, membership removes + wildcard
    // (recreate), provenance edges + removes, one admin update
    cat.retireFiles(Seq("Q0001"))
    cat.updateFileMeta(Seq("Q0002"), """{"opt.x":1}""")
    cat.removeFrom(rows.filter(col("fid") === "Q0003").select("fid"), "mp", "d")
    cat.addProvenance(Seq(("Q0001", "Q0002"), ("Q0002", "Q0003"))
      .toDF("parent_fid", "child_fid"))
    cat.removeFiles(Seq("Q0004"))
    cat.updateDataset("mp", "d", metadataJson = Some("""{"ds.v":1}"""))
    cat
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("files overlay: broadcast anti-join on the log fid set, no sort-merge join") {
    val p = plan(seeded().files)
    assert(!p.contains("SortMergeJoin"),
      s"files overlay fell back to a corpus-shuffling SMJ:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast overlay:\n$p")
  }

  test("membership fold: base side joins wildcards + pair keys via broadcast only") {
    val p = plan(seeded().filesDatasets)
    assert(!p.contains("SortMergeJoin"),
      s"membership fold fell back to a corpus-shuffling SMJ:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast folds:\n$p")
  }

  test("edge fold: base side joins pair keys + side wildcards via broadcast only") {
    val p = plan(seeded().parentChild)
    assert(!p.contains("SortMergeJoin"),
      s"edge fold fell back to a corpus-shuffling SMJ:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast folds:\n$p")
  }

  test("dimension overlay: broadcast anti-join on the admin key set") {
    val p = plan(seeded().datasets)
    assert(!p.contains("SortMergeJoin"),
      s"dimension overlay fell back to SMJ:\n$p")
  }
}
