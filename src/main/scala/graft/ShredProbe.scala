package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured A/B for Variant-shredding metadata pushdown at 10× (r12
  * verdict stretch #8): the 100× claim for selective metadata scans
  * should rest on a number, not an architecture diagram.
  *
  * Four arms over the SAME 10× files table (selective predicate
  * `core.run == 777`, ~0.1% of rows):
  *
  *   variant/unsorted — `try_variant_get` per row: full scan + per-row
  *     Variant decode; no pushdown possible (the predicate is opaque to
  *     parquet stats)
  *   shred/unsorted   — typed `_s_core_run` column: the predicate
  *     reaches the scan (`PushedFilters`), no Variant decode; row-group
  *     stats exist but run values cycle mod 1000 in natural order, so
  *     min/max covers everything and no group is skipped — this arm
  *     isolates the DECODE saving
  *   variant/sorted   — proves sorting alone does nothing for an
  *     unpushable predicate
  *   shred/sorted     — the write-time layout a 100 TB catalog keeps
  *     (sorted/z-ordered on hot shred keys): row-group min/max pruning
  *     skips ~99.9% of groups — this arm isolates the I/O saving
  *
  *   scripts/run.sh graft.ShredProbe [sfDir] [mult]
  */
object ShredProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cat = new graft.metacat.DerivedCatalog(spark, baseDir)
    val base = cat.files
    val out = java.nio.file.Files.createTempDirectory("graft_shredprobe_")
    val big = (0 until mult).map(r =>
        base.withColumn("fid", concat(col("fid"), lit(f"~$r%02d"))))
      .reduce(_.unionByName(_))
    big.write.parquet(s"$out/unsorted")
    spark.read.parquet(s"$out/unsorted")
      .sortWithinPartitions("_s_core_run")
      .write.parquet(s"$out/sorted")

    def timed(df: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(count(lit(1)), sum("size")).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      runs(1)
    }
    def rows(store: String) = spark.read.parquet(s"$out/$store")
    def variantPred(df: DataFrame) = df.filter(
      expr("try_variant_get(metadata, \"$['core.run']\", 'long')") === 777L)
    def shredPred(df: DataFrame) = df.filter(col("_s_core_run") === 777L)

    val n = rows("unsorted").count()
    // warm the page cache so every arm reads warm files
    rows("unsorted").agg(count(lit(1))).collect()
    rows("sorted").agg(count(lit(1))).collect()
    val vu = timed(variantPred(rows("unsorted")))
    val su = timed(shredPred(rows("unsorted")))
    val vs = timed(variantPred(rows("sorted")))
    val ss = timed(shredPred(rows("sorted")))
    val pushed = shredPred(rows("sorted")).queryExecution.executedPlan
      .toString.contains("PushedFilters: [IsNotNull(_s_core_run), EqualTo(_s_core_run,777")
    println(f"SHREDPROBE rows=$n mult=$mult " +
      f"variant_unsorted=$vu%.3f shred_unsorted=$su%.3f " +
      f"variant_sorted=$vs%.3f shred_sorted=$ss%.3f pushed=$pushed " +
      f"decode_speedup=${vu / su}%.1fx io_speedup=${su / ss}%.1fx total=${vu / ss}%.1fx")
    org.apache.commons.io.FileUtils.deleteDirectory(out.toFile)
    spark.stop()
  }
}
