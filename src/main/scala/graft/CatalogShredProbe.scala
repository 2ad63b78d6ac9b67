package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shred-layout curve THROUGH THE CATALOG READ PATH (r14; r13 verdict
  * Next-round #4): r13's ShredProbe measured sorted-shred pruning on a
  * standalone probe table — this probe measures the productized layout:
  * the [[graft.metacat.DerivedCatalog]] materialized store (now written
  * sorted on the hot shred keys) queried through the REAL paths a user
  * runs — the raw files frame and an MQL `files where core.run == 777`
  * (whose predicate MetaCompiler compiles to the typed `_s_core_run`
  * column).
  *
  * Arms per mult (scaled orders = dense key shift, the ScaleData rule):
  *   variant — `try_variant_get` per row through cat.files: no pushdown
  *     possible; grows linearly with rows (the floor to beat)
  *   mql     — `files where core.run == 777` through the MQL planner:
  *     typed predicate reaches the scan; with the sorted store, row-group
  *     min/max skips ~99.9% of groups, so cost should stay FLAT in mult
  *
  *   scripts/run.sh graft.CatalogShredProbe [sfDir] [mult...]
  */
object CatalogShredProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 40)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(df: => DataFrame): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(count(lit(1)), sum("size")).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      runs(1)
    }

    for (mult <- mults) {
      val out = java.nio.file.Files.createTempDirectory(s"graft_catshred_${mult}x_")
      val orders = spark.read.parquet(s"$baseDir/orders.parquet")
      val off = orders.agg(max("o_orderkey")).head().getLong(0) + 1
      (0 until mult).map(r => orders.withColumn("o_orderkey",
          col("o_orderkey") + lit(r * off)))
        .reduce(_.unionByName(_))
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(s"$out/orders.parquet")
      val tIngest = System.nanoTime()
      val cat = new graft.metacat.DerivedCatalog(spark, out.toString)
      val n = cat.files.count() // forces the one-time sorted-store ingest
      val ingest = (System.nanoTime() - tIngest) / 1e9
      val variant = timed(cat.files.filter(
        expr("try_variant_get(metadata, \"$['core.run']\", 'long')") === 777L))
      def mqlSel = graft.mql.Mql.query(spark, cat, "files where core.run == 777")
      val mql = timed(mqlSel)
      val plan = mqlSel.queryExecution.executedPlan.toString
      val pushed = plan.contains("EqualTo(_s_core_run,777") &&
        plan.contains("PushedFilters")
      println(f"CATSHRED mult=$mult%3d rows=$n ingest=$ingest%.1f " +
        f"variant=$variant%.3f mql_shred=$mql%.3f pushed=$pushed " +
        f"speedup=${variant / mql}%.1fx")
      org.apache.commons.io.FileUtils.deleteDirectory(out.toFile)
      // also drop the materialized store this probe dir spawned (keyed by
      // the temp dir path — it would otherwise accumulate per run)
      val storeKey = java.security.MessageDigest.getInstance("MD5")
        .digest(out.toString.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(16)
      val store = sys.env.getOrElse("SPARK_GRAFT_CATALOG_STORE",
        "/tmp/graft-catalog-store")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$store/files-$storeKey"))
    }
    spark.stop()
  }
}
