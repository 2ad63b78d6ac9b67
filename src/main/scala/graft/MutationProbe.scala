package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.metacat.ParquetCatalog

/** Mutation-amplification probe: measures the cost of ONE single-file
  * admin mutation against a parquet catalog at increasing table sizes, in
  * both storage modes.
  *
  * Copy-on-write rewrites the touched `namespace=` partition, so a
  * one-file retire costs O(partition rows) — scoped (r7) but still
  * growing with the catalog. Merge-on-read appends one row version to the
  * delta log, so the same mutation is O(1) in table size; only
  * `compactFilesLog()` — amortized over many mutations, schedulable
  * off-peak — pays the partition rewrite. This main prints both curves
  * side by side, plus the merged-read overhead while the log is hot,
  * which is the trade a 100 TB deployment is choosing between.
  *
  *   sbt "runMain graft.MutationProbe [nFiles ...]"
  */
object MutationProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(20000, 200000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeS(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    /** bytes of parquet under `root` written during `f` — wall time at
      * local scale is job-overhead-dominated; bytes rewritten is the
      * metric that extrapolates to 100 TB */
    def bytesWritten(root: String)(f: => Unit): Long = {
      val t0 = System.currentTimeMillis()
      f
      def walk(d: java.io.File): Iterator[java.io.File] =
        Option(d.listFiles()).iterator.flatten.flatMap(x =>
          if (x.isDirectory) walk(x) else Iterator(x))
      walk(new java.io.File(root))
        .filter(x => x.lastModified() >= t0 && x.getName.endsWith(".parquet"))
        .map(_.length()).sum
    }

    for (n <- sizes; nNs = 4) {
      def build(mor: Boolean): (ParquetCatalog, String) = {
        val root = java.nio.file.Files.createTempDirectory(s"graft_mp_").toString
        val cat = new ParquetCatalog(spark, root, mergeOnRead = mor)
        val rows = spark.range(n.toLong).select(
          format_string("P%09d", col("id")).as("fid"),
          format_string("ns%d", col("id") % nNs).as("namespace"),
          format_string("f_%d.dat", col("id")).as("name"),
          format_string("{\"core.run\":%d}", col("id") % 1000).as("metadata_json"),
          lit("probe").as("creator"),
          to_timestamp(lit("2026-03-01 00:00:00")).as("created_timestamp"),
          (col("id") * 10).as("size"))
        cat.declareFiles(rows)
        (cat, root)
      }
      val (cow, cowRoot) = build(mor = false)
      val (mor, morRoot) = build(mor = true)

      // one-file mutations: the amplification measurement
      var tCowRetire = 0.0; var tMorRetire = 0.0
      var tCowMeta = 0.0; var tMorMeta = 0.0
      val bCowRetire = bytesWritten(cowRoot) {
        tCowRetire = timeS(cow.retireFiles(Seq("P000000004"))) }
      val bMorRetire = bytesWritten(morRoot) {
        tMorRetire = timeS(mor.retireFiles(Seq("P000000004"))) }
      val bCowMeta = bytesWritten(cowRoot) {
        tCowMeta = timeS(cow.updateFileMeta(Seq("P000000008"), """{"opt.x":1}""")) }
      val bMorMeta = bytesWritten(morRoot) {
        tMorMeta = timeS(mor.updateFileMeta(Seq("P000000008"), """{"opt.x":1}""")) }
      // read cost while the log is hot (2 mutations deep) vs compacted
      val tMorReadHot = timeS(assert(mor.files.count() == n.toLong))
      val tCompact = timeS(mor.compactFilesLog())
      val tMorReadCold = timeS(assert(mor.files.count() == n.toLong))
      val tCowRead = timeS(assert(cow.files.count() == n.toLong))
      println(f"MUTPROBE n=$n%8d  retire  cow=$tCowRetire%6.2f s (${bCowRetire / 1024}%8d KiB)  mor=$tMorRetire%6.2f s (${bMorRetire / 1024}%5d KiB)")
      println(f"MUTPROBE n=$n%8d  meta    cow=$tCowMeta%6.2f s (${bCowMeta / 1024}%8d KiB)  mor=$tMorMeta%6.2f s (${bMorMeta / 1024}%5d KiB)")
      println(f"MUTPROBE n=$n%8d  read    cow=$tCowRead%6.2f s  mor(hot-log)=$tMorReadHot%6.2f s  mor(compacted)=$tMorReadCold%6.2f s  compact=$tCompact%6.2f s")

      // ---- MEMBERSHIP + EDGE amplification: all n files in one dataset,
      // a chain of n-1 provenance edges. COW rewrites files_datasets /
      // parent_child whole; MOR commits one record (removeFrom), ONE
      // wildcard (removeDataset — the 100M-member case), or one
      // wildcard+adds commit (replace-parents). Bytes rewritten is the
      // number that extrapolates.
      def buildM(mor: Boolean): (ParquetCatalog, String) = {
        val (cat, root) = build(mor)
        cat.createDataset("p", "all")
        cat.addTo(cat.files.select("fid"), "p", "all")
        cat.addProvenance(spark.range(n.toLong - 1).select(
          format_string("P%09d", col("id")).as("parent_fid"),
          format_string("P%09d", col("id") + 1).as("child_fid")))
        (cat, root)
      }
      val (cowM, cowMRoot) = buildM(mor = false)
      val (morM, morMRoot) = buildM(mor = true)
      import spark.implicits._
      var t = 0.0
      val bCowRm = bytesWritten(cowMRoot) { t = timeS(
        cowM.removeFrom(Seq("P000000004").toDF("fid"), "p", "all")) }
      val tCowRm = t
      val bMorRm = bytesWritten(morMRoot) { t = timeS(
        morM.removeFrom(Seq("P000000004").toDF("fid"), "p", "all")) }
      val tMorRm = t
      val bCowDrop = bytesWritten(cowMRoot) { t = timeS(cowM.removeDataset("p", "all")) }
      val tCowDrop = t
      val bMorDrop = bytesWritten(morMRoot) { t = timeS(morM.removeDataset("p", "all")) }
      val tMorDrop = t
      val bCowRep = bytesWritten(cowMRoot) { t = timeS(
        cowM.updateFile("P000000006", parents = Some(Seq("P000000001")), mode = "replace")) }
      val tCowRep = t
      val bMorRep = bytesWritten(morMRoot) { t = timeS(
        morM.updateFile("P000000006", parents = Some(Seq("P000000001")), mode = "replace")) }
      val tMorRep = t
      val tMemHot = timeS(morM.filesDatasets.count())
      val tMemCompact = timeS(morM.compactFilesLog())
      val tMemCold = timeS(morM.filesDatasets.count())
      println(f"MUTPROBE n=$n%8d  rm-member    cow=$tCowRm%6.2f s (${bCowRm / 1024}%8d KiB)  mor=$tMorRm%6.2f s (${bMorRm / 1024}%5d KiB)")
      println(f"MUTPROBE n=$n%8d  drop-dataset cow=$tCowDrop%6.2f s (${bCowDrop / 1024}%8d KiB)  mor=$tMorDrop%6.2f s (${bMorDrop / 1024}%5d KiB)")
      println(f"MUTPROBE n=$n%8d  repl-parents cow=$tCowRep%6.2f s (${bCowRep / 1024}%8d KiB)  mor=$tMorRep%6.2f s (${bMorRep / 1024}%5d KiB)")
      println(f"MUTPROBE n=$n%8d  member-read  mor(hot-log)=$tMemHot%6.2f s  mor(compacted)=$tMemCold%6.2f s  compact=$tMemCompact%6.2f s")
    }
    spark.stop()
  }
}
