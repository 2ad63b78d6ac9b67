package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.metacat.DedupLog
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Ingest-throughput probe for the MULTI-WRITER OCC dedup store
  * ([[graft.metacat.DedupLog]]): W writers concurrently ingest B batches
  * of N synthetic docs each into ONE shared store, and the probe reports
  * aggregate docs/s per writer count plus the protocol counters
  * (listings/ingest, max single ingest).
  *
  * Three contention arms mirror [[ConcurrencyProbe]]'s:
  *  - `disjoint` (default): every doc's token set is unique to its
  *    (writer, batch, doc) — all key footprints disjoint, commits
  *    commute, Spark writes overlap; aggregate throughput should scale
  *    with writers until the local scheduler saturates.
  *  - `--clones`: a fixed pool of clone groups is spread across EVERY
  *    writer's batches — all footprints intersect on the shared buckets,
  *    the fully-serialized path; correctness over speed (exactly one
  *    admitted doc per group, asserted post-run).
  *  - `--mixed`: every 4th doc comes from the shared pool — the partial
  *    contention a real multi-source ingest fleet produces.
  *
  * Single-JVM threads sharing one local[32] scheduler — past ~8 writers
  * the sag measures harness contention, not the protocol (the same
  * caveat ConcurrencyProbe's multi-JVM arm exists for); run small writer
  * counts for protocol signal. Post-run the probe asserts the store
  * invariants regardless of arm: fsck green and no duplicate admitted
  * text.
  *
  * Pass `--multi-jvm` to run each writer as its OWN driver process (own
  * JVM + SparkSession, shared store root via scripts/run.sh,
  * SPARK_GRAFT_CPUS split evenly, floor 2) — the real deployment shape
  * (one ingest stream per driver), removing the shared-scheduler ceiling
  * from the measurement. The parent stamps the store's LSH config pin
  * first; workers verify it on open.
  *
  *   sbt "runMain graft.DedupIngestProbe [docsPerBatch batches w1 w2 ...] [--clones|--mixed] [--multi-jvm]"
  */
object DedupIngestProbe {

  /** deterministic 10-token doc bodies; seed uniqueness = near-dup
    * structure (shared seed ⇒ jaccard 1.0, distinct seeds ⇒ 0.0) */
  private def docsDf(spark: SparkSession, n: Int, idBase: Long,
      seedFor: Int => String): DataFrame = {
    import spark.implicits._
    (0 until n).map(k => (idBase + k,
      (0 until 10).map(i => s"${seedFor(k)}-$i").mkString(" ")))
      .toDF("doc_id", "text")
  }

  private val clonePool = 256 // shared groups the contended arms draw from

  private def seedFor(mode: String, wi: Int, b: Int): Int => String = k =>
    if (mode == "clones" || (mode == "mixed" && k % 4 == 3))
      s"shared-${(wi + b + k) % clonePool}"
    else s"w$wi-b$b-d$k"

  /** one writer's burst — shared by the in-process futures and the
    * multi-JVM workers (identical workload either way) */
  private def burst(spark: SparkSession, dl: DedupLog, wi: Int,
      batches: Int, docsPerBatch: Int, mode: String,
      maxNs: java.util.concurrent.atomic.AtomicLong): Unit = {
    for (b <- 0 until batches) {
      val bid = wi.toLong * batches + b
      val d = docsDf(spark, docsPerBatch, bid * 1000000L, seedFor(mode, wi, b))
      val c0 = System.nanoTime()
      dl.ingest(d, bid)
      val dt = System.nanoTime() - c0
      var cur = maxNs.get()
      while (dt > cur && !maxNs.compareAndSet(cur, dt)) cur = maxNs.get()
    }
  }

  /** child-process arm: one writer's burst in its OWN JVM — the real
    * deployment shape (one ingest stream per driver), same caveat-closing
    * move as ConcurrencyProbe's multi-JVM arm: the single-JVM numbers
    * past ~4 writers measure local-scheduler contention, not protocol */
  private def worker(args: Array[String]): Unit = {
    val Array(root, idxS, batchesS, docsS, cpusS, mode) = args
    val (idx, batches, docs) = (idxS.toInt, batchesS.toInt, docsS.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpusS]")
      .config("spark.sql.shuffle.partitions", cpusS)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName(s"graft-dedup-worker-$idx")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dl = new DedupLog(spark, root)
    val maxNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val l0 = graft.metacat.OccLog.listings.get()
    val t0 = System.nanoTime()
    burst(spark, dl, idx, batches, docs, mode, maxNs)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"DEDUPWORKER idx=$idx wall=$wall%.3f " +
      f"listings=${graft.metacat.OccLog.listings.get() - l0} " +
      f"maxIngest=${maxNs.get() / 1e9}%.3f")
    spark.stop()
  }

  /** day-N arm: ONE writer ingests `batches` sequential batches into one
    * store, checkpoint+vacuum every 4th — the OCC twin of the bare
    * store's SCALE10X incremental-ingest curve. Per-batch wall must stay
    * FLAT while the corpus grows (the probe is bucket-keyed against the
    * narrow index, the records() read is bounded by the checkpoint, and
    * the commit costs O(batch)); prints one DEDUPCURVE line per batch. */
  private def curveArm(spark: SparkSession, docsPerBatch: Int,
      batches: Int): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_dedup_curve_")
      .toString + "/store"
    val dl = new DedupLog(spark, root)
    for (b <- 0 until batches) {
      val d = docsDf(spark, docsPerBatch, b.toLong * 1000000L,
        seedFor("disjoint", 0, b))
      val t0 = System.nanoTime()
      dl.ingest(d, b.toLong)
      val wall = (System.nanoTime() - t0) / 1e9
      val maint = b % 4 == 3
      if (maint) { dl.checkpoint(); dl.vacuum() }
      println(f"DEDUPCURVE batch=$b%2d wall=$wall%6.2f s corpus=" +
        f"${(b + 1).toLong * docsPerBatch}%7d ckpt=$maint")
    }
    require(dl.fsck().filter(!col("ok")).count() == 0L, "fsck violations")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--worker")) { worker(args.drop(1)); return }
    val clones = args.contains("--clones")
    val mixed = args.contains("--mixed")
    val multiJvm = args.contains("--multi-jvm")
    val curve = args.contains("--curve")
    val rest = args.filterNot(a =>
      a == "--clones" || a == "--mixed" || a == "--multi-jvm" || a == "--curve")
    val docsPerBatch = if (rest.nonEmpty) rest(0).toInt else 2000
    val batches = if (rest.length > 1) rest(1).toInt else 4
    val writerCounts =
      if (rest.length > 2) rest.drop(2).map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val mode = if (clones) "clones" else if (mixed) "mixed" else "disjoint"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (curve) { curveArm(spark, docsPerBatch, batches); spark.stop(); return }

    for (w <- writerCounts) {
      val root = java.nio.file.Files.createTempDirectory("graft_dedup_ing_")
        .toString + "/store"
      val dl = new DedupLog(spark, root)
      val nIngests = w * batches
      val (secs, perIngestListings, maxIngest) = if (multiJvm) {
        val cpus = math.max(2,
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt / w)
        val outs = (0 until w).map(i =>
          java.nio.file.Files.createTempFile(s"graft_dedupw_${i}_", ".out"))
        val procs = (0 until w).map { i =>
          val pb = new ProcessBuilder("bash", "scripts/run.sh",
            "graft.DedupIngestProbe", "--worker", root, i.toString,
            batches.toString, docsPerBatch.toString, cpus.toString, mode)
          pb.directory(new java.io.File("/root/repo"))
          pb.redirectErrorStream(true)
          pb.redirectOutput(outs(i).toFile)
          pb.start()
        }
        procs.foreach { p =>
          if (!p.waitFor(60, java.util.concurrent.TimeUnit.MINUTES))
            throw new IllegalStateException("dedup worker timed out")
          require(p.exitValue() == 0,
            s"dedup worker failed — see ${outs.mkString(",")}")
        }
        val W = ("DEDUPWORKER idx=(\\d+) wall=([0-9.]+) " +
          "listings=(\\d+) maxIngest=([0-9.]+)").r
        val stats = outs.map { o =>
          val txt = new String(java.nio.file.Files.readAllBytes(o))
          W.findFirstMatchIn(txt).getOrElse(
            throw new IllegalStateException(s"no DEDUPWORKER line in $o"))
        }
        outs.foreach(o => java.nio.file.Files.deleteIfExists(o))
        // wall = slowest worker (JVM startup excluded); listings summed
        (stats.map(_.group(2).toDouble).max,
          stats.map(_.group(3).toLong).sum.toDouble / nIngests,
          stats.map(_.group(4).toDouble).max)
      } else {
        val maxNs = new java.util.concurrent.atomic.AtomicLong(0L)
        val listings0 = graft.metacat.OccLog.listings.get()
        val t0 = System.nanoTime()
        Await.result(Future.sequence((0 until w).map { wi =>
          Future { burst(spark, dl, wi, batches, docsPerBatch, mode, maxNs) }
        }), 60.minutes)
        ((System.nanoTime() - t0) / 1e9,
          (graft.metacat.OccLog.listings.get() - listings0).toDouble / nIngests,
          maxNs.get() / 1e9)
      }
      // store invariants hold whatever the interleave was
      val admitted = dl.corpus().persist()
      val n = admitted.count()
      val dupTexts = n - admitted.select("text").distinct().count()
      require(dupTexts == 0L, s"$dupTexts duplicate admitted texts")
      val badFsck = dl.fsck().filter(!col("ok")).count()
      require(badFsck == 0L, s"$badFsck fsck violations")
      admitted.unpersist()
      val docsTotal = nIngests.toLong * docsPerBatch
      println(f"DEDUPPROBE mode=$mode writers=$w%2d  ingests=$nIngests%3d  " +
        f"docs=$docsTotal%7d  admitted=$n%7d  wall=$secs%6.1f s  " +
        f"throughput=${docsTotal / secs}%8.1f docs/s  " +
        f"per-ingest=${secs / nIngests}%5.2f s  " +
        f"listings/ingest=$perIngestListings%6.1f  " +
        f"max-ingest=$maxIngest%5.2f s" +
        (if (multiJvm) s"  [multi-jvm]" else ""))
    }
    spark.stop()
  }
}
