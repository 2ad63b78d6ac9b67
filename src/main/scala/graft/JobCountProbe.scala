package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Job-count + wall attribution for one SparkEntry gate: the write-path
  * scenario gates' cost is job-count × scheduling overhead (dozens of
  * sequential commits, each a handful of small Spark jobs), so the lever
  * is FEWER jobs per mutation, not faster scans. This probe counts jobs
  * and sums their wall per iteration so a probe-fusion change can be
  * verified as an actual job-count drop.
  *
  *   scripts/run.sh graft.JobCountProbe <gate> [sfDir] [iters]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val verbose = sys.env.get("SPARK_GRAFT_JOBPROBE_V").contains("1")
    val sites = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
    val siteWall = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
    val jobSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    // java.lang.Long values: with a Scala primitive Long the remove() of
    // an absent key would unbox null to 0L and the null check below could
    // never fire — a JobEnd without a recorded start would then add
    // (ev.time - 0), i.e. epoch millis, to jobWall
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val jobWall = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(ev.jobId, ev.time)
        if (verbose) {
          // short callsite: first line of the long form names the API call
          // the result stage's name IS the short callsite
          // ("collect at Foo.scala:123")
          val cs = ev.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobSite.put(ev.jobId, cs)
          sites.computeIfAbsent(cs,
            _ => new java.util.concurrent.atomic.AtomicLong(0L))
            .incrementAndGet()
        }
        ()
      }
      override def onJobEnd(ev: SparkListenerJobEnd): Unit = {
        val s = starts.remove(ev.jobId)
        if (s != null) {
          jobWall.addAndGet(ev.time - s)
          if (verbose) {
            val cs = jobSite.remove(ev.jobId)
            if (cs != null)
              siteWall.computeIfAbsent(cs,
                _ => new java.util.concurrent.atomic.AtomicLong(0L))
                .addAndGet(ev.time - s)
          }
        }
        ()
      }
    })
    val fn = SparkEntry.queries(gate)
    for (i <- 1 to iters) {
      jobs.set(0); jobWall.set(0L)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // jobWall sums per-job durations (sequential jobs ⇒ ≈ busy wall);
      // total − jobWall ≈ driver-side planning/scheduling gaps
      println(f"JOBPROBE gate=$gate iter=$i rows=$n total=$dt%6.2f s " +
        f"jobs=${jobs.get()}%4d jobWall=${jobWall.get() / 1e3}%6.2f s " +
        f"gap=${dt - jobWall.get() / 1e3}%6.2f s")
      if (verbose && i == iters) {
        import scala.jdk.CollectionConverters._
        sites.asScala.toSeq
          .map { case (cs, c) =>
            (cs, c.get(), Option(siteWall.get(cs)).map(_.get()).getOrElse(0L)) }
          .sortBy(-_._3)
          .take(30)
          .foreach { case (cs, c, w) =>
            println(f"JOBSITE $c%5d jobs ${w / 1e3}%8.2f s  $cs") }
      }
      if (verbose) { sites.clear(); siteWall.clear() }
    }
    spark.stop()
  }
}
