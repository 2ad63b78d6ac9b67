package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Variance probe for `pipe_containment_stratified` (r11 verdict: medians
  * swing 0.9→5.9 s across full-bench runs of IDENTICAL code at the same
  * sf) — times N back-to-back iterations of the exact bench measurement
  * in ONE JVM with per-stage wall attribution, so the swing can be
  * pinned to a stage (candidate-join skew? shingle re-extraction? AQE
  * re-plan?) rather than guessed at.
  *
  * Run it several times in a row from a shell loop: a within-JVM spread
  * means scheduling/skew; a stable-within-but-bimodal-across-JVMs spread
  * means a session-level mode (JIT, broadcast reuse, cache state).
  *
  *   scripts/run.sh graft.VarianceProbe [sfDir] [iters]
  */
object VarianceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm the shared shingle cache the way a full bench would have
    graft.pipeline.Dedup.withShingles(docs).count()

    val stageWall = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        for (s <- si.submissionTime; c <- si.completionTime)
          stageWall.put(si.stageId, (si.name.takeWhile(_ != '\n'), c - s))
      }
    })
    for (i <- 1 to iters) {
      stageWall.clear()
      val t0 = System.nanoTime()
      val n = graft.pipeline.Dedup.containmentPairsStratified(docs).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE iter=$i%2d pairs=$n%d total=$dt%6.2f s")
      import scala.jdk.CollectionConverters._
      val top = stageWall.asScala.toSeq.sortBy(-_._2._2).take(5)
      for ((id, (name, ms)) <- top)
        println(f"      stage $id%4d ${ms / 1e3}%6.2f s  $name")
    }
    spark.stop()
  }
}
