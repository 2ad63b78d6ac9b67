package graft
import org.apache.spark.sql.SparkSession

/** Targeted micro-benchmark: `MicroBench <sfDir> <reps> <query...>` runs
  * the named `SparkEntry.queries` entries `reps` times each (after a
  * catalog warm-up) and prints min/median seconds per query — for
  * before/after comparisons on a single operator without the noise of the
  * full bench. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new graft.metacat.DerivedCatalog(spark, sfDir).files.count()
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$n%-28s min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
