package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: print formatted physical plans for representative queries so
  * scan pushdown (PushedFilters/ReadSchema), broadcast choices and
  * whole-stage codegen spans can be reviewed. `sbt "runMain graft.PlanDump
  * [name ...]"` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q6_filter", "q3_join_topn", "mql_bfq_where", "mql_union",
        "pipe_sim_topk", "pipe_jaccard_pairs")
    for (n <- names) {
      println(s"\n================ $n ================")
      val df = SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
