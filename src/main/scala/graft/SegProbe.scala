package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.Dedup

/** Long-segment A/B for `keyByFingerprint`: at the gate default
  * (10-token segments) the md5 key and the segment text are about the
  * same width, so the two paths tie; the fingerprint path exists for
  * LONG segments (paragraph/document-granularity dedup), where the
  * content shuffles otherwise move the text itself as the join key.
  * Runs both paths at a given segment length and prints medians.
  *
  *   SPARK_GRAFT_SF_DIR=target/scale10x scripts/run.sh graft.SegProbe [segTokens]
  */
object SegProbe {
  def main(args: Array[String]): Unit = {
    val segTokens = args.headOption.map(_.toInt).getOrElse(120)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale10x")
    val mult = args.lift(1).map(_.toInt).getOrElse(1)
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    // optional in-memory multiplication: clones make every segment a
    // cross-document duplicate, pushing the content shuffle from noise
    // to dominant — the regime the key-width choice is about
    val off = docs0.agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0) + 1
    val docs =
      if (mult <= 1) docs0
      else (0 until mult).map(i => docs0.withColumn("doc_id",
        org.apache.spark.sql.functions.col("doc_id") + (i * off)))
        .reduce(_.unionByName(_)).repartition(cpus.toInt).persist()
    println(s"SEGPROBE segTokens=$segTokens docs=${docs.count()}")
    for ((tag, fp) <- Seq("text" -> false, "fp" -> true)) {
      Dedup.dedupSegments(docs, segTokens, keyByFingerprint = fp).count() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Dedup.dedupSegments(docs, segTokens, keyByFingerprint = fp).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"SEGPROBE dedupSegments/$tag med=${runs(1)}%.2f min=${runs.head}%.2f")
    }
    spark.stop()
  }
}
