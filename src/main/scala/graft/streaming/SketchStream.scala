package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.KmvSketch
import graft.pipeline.{Dedup, Sketches}

/** Streaming KMV vocabulary tracking — a running distinct-token estimate
  * per source over a document stream.
  *
  * Why KMV is the right streaming sketch: the k smallest distinct hashes
  * are ORDER-INDEPENDENT, so the state after the last micro-batch equals
  * the batch computation over everything ever ingested — the gate shares
  * the batch operator's DuckDB oracle (minus the exact count, which
  * streaming cannot do without distinct-set-sized state; that asymmetry
  * is the sketch's whole value). State per source is the ≤ k-long KMV
  * buffer inside the streaming aggregation store — bounded forever, no
  * watermark needed, complete-mode output.
  */
object SketchStream {

  /** per-source running sketch columns over an arriving document stream */
  def vocabSketch(docs: DataFrame, k: Int = 16): DataFrame =
    docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .select(col("source"), Dedup.hex60(col("w")).as("h"))
      .groupBy("source")
      .agg(KmvSketch.kMinValues(col("h"), k).as("__mins"))
      .select(col("source"),
        size(col("__mins")).cast("long").as("k_used"),
        Sketches.kmvEstimate(col("__mins"), k).as("kmv_est"))

  /** corpus staged as two parity micro-batches; the final complete-mode
    * table must equal the batch sketch over the whole corpus */
  def runToBatch(spark: SparkSession, docFile: String, name: String): DataFrame = {
    val dir = DedupStream.stageParitySplit(spark, docFile)
    val stream = spark.readStream
      .schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = vocabSketch(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
