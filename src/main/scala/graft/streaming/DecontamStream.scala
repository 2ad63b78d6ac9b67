package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.pipeline.Decontam

/** Streaming decontamination — ingest-time filtering of training shards
  * against a static benchmark set.
  *
  * Entirely STATELESS: a document carries everything it needs (its own
  * n-grams), and the eval set is a static one-row n-gram list joined in
  * via a stream-static cross join (broadcast nested loop of one row —
  * no state store, no watermark, append mode). This is the composition
  * property that matters on an always-on ingest: per-batch cost is one
  * pass over the arriving shard, state is zero, and the numbers are
  * IDENTICAL to the batch operator — the gate shares
  * `pipe_decontam`'s DuckDB oracle verbatim.
  */
object DecontamStream {

  /** per-arriving-doc contamination stats against the static `evalDocs` */
  def decontam(stream: DataFrame, evalDocs: DataFrame, n: Int = 5): DataFrame = {
    val evalList = Decontam.ngrams(evalDocs, n)
      .select(explode(col("g")).as("ng")).distinct()
      .agg(collect_list(col("ng")).as("evl")) // one static row
    Decontam.ngrams(stream, n)
      .crossJoin(evalList)
      .select(col("doc_id"), size(col("g")).cast("long").as("n_ngrams"),
        size(array_intersect(col("g"), col("evl"))).cast("long").as("hits"))
      .withColumn("contam_frac", round(col("hits").cast("double") / col("n_ngrams"), 4))
      .withColumn("contaminated", col("hits") > 0)
  }

  /** the corpus staged as two parity micro-batches; train docs stream
    * through, eval docs (doc_id % 37 == 0) are the static side */
  def runToBatch(spark: SparkSession, docFile: String, name: String): DataFrame = {
    val dir = DedupStream.stageParitySplit(spark, docFile)
    val stream = spark.readStream
      .schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val evalDocs = spark.read.parquet(docFile).filter(col("doc_id") % 37 === 0)
    val q = decontam(stream.filter(col("doc_id") % 37 =!= 0), evalDocs)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
