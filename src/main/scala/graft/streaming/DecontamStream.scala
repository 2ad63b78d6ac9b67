package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.pipeline.Decontam

/** Streaming decontamination — ingest-time filtering of training shards
  * against a static benchmark set.
  *
  * Entirely STATELESS: a document carries everything it needs (its own
  * n-grams), and the eval set is a driver-built broadcast HASH SET
  * probed per n-gram — no state store, no watermark, append mode. This
  * is the composition property that matters on an always-on ingest:
  * per-batch cost is one pass over the arriving shard with O(1)
  * membership per n-gram, state is zero, and the numbers are IDENTICAL
  * to the batch operator — the gate shares `pipe_decontam`'s DuckDB
  * oracle verbatim.
  *
  * The eval side ships ONCE per executor as a broadcast variable (eval
  * suites are MBs — bounded by construction), replacing the round-3
  * shape that collect_list'd the whole eval set into a single row and
  * re-scanned it linearly per document: per-doc cost is now
  * O(|doc n-grams|) instead of O(|doc n-grams| × |eval n-grams|), and
  * no single-row array artifact rides the plan.
  */
object DecontamStream {

  /** per-arriving-doc contamination stats against the static `evalDocs` */
  def decontam(stream: DataFrame, evalDocs: DataFrame, n: Int = 5): DataFrame = {
    val evalSet: Set[String] = Decontam.ngrams(evalDocs, n)
      .select(explode(col("g")).as("ng")).distinct()
      .collect().map(_.getString(0)).toSet
    val bcast = evalDocs.sparkSession.sparkContext.broadcast(evalSet)
    // a UDF (not codegen'd) is the deliberate trade here: only a scalar
    // closure can consult a broadcast variable, and O(1) probes against
    // a once-shipped set beat any codegen'd O(|eval|) array scan
    val hitsOf = udf((g: Seq[String]) => g.count(bcast.value.contains).toLong)
    Decontam.ngrams(stream, n)
      .select(col("doc_id"), size(col("g")).cast("long").as("n_ngrams"),
        hitsOf(col("g")).as("hits"))
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
