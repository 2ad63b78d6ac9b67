package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.pipeline.Decontam

/** Streaming corpus ADMISSION GATE — the ingest-time composition a
  * training pipeline actually deploys: as crawl shards land, each
  * document is scored (quality), language-identified, and checked for
  * benchmark contamination, and the gate verdict rides out with the row.
  *
  * Entirely STATELESS — all three signals are per-document: quality and
  * language are column expressions, and the eval n-gram set is a
  * once-broadcast hash set probed O(1) per n-gram (the
  * [[DecontamStream]] posture). No state store, no watermark, append
  * mode; per-batch cost is one pass over the arriving shard. The
  * stateful stages of the full pipeline (cross-batch dedup, near-dup
  * indexing) compose downstream as separate operators
  * ([[DedupStream]]) — gating is deliberately kept stateless so it can
  * run at the very front of ingest with zero recovery cost.
  *
  * Expressions mirror `TextAnalysis.quality` / `TextAnalysis.langId` /
  * `Decontam.ngrams` exactly (same rounding, same markers, same n-gram
  * windows), so the DuckDB oracle recomputes the identical verdicts in
  * batch. Unlike `Decontam.ngrams`, documents shorter than n tokens are
  * NOT dropped — they carry no n-gram and gate as uncontaminated.
  */
object CorpusGateStream {

  /** per-arriving-doc admission verdict against the static `evalDocs` */
  def gate(stream: DataFrame, evalDocs: DataFrame, minQuality: Double = 0.5,
      lang: String = "en", n: Int = 5): DataFrame = {
    val evalSet: Set[String] = Decontam.ngrams(evalDocs, n)
      .select(explode(col("g")).as("ng")).distinct()
      .collect().map(_.getString(0)).toSet
    val bcast = evalDocs.sparkSession.sparkContext.broadcast(evalSet)
    val contaminatedOf = udf((g: Seq[String]) =>
      g != null && g.exists(bcast.value.contains))
    val enMarkers = array(Seq("the", "a", "and", "of", "value", "table").map(lit): _*)
    stream
      .withColumn("__t", split(lower(col("text")), " "))
      .withColumn("n_tokens", size(col("__t")).cast("long"))
      .withColumn("punct_ratio",
        round((length(col("text")) -
          length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))).cast("double") /
          greatest(length(col("text")), lit(1)), 4))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_tokens").cast("double") / 50) *
          (lit(1.0) - col("punct_ratio")), 4))
      .withColumn("predicted",
        when(size(array_intersect(col("__t"), enMarkers)) > 0, "en").otherwise("unk"))
      .withColumn("__g",
        when(size(col("__t")) >= n, array_distinct(expr(
          s"transform(sequence(0, size(__t) - $n), i -> concat_ws(' ', slice(__t, i + 1, $n)))")))
          .otherwise(array().cast("array<string>")))
      .withColumn("contaminated", contaminatedOf(col("__g")))
      .select(col("doc_id"), col("quality_score"), col("predicted"),
        col("contaminated"),
        (col("quality_score") >= minQuality && col("predicted") === lang &&
          !col("contaminated")).as("admitted"))
  }

  /** the corpus staged as two parity micro-batches; train docs stream
    * through the gate, eval docs (doc_id % 37 == 0) are the static side */
  def runToBatch(spark: SparkSession, docFile: String, name: String): DataFrame = {
    val dir = DedupStream.stageParitySplit(spark, docFile)
    val stream = spark.readStream
      .schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val evalDocs = spark.read.parquet(docFile).filter(col("doc_id") % 37 === 0)
    val q = gate(stream.filter(col("doc_id") % 37 =!= 0), evalDocs)
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
