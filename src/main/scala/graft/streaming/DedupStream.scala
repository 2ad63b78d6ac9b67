package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming ingest-time exact deduplication — the training-pipeline shape
  * where crawl shards land continuously and a document is admitted only if
  * its content fingerprint was never seen before (NEW scope beyond the
  * reference, SURVEY.md §2.10).
  *
  * `dropDuplicates` on the fingerprint keeps the dedup index in the
  * streaming state store (one small entry per distinct fingerprint —
  * RocksDB-backed and key-partitioned on a cluster, so state scales
  * horizontally with shuffle partitions; with an ingest-time column the
  * production variant is dropDuplicatesWithinWatermark, which also evicts).
  * The gate stages the SAME document file twice as two micro-batches: the
  * second batch is entirely suppressed by state from the first, proving
  * cross-batch suppression rather than batch-local distinct.
  *
  * The output projects only (fingerprint, n_chars) — identical across
  * copies of a document — so the surviving row set is deterministic no
  * matter which physical copy wins the state race.
  */
object DedupStream {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** stream the documents file as `copies` micro-batches (symlinks staged
    * into a fresh source dir, one file per trigger) */
  def readDocuments(spark: SparkSession, file: String, copies: Int): DataFrame = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(file).toAbsolutePath
    val d = Files.createTempDirectory("graft-dedup-stream-")
    d.toFile.deleteOnExit()
    for (i <- 1 to copies)
      Files.createSymbolicLink(d.resolve(s"copy_$i.parquet"), src)
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString)
  }

  /** admit each content fingerprint once across all micro-batches */
  def dedupByFingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("fingerprint", md5(col("text")))
      .dropDuplicates("fingerprint")
      .select(col("fingerprint"), col("n_chars"))

  /** run to completion over the staged copies and return the admitted set */
  def runToBatch(spark: SparkSession, docFile: String, name: String,
      copies: Int = 2): DataFrame = {
    val q = dedupByFingerprint(readDocuments(spark, docFile, copies))
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
