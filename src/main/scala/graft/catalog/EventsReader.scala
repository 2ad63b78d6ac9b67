package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive reader for the `events` table — the ONE place that
  * knows how an on-disk `ts` column may be encoded.
  *
  * The engine reads parquet it does not control (unlike the reference,
  * which reads typed Postgres columns — `metacat/db/dbobjects2.py:126-133`
  * never faces this), so the loader must adapt to the encoding it finds
  * rather than bake one in:
  *
  *   - `INT64 TIMESTAMP(NANOS)` — vanilla Spark rejects it; with
  *     `spark.sql.legacy.parquet.nanosAsLong` the column surfaces as
  *     LongType nanos, which we truncate to microseconds (the same
  *     truncation DuckDB applies), keeping `ts` a TimestampType.
  *   - plain `timestamp[us]` (isAdjustedToUTC=false) — Spark reads it as
  *     TIMESTAMP_NTZ; cast to TimestampType (session TZ is pinned to UTC
  *     everywhere, so the cast is value-preserving) for watermark/window
  *     semantics downstream.
  *   - `timestamp[us/ms] UTC-adjusted` — already TimestampType, pass
  *     through.
  *
  * Both the batch loader ([[Tables.load]]) and the streaming sources
  * ([[graft.streaming.EventsStream]], [[graft.streaming.IntervalJoinStream]])
  * go through here, so an encoding change in the data can never again
  * split batch and streaming behavior.
  */
object EventsReader {

  /** The schema Spark will see for the file(s) at `path`, with the
    * nanos-as-long escape hatch enabled so NANOS footers are readable.
    * One footer read — cheap, and the streaming source needs an explicit
    * schema anyway. */
  def rawSchema(spark: SparkSession, path: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path).schema
  }

  /** Normalize `ts` to TimestampType whatever encoding the scan produced. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => // nanos-as-long path: truncate to µs
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => df
    case other =>
      throw new IllegalArgumentException(
        s"events.ts: unsupported on-disk type $other (expected INT64 nanos, " +
          "TIMESTAMP_NTZ, or TIMESTAMP)")
  }

  /** Batch read with `ts` normalized. */
  def readBatch(spark: SparkSession, path: String): DataFrame =
    normalizeTs {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path)
    }

  /** Streaming read with `ts` normalized; `dir` must be a directory (the
    * caller stages single files — see [[graft.streaming.EventsStream.stageDir]]).
    * `schemaFrom` points at the concrete file/dir used to infer the schema
    * (the streaming source requires one explicitly). */
  def readStream(spark: SparkSession, dir: String, schemaFrom: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    normalizeTs {
      spark.readStream
        .schema(rawSchema(spark, schemaFrom))
        .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
        .parquet(dir)
    }
}
