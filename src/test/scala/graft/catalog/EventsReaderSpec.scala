package graft.catalog

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Schema-drift guard for the events loader (round-6 postmortem: a
  * testdata re-encode from INT64 TIMESTAMP(NANOS) to plain timestamp[us]
  * crashed 4 batch gates and silently corrupted 3 streaming gates, because
  * the readers hard-coded one encoding).
  *
  * The committed fixtures hold the SAME 20 logical rows in the three
  * encodings a producer may emit: TIMESTAMP(NANOS), timestamp[us]
  * (NTZ), and timestamp[us] UTC-adjusted. Every encoding must load to an
  * identical TimestampType frame, through BOTH the batch and streaming
  * paths.
  */
class EventsReaderSpec extends SparkTestBase {

  private val encodings = Seq("events_ts_nanos", "events_ts_us", "events_ts_us_utc")

  private def fixture(name: String): String =
    getClass.getResource(s"/$name.parquet").getPath

  test("batch: all three ts encodings load identically as TimestampType") {
    val frames = encodings.map { e =>
      val df = EventsReader.readBatch(spark, fixture(e))
      assert(df.schema("ts").dataType == TimestampType, s"$e ts type")
      e -> df.select(col("event_id"), unix_micros(col("ts")).as("us"))
    }
    val ref = frames.head._2.collect().sortBy(_.getLong(0)).toSeq
    assert(ref.nonEmpty)
    for ((e, df) <- frames.tail) {
      assert(df.collect().sortBy(_.getLong(0)).toSeq == ref,
        s"$e differs from ${encodings.head}")
    }
  }

  test("streaming: encoding-adaptive reader matches batch for each encoding") {
    import org.apache.spark.sql.streaming.Trigger
    for (e <- encodings) {
      val path = fixture(e)
      val q = EventsReader.readStream(spark, stageToDir(path), schemaFrom = path)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .writeStream.outputMode("append").format("memory")
        .queryName(s"drift_$e").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.table(s"drift_$e").collect().sortBy(_.getLong(0)).toSeq
      val batch = EventsReader.readBatch(spark, path)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().sortBy(_.getLong(0)).toSeq
      assert(streamed == batch && batch.nonEmpty, s"$e streaming mismatch")
    }
  }

  test("unsupported ts type fails loudly, not silently") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-").toString
    spark.range(3).selectExpr("id AS event_id", "cast(id as string) AS ts")
      .write.mode("overwrite").parquet(dir)
    intercept[IllegalArgumentException] {
      EventsReader.readBatch(spark, dir)
    }
  }

  /** streaming file source needs a directory; symlink single files */
  private def stageToDir(path: String): String = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(path)
    val d = Files.createTempDirectory("graft-drift-stream-")
    Files.createSymbolicLink(d.resolve(p.getFileName), p.toAbsolutePath)
    d.toString
  }
}
