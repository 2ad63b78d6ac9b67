package graft.streaming

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._

/** Streaming vs batch equivalence: the AvailableNow incremental execution
  * of the hourly aggregate must produce exactly the batch result. */
class EventsStreamSpec extends SparkTestBase {

  test("streamed hourly aggregate equals batch computation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventsStream.runToBatch(spark, s"$dir/events.parquet", "t_stream_hourly")
      .select("hour_epoch", "event_type", "n", "total_value")

    val batch = graft.catalog.Tables.load(spark, dir, "events")
      .groupBy((floor(unix_timestamp(col("ts")) / 3600) * 3600).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
