package graft.streaming

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import scala.jdk.CollectionConverters._

/** The time-bounded stream-stream join must find pairs ACROSS
  * micro-batches (buffered join state), not just within one: clicks
  * arrive in batch 1, their purchases only in batch 2. */
class IntervalJoinStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def nanos(minute: Int): Long = minute * 60L * 1000000000L

  /** the streaming file source lists FILES, not spark output dirs: write
    * the dir, then promote its single part file to `dir/name` */
  private def writeBatch(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, Long, Long, String)]): Unit = {
    val staging = dir.resolve(s"_$name.d")
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, dir.resolve(name))
  }

  test("pairs span micro-batches; out-of-bound clicks never match") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivj-spec-")
    graft.TempDirs.register(dir)
    // batch 1: clicks at minute 10 (users 1, 2) and a stale click at
    // minute 100 BEFORE user 3's purchase window
    writeBatch(dir, "b1.parquet", Seq(
      (1L, nanos(10), 1L, "click"),
      (2L, nanos(10), 2L, "click"),
      (3L, nanos(100), 3L, "click")))
    // batch 2: purchases — user 1 inside the hour (minute 40), user 2
    // outside it (minute 80), user 3 at minute 170 (click 70 min stale)
    writeBatch(dir, "b2.parquet", Seq(
      (10L, nanos(40), 1L, "purchase"),
      (11L, nanos(80), 2L, "purchase"),
      (12L, nanos(170), 3L, "purchase")))

    // watermark wider than the batches' full time spread: whichever file
    // becomes batch 1, the other side's rows must not be late-dropped
    val q = IntervalJoinStream.attributed(
        EventsStream.readEvents(spark, dir.toString), delay = "10 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("t_stream_ivj").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("t_stream_ivj")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    // only user 1's pair qualifies, and it required click state from
    // batch 1 to survive into batch 2
    assert(got == Set((10L, 1L)))
  }
}
