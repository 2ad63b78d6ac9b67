package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table — NEW scope beyond the
  * reference (it has no stream processing, SURVEY.md §2.10): the same
  * engine operators expressed as an incremental query with event-time
  * watermarking.
  *
  * Scale design: a tumbling-window count/sum per event_type is a streaming
  * hash aggregation whose state is bounded by (windows in watermark ×
  * event types); the 1-hour watermark bounds late data and lets state be
  * evicted. On a real cluster the source would be Kafka/files landing in
  * object storage; `maxFilesPerTrigger` paces backfill.
  */
object EventsStream {

  /** Streaming events source. The on-disk `ts` encoding is NOT assumed:
    * the schema is inferred from the actual file footer and normalized by
    * [[graft.catalog.EventsReader]] — the same branch the batch loader
    * takes, so batch and streaming can never diverge on encoding. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    graft.catalog.EventsReader.readStream(spark, stageDir(dir), schemaFrom = dir)

  /** the streaming file source requires a DIRECTORY; when given a single
    * parquet file (the driver's layout), stage a temp dir of symlinks */
  private def stageDir(path: String): String = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(path)
    if (Files.isDirectory(p)) path
    else {
      val d = Files.createTempDirectory("graft-stream-")
      graft.TempDirs.register(d)
      Files.createSymbolicLink(d.resolve(p.getFileName), p.toAbsolutePath)
      d.toString
    }
  }

  /** hourly tumbling-window aggregate with a 1h watermark */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n"), col("total_value"))

  /** run the stream to completion over the existing files (AvailableNow)
    * and return the materialized result — a real incremental execution,
    * used by the Verify gate with a batch-SQL oracle. */
  def runToBatch(spark: SparkSession, eventsDir: String, name: String): DataFrame = {
    val q = hourlyByType(readEvents(spark, eventsDir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  // ---- custom state: per-user sessionization (mapGroupsWithState) ----

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(n: Long, lastTs: Long, sessions: Long, total: Double)
  final case class UserAgg(user_id: Long, n_events: Long, n_sessions: Long,
      total_value: Double)

  /** per-user event/session counters kept in keyed state: a new session
    * starts after a gap > gapMinutes. State is one small record per user —
    * bounded, evictable with a timeout in production. */
  def userSessions(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): org.apache.spark.sql.Dataset[UserAgg] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.selectExpr("user_id", "ts", "value").as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          var s = state.getOption.getOrElse(SessionState(0, Long.MinValue, 0, 0.0))
          for (e <- sorted) {
            val t = e.ts.getTime
            if (s.lastTs == Long.MinValue || t - s.lastTs > gapMinutes * 60000L)
              s = s.copy(sessions = s.sessions + 1)
            s = s.copy(n = s.n + 1, lastTs = t, total = s.total + e.value)
          }
          state.update(s)
          UserAgg(uid, s.n, s.sessions, s.total)
      }
  }

  /** run sessionization over the existing files and return per-user rows */
  def runSessionsToBatch(spark: SparkSession, eventsDir: String, name: String): DataFrame = {
    val q = userSessions(spark, readEvents(spark, eventsDir))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // update mode re-emits a user's row on every batch that touches it;
    // the LAST emission carries the final state
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("n_sessions")).as("n_sessions"),
        round(max(col("total_value")), 2).as("total_value"))
  }
}
