package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream INTERVAL join — the streaming twin of
  * [[graft.operators.RangeJoin]] (and the funnel-attribution shape every
  * event pipeline needs): each purchase joins the clicks of the SAME user
  * whose timestamp falls in the hour before it.
  *
  * This is Spark's native time-bounded stream-stream join: both sides are
  * watermarked, and the time-range predicate tells the engine exactly how
  * long a buffered row can still find partners — clicks older than the
  * watermark minus the bound are EVICTED from join state, so state is
  * bounded by (events within the time bound + watermark slack), never the
  * stream history. That eviction contract is the whole reason streaming
  * engines make interval joins first-class instead of generic theta
  * joins. On a real cluster both sides would be independent Kafka topics;
  * here both derive from the staged events source, which exercises the
  * same join machinery.
  */
object IntervalJoinStream {

  /** purchases ⋈ clicks of the same user with
    * click_ts ∈ [purchase_ts − 1h, purchase_ts]; emits one row per
    * matching pair (append mode — pairs are final once the watermark
    * passes, no state ever re-emits). `delay` is the watermark: how far
    * out-of-order either side may arrive relative to the max event time
    * seen — rows older than that are dropped as late AND matching state
    * beyond delay + the join bound is evicted. Size it to the source's
    * real disorder: too small silently drops late pairs (the
    * `IntervalJoinStreamSpec` cross-batch case is exactly that hazard),
    * too large only delays state eviction. */
  def attributed(events: DataFrame, delay: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", delay)
    purchases.join(clicks, expr(
      """user_id = c_user AND
        |click_ts <= purchase_ts AND
        |click_ts >= purchase_ts - interval 1 hour""".stripMargin))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        unix_micros(col("click_ts")).as("click_us"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** run the interval join over the existing files (AvailableNow) and
    * return the materialized pair set for the Verify gate.
    *
    * Stream-stream joins keep FOUR keyed state stores per shuffle
    * partition (left/right × keyToNumValues/keyWithIndexToValue); the
    * store count is pinned by the shuffle-partition conf at checkpoint
    * creation and every micro-batch pays a per-store maintenance cost
    * regardless of data volume — so this bounded local run scopes the
    * conf down, same posture as [[DedupStream.runNearDupToBatch]] (a real
    * cluster sizes it to executor count once, at deploy time). */
  def runToBatch(spark: SparkSession, eventsDir: String, name: String): DataFrame = {
    val partKey = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(partKey)
    spark.conf.set(partKey, "8")
    try {
      val q = attributed(EventsStream.readEvents(spark, eventsDir))
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(partKey, saved)
    spark.table(name)
  }
}
