package graft.streaming

import graft.mql.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Watermarked streaming dedup (`dropDuplicatesWithinWatermark`) — the
  * bounded-state posture for always-on ingest. Three properties pinned
  * with a driver-controlled MemoryStream (wall clocks can't advance a
  * watermark deterministically):
  *
  *  1. suppression: a duplicate within `delay` of the original is dropped
  *     across micro-batches;
  *  2. EVICTION: once the watermark passes a key's admission window, its
  *     state-store row is removed (numRowsTotal shrinks — the property
  *     plain dropDuplicates can never give);
  *  3. re-admission: the documented semantics delta — a duplicate arriving
  *     after eviction is admitted again.
  *
  * Plus the RocksDB provider (the named production state store) running
  * the same operator end-to-end. */
class WatermarkDedupSpec extends SparkTestBase {

  private def ts(t: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $t")

  private def stateRows(q: StreamingQuery): Long =
    q.lastProgress.stateOperators.apply(0).numRowsTotal

  test("suppress within delay, evict past watermark, re-admit after") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String, Long, java.sql.Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "n_chars", "ingest_ts")
    val q = DedupStream.dedupByFingerprintWatermarked(docs, "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("t_wm_dedup").start()
    def admitted() = spark.table("t_wm_dedup")
    try {
      // batch 1: two originals at 10:00
      in.addData((1L, "alpha", 5L, ts("10:00:00")), (2L, "beta", 4L, ts("10:00:00")))
      q.processAllAvailable()
      assert(admitted().count() == 2)
      assert(stateRows(q) == 2)

      // batch 2: duplicate of alpha 5 min later — inside the window,
      // suppressed by state from batch 1
      in.addData((3L, "alpha", 5L, ts("10:05:00")))
      q.processAllAvailable()
      assert(admitted().count() == 2, "in-window duplicate must be suppressed")

      // batch 3: sentinel far ahead advances the watermark to 10:20 —
      // past alpha's and beta's admission windows (≤ 10:15)
      in.addData((4L, "advance-1", 9L, ts("10:30:00")))
      q.processAllAvailable()
      assert(admitted().count() == 3)

      // batch 4 runs WITH watermark 10:20: the expired keys are evicted
      // from the state store — bounded state, the property under test
      in.addData((5L, "advance-2", 9L, ts("10:31:00")))
      q.processAllAvailable()
      assert(admitted().count() == 4)
      assert(stateRows(q) == 2,
        s"expected only the two advance-* keys retained, got ${stateRows(q)}")

      // batch 5: alpha again at 10:25 (> watermark 10:21, so not late;
      // > 10 min since its evicted sighting) — RE-ADMITTED
      in.addData((6L, "alpha", 5L, ts("10:25:00")))
      q.processAllAvailable()
      val alphas = admitted()
        .filter(col("fingerprint") === md5(lit("alpha")))
        .select("admitted_ts").collect().map(_.getLong(0)).sorted
      assert(alphas.length == 2, s"alpha must be admitted twice, got ${alphas.length}")
      assert(alphas(0) < alphas(1))
    } finally q.stop()
  }

  test("segment admission: watermarked twin evicts and re-admits per segment") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = DedupStream.admitSegmentsWatermarked(docs, segTokens = 3, delay = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("t_wm_segs").start()
    def segs() = spark.table("t_wm_segs")
    try {
      // doc of 6 tokens = 2 segments; second doc shares segment "d e f"
      in.addData((1L, "a b c d e f", ts("10:00:00")), (2L, "d e f g h i", ts("10:00:00")))
      q.processAllAvailable()
      assert(segs().count() == 3, "shared segment admitted once")

      // in-window duplicate of "a b c" — suppressed
      in.addData((3L, "a b c", ts("10:05:00")))
      q.processAllAvailable()
      assert(segs().count() == 3)

      // advance watermark past every admission window, evict, then re-admit
      in.addData((4L, "zz yy xx", ts("10:30:00")))
      q.processAllAvailable()
      in.addData((5L, "ww vv uu", ts("10:31:00")))
      q.processAllAvailable()
      assert(stateRows(q) == 2, s"expired segments must evict, got ${stateRows(q)}")
      in.addData((6L, "a b c", ts("10:25:00")))
      q.processAllAvailable()
      assert(segs().filter(col("seg") === "a b c").count() == 2,
        "evicted segment must re-admit")
    } finally q.stop()
  }

  test("RocksDB state store runs the watermarked operator end-to-end") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[(Long, String, Long, java.sql.Timestamp)]
      val docs = in.toDF().toDF("doc_id", "text", "n_chars", "ingest_ts")
      val q = DedupStream.dedupByFingerprintWatermarked(docs, "10 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName("t_wm_rocks").start()
      try {
        in.addData((1L, "alpha", 5L, ts("10:00:00")))
        q.processAllAvailable()
        in.addData((2L, "alpha", 5L, ts("10:05:00")), (3L, "beta", 4L, ts("10:06:00")))
        q.processAllAvailable()
        assert(spark.table("t_wm_rocks").count() == 2,
          "RocksDB-backed run must suppress the in-window duplicate")
        assert(stateRows(q) == 2)
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
