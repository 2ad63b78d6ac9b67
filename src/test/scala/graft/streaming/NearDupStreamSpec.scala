package graft.streaming

import graft.mql.SparkTestBase
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** The incremental LSH near-dup query must find exactly the batch
  * operator's pairs — including pairs whose members arrived in DIFFERENT
  * micro-batches (the parity split guarantees such pairs exist whenever
  * an even-id doc is a near-dup of an odd-id doc). */
class NearDupStreamSpec extends SparkTestBase {

  test("streamed near-dup pairs equal batch MinHash-LSH pairs") {
    val file = "/root/testdata/sf0.001/documents.parquet"
    val batch = Dedup.minhashPairs(spark.read.parquet(file),
      numHashes = 8, bands = 4).select("doc_a", "doc_b", "jac")
    val streamed = DedupStream.runNearDupToBatch(spark, file, "t_stream_neardup")

    assert(streamed.count() > 0, "expected planted near-dup pairs")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed pair set must equal the batch pair set")

    val crossParity = streamed
      .filter(col("doc_a") % 2 =!= col("doc_b") % 2).count()
    assert(crossParity > 0,
      "expected at least one pair spanning the two micro-batches")
  }

  test("hot bucket stays linear under the membership cap, cross-batch discovery survives") {
    import spark.implicits._
    // 40 IDENTICAL documents: every banded signature key collides, so all
    // docs land in the same buckets — the adversarial hot-band case. With
    // the cap at c, a bucket retains c members and each later arrival
    // emits at most c candidates: O(n·c) pairs, never O(n²).
    val n = 40
    val cap = 4
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val tmp = java.nio.file.Files.createTempDirectory("graft-hotbucket-")
    graft.TempDirs.register(tmp)
    val f = tmp.resolve("docs.parquet").toString
    (0 until n).map(i => (i.toLong, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(f)
    val saved = DedupStream.MaxBucketMembers
    try {
      DedupStream.MaxBucketMembers = cap
      val pairs = DedupStream.runNearDupToBatch(spark, f, "t_hot_bucket")
      val cnt = pairs.count()
      val quadratic = n.toLong * (n - 1) / 2
      assert(cnt > 0 && cnt <= n.toLong * cap,
        s"expected at most ${n * cap} capped pairs, got $cnt (uncapped would be $quadratic)")
      // members admitted before the cap filled arrived in batch 1 (even
      // ids); batch-2 odd arrivals must still pair against that state
      assert(pairs.filter(col("doc_a") % 2 =!= col("doc_b") % 2).count() > 0,
        "capped state must still discover pairs across micro-batches")
    } finally DedupStream.MaxBucketMembers = saved
  }

  test("TTL-on deployment: processing-time trigger, cross-batch discovery intact within the TTL window") {
    // the always-on configuration a real ingest runs: bucketTtlMs SET,
    // processing-time trigger (AvailableNow would never terminate with a
    // processing-time timeout — see nearDupPairs' scaladoc). Both parity
    // micro-batches land well inside the 10-minute TTL, so eviction must
    // not fire and the pair set must equal the batch operator's —
    // including the cross-batch pairs that only state can find.
    import org.apache.spark.sql.streaming.Trigger
    val file = "/root/testdata/sf0.001/documents.parquet"
    val batch = Dedup.minhashPairs(spark.read.parquet(file),
      numHashes = 8, bands = 4).select("doc_a", "doc_b", "jac")
    val expected = batch.count()
    val dir = DedupStream.stageParitySplit(spark, file)
    val stream = spark.readStream.schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val partKey = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(partKey)
    spark.conf.set(partKey, "8")
    try {
      val q = DedupStream
        .nearDupPairs(spark, stream, file, bucketTtlMs = Some(600000L))
        .writeStream.outputMode("append").format("memory")
        .queryName("t_ttl_neardup")
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      // processAllAvailable() would never return here: a registered
      // processing-time timeout makes shouldRunAnotherBatch=true forever
      // (the same behavior that rules out AvailableNow — see
      // nearDupPairs' scaladoc), so poll the sink until the expected
      // pair count lands, then stop the always-on query
      try {
        val deadline = System.currentTimeMillis() + 120000L
        while (spark.table("t_ttl_neardup").distinct().count() < expected &&
          System.currentTimeMillis() < deadline) Thread.sleep(500L)
      } finally q.stop()
    } finally spark.conf.set(partKey, saved)
    val streamed = spark.table("t_ttl_neardup").distinct()
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "TTL-on streamed pair set must equal the batch pair set")
    assert(streamed.filter(col("doc_a") % 2 =!= col("doc_b") % 2).count() > 0,
      "cross-batch pairs must survive with TTL registered but unexpired")
  }

  test("opt-in bucket TTL: state transition registers timeouts and evicts on expiry") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def docs(ids: Long*) = ids.iterator.map(DedupStream.BandedDoc("bk", _))

    // batch 1: doc 0 arrives, TTL registered against the batch clock
    val s1 = TestGroupState.create[Array[Long]](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty(), false)
    val out1 = DedupStream.bucketUpdate(Some(400L))("bk", docs(0L), s1).toSeq
    assert(out1.isEmpty && s1.get.toSeq == Seq(0L))
    assert(s1.getTimeoutTimestampMs.get() == 1400L)

    // the TTL lapses: the timeout invocation drops the bucket wholesale
    val s2 = TestGroupState.create[Array[Long]](Optional.of(Array(0L)),
      GroupStateTimeout.ProcessingTimeTimeout, 2000L, Optional.empty(), true)
    assert(DedupStream.bucketUpdate(Some(400L))("bk", Iterator.empty, s2).isEmpty)
    assert(s2.isRemoved, "timed-out bucket state must be removed")

    // doc 1 then arrives into an EMPTY bucket: no stale pair with doc 0
    val s3 = TestGroupState.create[Array[Long]](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 3000L, Optional.empty(), false)
    val out3 = DedupStream.bucketUpdate(Some(400L))("bk", docs(1L), s3).toSeq
    assert(out3.isEmpty && s3.get.toSeq == Seq(1L))

    // ... whereas WITHOUT the lapse the cross-batch pair is found (the
    // existing state pairs with the arrival)
    val s4 = TestGroupState.create[Array[Long]](Optional.of(Array(0L)),
      GroupStateTimeout.ProcessingTimeTimeout, 1200L, Optional.empty(), false)
    val out4 = DedupStream.bucketUpdate(Some(400L))("bk", docs(1L), s4).toSeq
    assert(out4 == Seq((0L, 1L)))
  }
}
