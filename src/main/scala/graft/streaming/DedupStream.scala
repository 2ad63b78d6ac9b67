package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Streaming ingest-time exact deduplication — the training-pipeline shape
  * where crawl shards land continuously and a document is admitted only if
  * its content fingerprint was never seen before (NEW scope beyond the
  * reference, SURVEY.md §2.10).
  *
  * `dropDuplicates` on the fingerprint keeps the dedup index in the
  * streaming state store (one small entry per distinct fingerprint —
  * RocksDB-backed and key-partitioned on a cluster, so state scales
  * horizontally with shuffle partitions). Its state grows with the
  * distinct-key count forever; the PRODUCTION variant for always-on
  * ingest is [[dedupByFingerprintWatermarked]] /
  * [[admitSegmentsWatermarked]] — `dropDuplicatesWithinWatermark` over an
  * ingest-time column, whose state is EVICTED once the watermark passes a
  * key's admission window (bounded state at any corpus size, with the
  * documented semantics delta that a duplicate arriving after eviction is
  * re-admitted). Eviction, re-admission, and the RocksDB provider are
  * pinned by `WatermarkDedupSpec`; the windowed semantics are
  * oracle-gated by `stream_dedup_watermark`.
  * The unwatermarked gate stages the SAME document file twice as two
  * micro-batches: the second batch is entirely suppressed by state from
  * the first, proving cross-batch suppression rather than batch-local
  * distinct.
  *
  * The output projects only (fingerprint, n_chars) — identical across
  * copies of a document — so the surviving row set is deterministic no
  * matter which physical copy wins the state race.
  */
object DedupStream {

  private[streaming] val docSchema = StructType(Seq(
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
    graft.TempDirs.register(d)
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

  // ---- watermarked admission (bounded state for always-on ingest) ----

  private[streaming] val docTsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("n_chars", LongType),
    StructField("ingest_ts", TimestampType)))

  /** Watermarked exact admission — the always-on-ingest posture: a
    * fingerprint's state lives only while the watermark is inside its
    * admission window (`ingest_ts + delay`), so the state store is
    * bounded by the distinct-key ARRIVAL RATE × delay, not by corpus
    * lifetime. Semantics delta vs [[dedupByFingerprint]]: a duplicate
    * arriving more than `delay` after the last retained sighting finds no
    * state and is RE-ADMITTED — the contract is "no duplicates within
    * `delay` of each other", which is what a crawl pipeline actually
    * needs (exact-forever dedup belongs to the batch operator over the
    * landed corpus). Input rows older than the watermark are dropped as
    * late data, as in any watermarked operator. */
  def dedupByFingerprintWatermarked(docs: DataFrame,
      delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark("ingest_ts", delay)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select(col("fingerprint"), col("n_chars"),
        unix_timestamp(col("ingest_ts")).as("admitted_ts"))

  /** Watermarked SEGMENT admission — the ingest-time twin of
    * [[graft.pipeline.Dedup.dedupSegments]] with bounded state: segment
    * keys age out `delay` past their admission. Same re-admission
    * semantics as [[dedupByFingerprintWatermarked]]. */
  def admitSegmentsWatermarked(stream: DataFrame, segTokens: Int = 10,
      delay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__t", split(lower(col("text")), " "))
      .select(explode(expr(graft.pipeline.Dedup.segListExpr(segTokens))).as("seg"),
        col("ingest_ts"))
      .withWatermark("ingest_ts", delay)
      .dropDuplicatesWithinWatermark("seg")
      .select(col("seg"),
        size(split(col("seg"), " ")).cast("long").as("n_tokens"),
        unix_timestamp(col("ingest_ts")).as("admitted_ts"))

  /** Stage DataFrames as one parquet file per micro-batch, ordered by
    * index (names AND modification times both ascend, so the file source
    * triggers them in exactly this order). */
  private[streaming] def stageOrderedBatches(spark: SparkSession,
      batches: Seq[(String, DataFrame)]): String = {
    import java.nio.file.{Files, StandardCopyOption}
    val d = Files.createTempDirectory("graft-stream-batches-")
    graft.TempDirs.register(d)
    for (((tag, df), i) <- batches.zipWithIndex) {
      val sub = d.resolve(s"__stage_$tag")
      df.coalesce(1).write.parquet(sub.toString)
      val ls = Files.list(sub)
      val part = try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally ls.close()
      val dst = d.resolve(s"${i}_$tag.parquet")
      Files.move(part, dst, StandardCopyOption.ATOMIC_MOVE)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000L * 60 * i))
      val walk = Files.walk(sub)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.delete(p); () })
      finally walk.close()
    }
    d.toString
  }

  /** Oracle-gate runner for the watermarked exact admission: three staged
    * micro-batches with arithmetic ingest times —
    *
    *  1. every document at 10:00 (all admitted; watermark → 09:50)
    *  2. doc_id % 3 == 0 duplicates at 10:05 (suppressed — state alive)
    *     plus one sentinel at 10:30 (admitted; watermark → 10:20, which
    *     passes every 10:0x admission window)
    *  3. a second sentinel at 10:31 (admitted) — state cleanup runs at
    *     batch END, so this filler batch is where the expired index is
    *     actually EVICTED (pinned empirically; `WatermarkDedupSpec`
    *     observes the same one-batch lag in numRowsTotal)
    *  4. doc_id % 5 == 0 duplicates at 10:25 (RE-ADMITTED — state gone;
    *     not late: 10:25 > the 10:21 watermark)
    *
    * Every step is doc_id/timestamp arithmetic, so DuckDB recomputes the
    * full admitted set — the windowed semantics as one hash-checked gate. */
  def runWatermarkedToBatch(spark: SparkSession, docFile: String,
      name: String, delay: String = "10 minutes"): DataFrame = {
    val docs = spark.read.parquet(docFile)
    def at(t: String) = to_timestamp(lit(s"2026-01-01 $t"), "yyyy-MM-dd HH:mm:ss")
    val base = docs.select(col("doc_id"), col("text"), col("n_chars"))
    def sentinel(text: String, t: String) = spark.range(1).select(
      lit(-1L).as("doc_id"), lit(text).as("text"),
      lit(text.length.toLong).as("n_chars"), at(t).as("ingest_ts"))
    val dir = stageOrderedBatches(spark, Seq(
      "all" -> base.withColumn("ingest_ts", at("10:00:00")),
      "dup3" -> base.filter(col("doc_id") % 3 === 0)
        .withColumn("ingest_ts", at("10:05:00"))
        .unionByName(sentinel("watermark-advancer", "10:30:00")),
      "adv2" -> sentinel("watermark-advancer-2", "10:31:00"),
      "dup5" -> base.filter(col("doc_id") % 5 === 0)
        .withColumn("ingest_ts", at("10:25:00"))))
    val stream = spark.readStream
      .schema(docTsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = dedupByFingerprintWatermarked(stream, delay)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

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

  // ---- streaming MinHash-LSH near-duplicate detection ----

  final case class BandedDoc(bkey: String, doc_id: Long)

  /** per-bucket membership cap (var so specs can shrink it): a bucket
    * indexes at most this many members — beyond it, arrivals still emit
    * candidates against the retained index but are not added */
  private[streaming] var MaxBucketMembers = 256

  /** The per-bucket state transition (factored out so the timeout path is
    * unit-testable with `TestGroupState` — a wall clock can't drive
    * eviction deterministically in a spec). Each fresh arrival pairs with
    * every RETAINED member: previous batches' state plus earlier admitted
    * arrivals of this batch; membership is Set-backed and capped, so a
    * bucket with n arrivals does O(n·cap) work, never O(n²). On timeout
    * the bucket's index is dropped wholesale. */
  private[streaming] def bucketUpdate(bucketTtlMs: Option[Long])(
      key: String, rows: Iterator[BandedDoc],
      state: org.apache.spark.sql.streaming.GroupState[Array[Long]]): Iterator[(Long, Long)] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val retained = scala.collection.mutable.ArrayBuffer.empty[Long]
      state.getOption.foreach(retained ++= _)
      val member = scala.collection.mutable.HashSet.empty[Long]
      member ++= retained
      // sorted for deterministic pair emission within a batch
      val fresh = rows.map(_.doc_id).toSeq.distinct.sorted
        .filterNot(member)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (d <- fresh) {
        retained.foreach(e => out += ((math.min(d, e), math.max(d, e))))
        if (retained.length < MaxBucketMembers) {
          retained += d; member += d
        }
      }
      state.update(retained.toArray)
      bucketTtlMs.foreach(state.setTimeoutDuration)
      out.iterator
    }

  /** stage a table as two micro-batches split by `keyCol` parity, so
    * cross-half results can only be found by state that survives across
    * batches (generic over the id column: documents use doc_id,
    * embeddings vec_id) */
  private[streaming] def stageParitySplit(spark: SparkSession, file: String,
      keyCol: String = "doc_id"): String = {
    import java.nio.file.{Files, StandardCopyOption}
    val d = Files.createTempDirectory("graft-stream-split-")
    graft.TempDirs.register(d)
    val rows = spark.read.parquet(file)
    for ((par, tag) <- Seq(0 -> "even", 1 -> "odd")) {
      val sub = d.resolve(s"__stage_$tag")
      rows.filter(col(keyCol) % 2 === par).coalesce(1)
        .write.parquet(sub.toString)
      val ls = Files.list(sub)
      val part = try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally ls.close()
      Files.move(part, d.resolve(s"${par}_$tag.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      // drop the staging droppings so the file source sees only the data
      val walk = Files.walk(sub)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.delete(p); () })
      finally walk.close()
    }
    d.toString
  }

  /** Streaming MinHash-LSH near-duplicate pairs — the incremental twin of
    * `Dedup.minhashPairs`: as document shards land, each doc's banded
    * signature keys are computed statelessly, and per-bucket keyed state
    * (`flatMapGroupsWithState`) remembers which docs were ever seen in the
    * bucket, emitting candidate pairs between each arrival and ALL
    * earlier members — across micro-batches. Candidates are then verified
    * with exact shingle Jaccard via a stream-static join against the
    * corpus shingle table (stateless, so it composes with the stateful
    * bucket operator).
    *
    * State is one (bucket → member ids) entry per occupied bucket — the
    * same index MinHash-LSH builds anyway — and is BOUNDED on two axes:
    * membership is capped at [[MaxBucketMembers]] (a hot band key — an
    * ultra-common shingle pattern — stops indexing once full; arrivals
    * still pair against the retained members, so per-arrival work stays
    * O(cap) and a bucket with n arrivals emits O(n·cap) candidates, never
    * O(n²)), and — when `bucketTtlMs` is set — idle buckets age out of the
    * state store. Membership tests are Set-backed. A pair colliding in
    * several bands is emitted per band; the collector dedups (same row
    * either way).
    *
    * The TTL is OPT-IN because it binds the query to a processing-time
    * timeout, which tells the engine more batches may always be needed
    * (`shouldRunAnotherBatch` is unconditionally true for
    * ProcessingTimeTimeout) — under `Trigger.AvailableNow` such a query
    * never terminates, spinning no-data batches until the farthest
    * timeout. Always-on ingest (a real deployment) sets it; bounded
    * backfill runs leave it off.
    */
  def nearDupPairs(spark: SparkSession, stream: DataFrame, docFile: String,
      numHashes: Int = 8, bands: Int = 4, threshold: Double = 0.5,
      bucketTtlMs: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val r = numHashes / bands
    val banded = stream
      .withColumn("__t", split(lower(col("text")), " "))
      .filter(size(col("__t")) >= 3)
      .withColumn("shingles", expr(graft.pipeline.Dedup.shingleExpr))
      .withColumn("sig",
        graft.functions.MinHashExpr.minhash(col("shingles"), numHashes))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, ${bands - 1}), b ->
           |  concat_ws(',', cast(b as string),
           |    transform(slice(sig, b * $r + 1, $r), v -> cast(v as string))))"""
          .stripMargin)).as("bkey"))
      .select(col("bkey"), col("doc_id")).as[BandedDoc]

    val timeoutConf =
      if (bucketTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val candidates = banded
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append(), timeoutConf)(bucketUpdate(bucketTtlMs))
      .toDF("doc_a", "doc_b")

    // exact-Jaccard verification against the (batch) corpus shingles —
    // stream-static equi-joins are stateless
    val sh = graft.pipeline.Dedup.withShingles(spark.read.parquet(docFile))
      .select(col("doc_id"), col("shingles"))
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
  }

  /** run the incremental near-dup query over the parity-split corpus and
    * return the pair set (cross-band repeats collapse to one row).
    *
    * Streaming state-store count is pinned by the shuffle-partition conf at
    * checkpoint creation; per-micro-batch cost scales with it regardless of
    * data volume, so we scope it down for this bounded local run (a real
    * cluster sizes it to executor count once, at deploy time). */
  /** Streaming ingest-time SEGMENT admission — the state side of
    * [[graft.pipeline.Dedup.dedupSegments]] at ingest: arriving documents
    * split into non-overlapping `segTokens`-token segments; a segment is
    * ADMITTED (emitted) only the first time its content is ever seen,
    * ACROSS micro-batches. The output projects only the segment content
    * (plus its token count), so the admitted SET is deterministic no
    * matter which arriving instance wins the state race — the same
    * determinism posture as [[dedupByFingerprint]]. Document reassembly
    * from admitted segments is the batch operator's job downstream; the
    * stream maintains the dedup INDEX (state keyed by segment —
    * RocksDB-backed and shuffle-partitioned on a cluster).
    *
    * The gate stages the corpus as parity halves WITH the planted
    * boilerplate header on every 4th doc: the header lives in BOTH
    * halves, so its single admission proves cross-batch suppression, not
    * batch-local distinct. */
  def runSegmentsToBatch(spark: SparkSession, docFile: String, name: String,
      segTokens: Int = 10): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val d = Files.createTempDirectory("graft-stream-segs-")
    graft.TempDirs.register(d)
    val planted = spark.read.parquet(docFile).withColumn("text",
      when(col("doc_id") % 4 === 0,
        concat(lit("shared header banner intro card segment alpha beta gamma delta "),
          col("text"))).otherwise(col("text")))
    for ((par, tag) <- Seq(0 -> "even", 1 -> "odd")) {
      val sub = d.resolve(s"__stage_$tag")
      planted.filter(col("doc_id") % 2 === par).coalesce(1)
        .write.parquet(sub.toString)
      val ls = Files.list(sub)
      val part = try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally ls.close()
      Files.move(part, d.resolve(s"${par}_$tag.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      val walk = Files.walk(sub)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.delete(p); () })
      finally walk.close()
    }
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString)
    val admitted = stream
      .withColumn("__t", split(lower(col("text")), " "))
      .select(explode(expr(graft.pipeline.Dedup.segListExpr(segTokens))).as("seg"))
      .dropDuplicates("seg")
      .select(col("seg"),
        size(split(col("seg"), " ")).cast("long").as("n_tokens"))
    val q = admitted.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  def runNearDupToBatch(spark: SparkSession, docFile: String, name: String): DataFrame = {
    val dir = stageParitySplit(spark, docFile)
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val partKey = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(partKey)
    spark.conf.set(partKey, "8")
    try {
      val q = nearDupPairs(spark, stream, docFile)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(partKey, saved)
    spark.table(name).distinct()
  }
}
