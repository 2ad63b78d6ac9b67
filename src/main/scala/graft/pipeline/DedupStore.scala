package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Lifecycle maintenance for the persisted incremental-dedup store (the
  * corpus + signature-index dirs [[graft.streaming.IncrementalDedupStream]]
  * appends one `batch=<bid>` partition to per micro-batch): without it the
  * store accumulates one partition per batch FOREVER — at one batch per
  * 5 minutes that is ~100k partitions/year, and every probe's planning
  * pays the O(partitions) listing.
  *
  * CONCURRENCY POSTURE — SINGLE WRITER, OFFLINE MAINTENANCE. The store
  * dirs are bare parquet with partition-overwrite appends: exactly ONE
  * ingest stream may own a store (two concurrent streams would race the
  * same batch-id partition space and the probe reads), and [[compact]]
  * requires an exclusive window (stop the ingest stream first — the swap
  * is a rename pair, and a concurrent batch write landing between the
  * read and the swap would be silently dropped). This is the standard
  * posture
  * of a streaming sink table; a store needing multi-writer appends should
  * route them through the catalog's [[graft.metacat.OccLog]] instead.
  *
  * [[compact]] folds every batch partition into the single reserved
  * partition `batch = -1` (a bid real micro-batches never produce, so a
  * post-compaction REDELIVERY of the last pre-compaction batch still
  * converges: its docs are already in the compacted partition, the
  * redelivered batch anti-joins them away and overwrites its own
  * partition with nothing). The rewrite is identity-checked before the
  * swap — row count and an order-free content hash of the re-read tmp
  * table must equal the source's, the same refuse-to-swap-a-wrong-fold
  * posture as the catalog's `compactFilesLog` — so a compacted store
  * serves byte-identical probes.
  *
  * [[fsck]] audits the corpus↔index invariants (the store's analog of
  * [[graft.metacat.Fsck]]): unique corpus doc_ids, exactly `bands` index
  * rows per corpus doc, no orphan index rows, unique (doc_id, band), and
  * — the full-strength check — the stored index must EQUAL the index
  * recomputed from the corpus text (O(corpus) shingling; fsck is an
  * audit, not a hot path). */
object DedupStore {

  /** reserved partition id compaction folds into — below every real
    * micro-batch id, so `batch <> bid` probe reads always include it */
  val CompactedBatch: Long = -1L

  /** Fold all batch partitions of both store tables into `batch = -1`.
    * Requires the exclusive window documented above. No-op on an absent
    * table (bootstrap store). */
  def compact(spark: SparkSession, corpusDir: String, indexDir: String): Unit = {
    compactTable(spark, corpusDir, Seq("doc_id", "text"))
    compactTable(spark, indexDir, Seq("doc_id", "band", "bkey"))
  }

  /** order-free identity of a table's content (excluding the fold-mutated
    * `batch` column): row count + bit_xor of a per-row 64-bit hash */
  private def contentId(df: DataFrame, hashCols: Seq[String]): (Long, Long) = {
    val r = df.agg(count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(xxhash64(${hashCols.mkString(", ")}))"), lit(0L))
        .as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def compactTable(spark: SparkSession, dir: String,
      hashCols: Seq[String]): Unit = {
    val dst = new Path(dir)
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dst)) return
    val before = spark.read.parquet(dir)
    val idBefore = contentId(before, hashCols)
    val tmp = new Path(dir + "__tmp")
    val old = new Path(dir + "__old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)
    before.drop("batch").withColumn("batch", lit(CompactedBatch))
      .repartition(1) // fold the small files too, not just the partitions
      .write.mode(SaveMode.Overwrite).partitionBy("batch")
      .parquet(tmp.toString)
    // identity check BEFORE the swap: a wrong fold must refuse to replace
    // the store, leaving the original intact
    val idAfter = contentId(spark.read.parquet(tmp.toString), hashCols)
    if (idAfter != idBefore) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"dedup-store compaction identity check failed for $dir: " +
          s"(rows, hash) $idBefore -> $idAfter; store left untouched")
    }
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"cannot stage $dst")
    if (!fs.rename(tmp, dst)) {
      fs.rename(old, dst) // restore; swap failed
      throw new java.io.IOException(s"cannot swap $tmp into $dst")
    }
    fs.delete(old, true)
    // the swap happened behind Spark's back (FS renames, not a writer):
    // drop the session's cached file listing for the path or the next
    // read resolves to the deleted pre-compaction part files
    spark.catalog.refreshByPath(dir)
    ()
  }

  /** Audit the corpus↔index invariants; one row per check
    * (`check`, `violations`, `ok`). All-green is the store's healthy
    * state; any violation means the store was written outside the
    * single-writer contract or a partial batch landed. */
  def fsck(spark: SparkSession, corpusDir: String, indexDir: String,
      numHashes: Int = 8, bands: Int = 4): DataFrame =
    fsckFrames(spark, spark.read.parquet(corpusDir).drop("batch"),
      spark.read.parquet(indexDir).drop("batch"), numHashes, bands)

  /** [[fsck]] over already-derived frames — shared with the OCC-governed
    * store ([[graft.metacat.DedupLog.fsck]]), whose corpus/index are two
    * projections of one log rather than two parquet dirs. */
  def fsckFrames(spark: SparkSession, corpusFrame: DataFrame,
      indexFrame: DataFrame, numHashes: Int = 8,
      bands: Int = 4): DataFrame = {
    import spark.implicits._
    val corpus = corpusFrame
    val idx = indexFrame
      .select(col("doc_id"), col("band").cast("int").as("band"), col("bkey"))
    val corpusIds = corpus.select("doc_id").persist()
    val nCorpus = corpusIds.count()
    val corpusDup = nCorpus - corpusIds.distinct().count()
    // exactly `bands` index rows per corpus doc (a doc with zero rows is
    // invisible to every future probe; more than `bands` double-counts)
    val perDoc = idx.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val cardinality = corpusIds.distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .filter(coalesce(col("n"), lit(0L)) =!= bands).count()
    // index rows for docs the corpus does not hold (phantom candidates)
    val orphans = idx.select("doc_id").distinct()
      .join(corpusIds.distinct(), Seq("doc_id"), "left_anti").count()
    val bandDup = idx.count() - idx.select("doc_id", "band").distinct().count()
    // full-strength: stored index == index recomputed from corpus text
    val recomputed = Dedup.signatureIndex(corpus, numHashes, bands)
      .select(col("doc_id"), col("band").cast("int").as("band"), col("bkey"))
    val sigDiff = recomputed.exceptAll(idx).count() + idx.exceptAll(recomputed).count()
    corpusIds.unpersist()
    Seq(
      ("corpus_doc_unique", corpusDup),
      ("index_cardinality", cardinality),
      ("index_orphans", orphans),
      ("index_band_unique", bandDup),
      ("index_signature_match", sigDiff)
    ).toDF("check", "violations").withColumn("ok", col("violations") === 0L)
  }
}
