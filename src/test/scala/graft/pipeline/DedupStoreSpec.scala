package graft.pipeline

import graft.mql.SparkTestBase
import graft.streaming.IncrementalDedupStream
import org.apache.spark.sql.functions._

/** [[DedupStore]] lifecycle: compaction folds the partition-per-batch
  * store into `batch=-1` WITHOUT changing what any probe sees (the
  * byte-identical-probes contract), refuses to swap a wrong fold, and
  * fsck actually DETECTS each invariant violation — an audit that can't
  * flag a broken store is theater. */
class DedupStoreSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private val b0 = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta",
    2L -> "one two three four five six seven eight nine",
    3L -> "red orange yellow green blue indigo violet colors")
  private val b1 = Seq(
    10L -> "alpha beta gamma delta epsilon zeta eta iota", // near-dup of 1
    11L -> "completely different words about storage engines here")

  private def freshStore(): (String, String) = {
    val out = java.nio.file.Files.createTempDirectory("graft-dstore-")
    graft.TempDirs.register(out)
    val (c, i) = (s"$out/corpus", s"$out/index")
    IncrementalDedupStream.ingestBatch(spark, docs(b0: _*), 0L, c, i)
    IncrementalDedupStream.ingestBatch(spark, docs(b1: _*), 1L, c, i)
    (c, i)
  }

  test("compact folds to one batch=-1 partition; probes and fsck unchanged") {
    val (c, i) = freshStore()
    val corpusBefore = spark.read.parquet(c).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val idxBefore = spark.read.parquet(i).select("doc_id", "band", "bkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    DedupStore.compact(spark, c, i)
    assert(spark.read.parquet(c).select("batch").distinct()
      .collect().map(_.get(0).toString).toSeq == Seq("-1"))
    // byte-identical probe service: same corpus rows, same index rows
    assert(spark.read.parquet(c).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == corpusBefore)
    assert(spark.read.parquet(i).select("doc_id", "band", "bkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet == idxBefore)
    assert(DedupStore.fsck(spark, c, i).filter(!col("ok")).count() == 0)
    // a day-3 batch against the compacted store still probes correctly:
    // a near-dup of compacted doc 2 is rejected, a fresh doc admitted
    IncrementalDedupStream.ingestBatch(spark, docs(
      20L -> "one two three four five six seven eight zero",
      21L -> "fully novel content nothing shares these tokens at all"), 2L, c, i)
    val admitted = spark.read.parquet(c).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 2L, 3L, 11L, 21L), s"got $admitted")
    // idempotent: re-compacting the compacted store is a no-op fold
    DedupStore.compact(spark, c, i)
    assert(spark.read.parquet(c).select("doc_id")
      .collect().map(_.getLong(0)).toSet == admitted)
    assert(DedupStore.fsck(spark, c, i).filter(!col("ok")).count() == 0)
  }

  test("post-compaction redelivery of the folded last batch converges") {
    val (c, i) = freshStore()
    DedupStore.compact(spark, c, i)
    // the stream resumes from a checkpoint that never committed batch 1:
    // its docs are already inside batch=-1, so the redelivery must add
    // nothing and must not un-admit anything
    IncrementalDedupStream.ingestBatch(spark, docs(b1: _*), 1L, c, i)
    val admitted = spark.read.parquet(c).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 2L, 3L, 11L), s"got $admitted")
    assert(DedupStore.fsck(spark, c, i).filter(!col("ok")).count() == 0)
  }

  test("fsck detects each invariant violation") {
    import spark.implicits._
    val (c, i) = freshStore()
    def bad(): Set[String] = DedupStore.fsck(spark, c, i)
      .filter(!col("ok")).select("check").collect().map(_.getString(0)).toSet
    assert(bad().isEmpty)
    // 1. orphan index rows: a doc the corpus never admitted
    Seq((99L, 0, "x,y")).toDF("doc_id", "band", "bkey")
      .withColumn("batch", lit(7L)).write.mode("append")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(i)
    val afterOrphan = bad()
    assert(afterOrphan.contains("index_orphans"), s"got $afterOrphan")
    assert(afterOrphan.contains("index_signature_match"))
    // heal by compaction? no — compaction preserves content; fsck must
    // still flag it afterwards (maintenance never masks corruption)
    DedupStore.compact(spark, c, i)
    assert(bad().contains("index_orphans"))
    // 2. under-indexed corpus doc: admitted text with no index rows
    val (c2, i2) = freshStore()
    Seq((50L, "some entirely new admitted doc text without index rows"))
      .toDF("doc_id", "text").withColumn("batch", lit(7L))
      .write.mode("append").partitionBy("batch").parquet(c2)
    val bad2 = DedupStore.fsck(spark, c2, i2).filter(!col("ok"))
      .select("check").collect().map(_.getString(0)).toSet
    assert(bad2.contains("index_cardinality"), s"got $bad2")
    // 3. duplicate corpus doc_id (a non-idempotent writer)
    val (c3, i3) = freshStore()
    spark.read.parquet(c3).filter(col("doc_id") === 1L).drop("batch")
      .withColumn("batch", lit(8L))
      .write.mode("append").partitionBy("batch").parquet(c3)
    val bad3 = DedupStore.fsck(spark, c3, i3).filter(!col("ok"))
      .select("check").collect().map(_.getString(0)).toSet
    assert(bad3.contains("corpus_doc_unique"), s"got $bad3")
    // 4. corrupted signature content: right cardinality, wrong bkey
    val (c4, i4) = freshStore()
    val idx4 = spark.read.parquet(i4)
    idx4.filter(col("doc_id") =!= 1L).drop("batch")
      .unionByName(idx4.filter(col("doc_id") === 1L).drop("batch")
        .withColumn("bkey", lit("corrupted")))
      .withColumn("batch", lit(DedupStore.CompactedBatch))
      .write.mode("overwrite").partitionBy("batch").parquet(s"${i4}__rw")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(i4))
    new java.io.File(s"${i4}__rw").renameTo(new java.io.File(i4))
    val bad4 = DedupStore.fsck(spark, c4, i4).filter(!col("ok"))
      .select("check").collect().map(_.getString(0)).toSet
    assert(bad4 == Set("index_signature_match"), s"got $bad4")
  }
}
