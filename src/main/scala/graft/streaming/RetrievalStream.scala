package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.pipeline.TextAnalysis

/** Streaming retrieval-index maintenance: the search-engine posture where
  * the STREAM maintains the index state and queries run batch-side
  * against it.
  *
  * Two complete-mode aggregations over the arriving document stream hold
  * everything BM25 needs:
  *   1. the postings frame (doc_id, term, tc, dl) for the query-term
  *      vocabulary — whole documents arrive, so a doc's postings never
  *      change once emitted and the keyed aggregation is monotone across
  *      micro-batches; state is bounded by matching postings, never the
  *      corpus;
  *   2. the two corpus scalars (N, total tokens) — one global counter row.
  *
  * Post-stream, [[TextAnalysis.bm25Rank]] scores the streamed state with
  * the SAME arithmetic as the batch operator, so the result must equal
  * the batch [[TextAnalysis.bm25TopDocs]] over everything ever ingested —
  * which is exactly what the gate's shared DuckDB oracle asserts. The
  * asymmetry vs batch: df/idf are computed at QUERY time from the
  * maintained postings, so scores stay consistent as N grows — the
  * incremental-index property that makes this a maintainer rather than a
  * periodic rebuild.
  */
object RetrievalStream {

  /** stream the corpus as two parity micro-batches maintaining the
    * postings + scalar state, then rank batch-side from that state */
  def runToBatch(spark: SparkSession, docFile: String, name: String,
      k: Int = 10): DataFrame = {
    val dir = DedupStream.stageParitySplit(spark, docFile)
    def stream = spark.readStream
      .schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

    val postings = TextAnalysis.bm25Postings(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName(s"${name}_postings").trigger(Trigger.AvailableNow()).start()
    val scalars = stream
      .select(size(split(lower(col("text")), " ")).cast("long").as("__dl"))
      .agg(count(lit(1)).as("n"), sum("__dl").as("tot"))
      .writeStream.outputMode("complete").format("memory")
      .queryName(s"${name}_scalars").trigger(Trigger.AvailableNow()).start()
    postings.awaitTermination()
    scalars.awaitTermination()

    val st = spark.table(s"${name}_scalars").head()
    // localCheckpoint: bm25Rank self-joins the postings (df side); the
    // memory-sink MemoryPlan is not a MultiInstanceRelation so the
    // self-join can't dedup its attributes — a LogicalRDD can
    TextAnalysis.bm25Rank(spark.table(s"${name}_postings").localCheckpoint(),
      st.getLong(0), st.getLong(1), k)
  }
}
