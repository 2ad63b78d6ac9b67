package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.KmvSketch
import graft.pipeline.{Dedup, Sketches}

/** Streaming KMV vocabulary tracking — a running distinct-token estimate
  * per source over a document stream.
  *
  * Why KMV is the right streaming sketch: the k smallest distinct hashes
  * are ORDER-INDEPENDENT, so the state after the last micro-batch equals
  * the batch computation over everything ever ingested — the gate shares
  * the batch operator's DuckDB oracle (minus the exact count, which
  * streaming cannot do without distinct-set-sized state; that asymmetry
  * is the sketch's whole value). State per source is the ≤ k-long KMV
  * buffer inside the streaming aggregation store — bounded forever, no
  * watermark needed, complete-mode output.
  */
object SketchStream {

  /** per-source running sketch columns over an arriving document stream */
  def vocabSketch(docs: DataFrame, k: Int = 16): DataFrame =
    docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("w"))
      .select(col("source"), Dedup.hex60(col("w")).as("h"))
      .groupBy("source")
      .agg(KmvSketch.kMinValues(col("h"), k).as("__mins"))
      .select(col("source"),
        size(col("__mins")).cast("long").as("k_used"),
        Sketches.kmvEstimate(col("__mins"), k).as("kmv_est"))

  /** Streaming count-min grid — running heavy-hitter counters over the
    * arriving token stream. The grid cells are plain integer sums, so
    * (like the KMV minima) the post-stream complete-mode state equals
    * the batch grid over everything ever ingested, with d×w counters of
    * state FOREVER — the streaming estimator for "how often has term X
    * appeared so far" that never holds vocabulary-sized state. */
  def countMinGrid(docs: DataFrame, d: Int = 4, w: Int = 1024): DataFrame =
    docs
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .select(explode(expr(
        s"transform(sequence(0, ${d - 1}), j -> named_struct('j', j, 'cell', ${cellSql(w)}))")).as("jc"))
      .select(col("jc.j").as("j"), col("jc.cell").as("cell"))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))

  private def cellSql(w: Int): String =
    s"cast(conv(substring(md5(concat(cast(j as string), ':', term)), 1, 15), 16, 10) as bigint) % $w"

  /** Stream the corpus as two micro-batches maintaining ONLY the grid,
    * then probe it (batch-side) for the corpus's true top-k terms: the
    * streamed estimates must equal the batch sketch's. */
  def runCountMinToBatch(spark: SparkSession, docFile: String, name: String,
      d: Int = 4, w: Int = 1024, k: Int = 20): DataFrame = {
    val dir = DedupStream.stageParitySplit(spark, docFile)
    val stream = spark.readStream
      .schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = countMinGrid(stream, d, w)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(s"${name}_grid")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val grid = spark.table(s"${name}_grid")
    // probe set = the static corpus's true top-k (the expensive exact
    // side lives OUTSIDE the stream; the stream held only the grid)
    val top = spark.read.parquet(docFile)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("term")).limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("true_cnt").desc, col("term"))).cast("long"))
    val probes = (0 until d).map(j =>
      top.select(col("term"), col("rk"), lit(j).as("j"),
        (Dedup.hex60(concat(lit(s"$j:"), col("term"))) % w).as("cell")))
      .reduce(_ unionByName _)
    probes.join(grid, Seq("j", "cell"))
      .groupBy("term").agg(min(col("cnt")).as("cm_est"), first(col("rk")).as("rk"))
      .select(col("term"), col("cm_est"), col("rk"))
  }

  /** corpus staged as two parity micro-batches; the final complete-mode
    * table must equal the batch sketch over the whole corpus */
  def runToBatch(spark: SparkSession, docFile: String, name: String): DataFrame = {
    val dir = DedupStream.stageParitySplit(spark, docFile)
    val stream = spark.readStream
      .schema(DedupStream.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = vocabSketch(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
