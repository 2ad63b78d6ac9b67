package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the two directed-containment paths — exact
  * prefix-filtered ([[graft.pipeline.Dedup.containmentPairs]]) vs
  * LSH-Ensemble stratified
  * ([[graft.pipeline.Dedup.containmentPairsStratified]]) — on BOTH corpus
  * densities, because they have opposite failure modes:
  *
  *  - the driver's synthetic corpus has a ~25-word vocabulary, so shingles
  *    (and minhash minima) are shared corpus-wide: the exact path's rare
  *    shingles aren't rare but its df-ranked prefix still prunes, while
  *    the stratified path's buckets flood (density-bound candidates);
  *  - a realistic corpus has a wide vocabulary: minima are near-unique so
  *    stratified buckets hold ~one group, while the exact path must build
  *    and BROADCAST a distinct-shingle document-frequency table that
  *    grows with the corpus (its 100 TB ceiling).
  *
  * The wide-vocab variant is derived here by suffixing every token with
  * its doc-group id (doc_id/5) — within-group containment structure is
  * preserved exactly, cross-group vocabulary becomes disjoint.
  *
  *   sbt "runMain graft.ContainmentProbe [dir]"
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale10x")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val wide = docs.withColumn("text",
      array_join(transform(split(col("text"), " "),
        t => concat(t, lit("_"), (col("doc_id") / 5).cast("long"))), " "))
      .localCheckpoint()
    for ((label, d) <- Seq("dense" -> docs, "wide-vocab" -> wide)) {
      // warm the shared shingle cache once so neither path pays the
      // one-time extraction inside its measurement
      graft.pipeline.Dedup.withShingles(d).count()
      for ((name, f) <- Seq(
        "exact" -> (() => graft.pipeline.Dedup.containmentPairs(d).count()),
        "stratified" -> (() => graft.pipeline.Dedup.containmentPairsStratified(d).count()))) {
        f() // untimed warmup run per path
        val t0 = System.nanoTime()
        val n = f()
        println(f"PROBE containment corpus=$label%-10s path=$name%-10s " +
          f"pairs=$n%d  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
