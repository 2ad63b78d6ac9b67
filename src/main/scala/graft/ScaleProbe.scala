package graft

import org.apache.spark.sql.SparkSession

/** Scale-knob probe: measures how the SRP-LSH bucket granularity
  * (`rowsPerBand` ⇒ 2^r buckets per band) must track corpus size.
  *
  * The correctness gates pin rowsPerBand=4 (16 buckets/band) — right for
  * the 2k-vector base corpus, quadratically wrong as density per bucket
  * grows: at 10× vectors the within-bucket candidate join is ~100× the
  * work. LSH theory says buckets-per-band should scale ~n/targetBucket;
  * this main runs the SAME operator at increasing r on the SAME corpus
  * and prints wall-clock + emitted pairs, demonstrating the knob a real
  * deployment tunes (and that recall holds: the verified pair set is
  * reported alongside).
  *
  *   sbt "runMain graft.ScaleProbe [dir] [threshold] [r ...]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale10x")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.45)
    val rs = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(4, 6, 8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    for (r <- rs) {
      val t0 = System.nanoTime()
      val pairs = graft.pipeline.Similarity
        .lshCosinePairs(emb, rowsPerBand = r, threshold = threshold).count()
      println(f"PROBE n=$n%d t=$threshold%.2f rowsPerBand=$r%d buckets/band=${1 << r}%d " +
        f"pairs=$pairs%d  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // the density-adaptive default (rowsPerBand = 0): report the sampled
    // pick and its end-to-end time on the same corpus, so the auto path
    // is measured against the manual sweep above
    val tPick = System.nanoTime()
    val (autoR, autoB) = graft.pipeline.Similarity.lshPickParams(emb, threshold)
    val pickSecs = (System.nanoTime() - tPick) / 1e9
    val t0 = System.nanoTime()
    val pairs = graft.pipeline.Similarity
      .lshCosinePairs(emb, bands = autoB, rowsPerBand = autoR,
        threshold = threshold).count()
    println(f"PROBE n=$n%d t=$threshold%.2f rowsPerBand=AUTO($autoR%d) " +
      f"bands=$autoB%d pick=$pickSecs%5.2f s pairs=$pairs%d  " +
      f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
    // SemDeDup centroid-count knob: the oracle-pinned k=16 vs the
    // corpus-tracking default (k ≈ n/128, join-path assignment past the
    // literal cap) — per-cluster pair cost is (n/k)², so the default must
    // hold wall-clock ~flat as n grows where pinned k grows it ~100× at 10×
    for (k <- Seq(16, graft.pipeline.Similarity.centroidsForCorpus(n))) {
      val t1 = System.nanoTime()
      val kept = graft.pipeline.Similarity
        .semanticDedup(emb, nCentroids = k).filter(org.apache.spark.sql.functions.col("keep")).count()
      println(f"PROBE semdedup n=$n%d k=$k%d kept=$kept%d  " +
        f"${(System.nanoTime() - t1) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
