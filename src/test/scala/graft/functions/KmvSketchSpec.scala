package graft.functions

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkTestBase {

  private def mins(values: Seq[Long], k: Int, parts: Int = 5): Seq[Long] = {
    import spark.implicits._
    values.toDF("h").repartition(parts)
      .agg(KmvSketch.kMinValues(col("h"), k).as("m"))
      .head().getSeq[Long](0)
  }

  test("buffer holds the k smallest distinct values, sorted") {
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L, 8L, 2L)
    assert(mins(vals, 4) == Seq(1L, 2L, 3L, 5L))
    // fewer distinct than k: the buffer IS the distinct set
    assert(mins(Seq(4L, 4L, 2L), 16) == Seq(2L, 4L))
  }

  test("result is partitioning-independent (bounded merges commute)") {
    val rnd = new scala.util.Random(3L)
    val vals = Seq.fill(5000)(rnd.nextLong().abs % 100000)
    val a = mins(vals, 16, parts = 1)
    val b = mins(vals, 16, parts = 37)
    assert(a == b && a.length == 16 && a == a.sorted && a.distinct == a)
  }

  test("estimator lands near the true cardinality on uniform hashes") {
    import spark.implicits._
    // hex60-style hashes of 10k distinct strings; KMV with k=64
    val k = 64
    val df = (0 until 10000).map(i => s"tok$i").toDF("w")
      .select(graft.pipeline.Dedup.hex60(col("w")).as("h"))
    val m = df.agg(KmvSketch.kMinValues(col("h"), k).as("m")).head().getSeq[Long](0)
    val est = (k - 1).toDouble * (1L << 60).toDouble / m.last
    assert(math.abs(est - 10000) / 10000 < 0.30, s"est=$est")
  }
}
