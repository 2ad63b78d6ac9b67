package graft.functions

import graft.mql.SparkTestBase
import graft.pipeline.{Decontam, Dedup}
import org.apache.spark.sql.functions._

class BloomSketchSpec extends SparkTestBase {

  test("JVM-side hex60 matches the Column-side conv(md5) exactly") {
    import spark.implicits._
    val vals = Seq("a", "hello world", "0:x y z", "", "ünïcode", "7:tok")
    val colSide = vals.toDF("s").select(Dedup.hex60(col("s"))).collect().map(_.getLong(0))
    val jvmSide = vals.map(BloomSketch.hex60)
    assert(colSide.toSeq == jvmSide)
  }

  test("no false negatives; false-positive rate is bounded") {
    import spark.implicits._
    val bits = 1 << 16
    val members = (0 until 2000).map(i => s"member$i")
    val bitset = members.toDF("ng")
      .select(explode(array((0 until 4).map(j =>
        Dedup.hex60(concat(lit(s"$j:"), col("ng"))) % bits): _*)).as("pos"))
      .agg(BloomSketch.bitsetAgg(col("pos"), bits).as("bs"))
      .head().getSeq[Long](0).toArray
    assert(members.forall(BloomSketch.mightContain(bitset, _, bits, 4)))
    val fp = (0 until 5000).count(i =>
      BloomSketch.mightContain(bitset, s"absent$i", bits, 4))
    // 2000 members * 4 hashes in 2^16 bits: theoretical fp ~ 1.2%
    assert(fp < 250, s"false positives: $fp / 5000")
  }

  test("ngramOverlapBloom is row-identical to ngramOverlap") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") % 37 =!= 0)
    val eval = docs.filter(col("doc_id") % 37 === 0)
    val a = Decontam.ngramOverlap(train, eval)
    val b = Decontam.ngramOverlapBloom(train, eval)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(b.columns.toSeq == a.columns.toSeq)
  }
}
