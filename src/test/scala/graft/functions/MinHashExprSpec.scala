package graft.functions

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import MinHashExpr.minhash

class MinHashExprSpec extends SparkTestBase {

  /** the composable k-fold HOF the oracle replays */
  private def hofSig(k: Int) = expr(
    s"""transform(sequence(0, ${k - 1}), h ->
       |  array_min(transform(sh, x ->
       |    cast(conv(substr(md5(concat(cast(h as string), ':', x)), 1, 15), 16, 10) as bigint)
       |  )))""".stripMargin)

  test("bit-identical to the composable HOF on real shingle sets") {
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sh = graft.pipeline.Dedup.withShingles(docs)
      .select(col("doc_id"), col("shingles").as("sh")).limit(200)
    for (k <- Seq(1, 8, 13)) {
      val rows = sh.select(minhash(col("sh"), k).as("native"), hofSig(k).as("hof"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k"))
    }
  }

  test("edge cases: empty set, null shingles, unicode") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[String]()),
      (2L, Seq("a b c")),
      (3L, Seq("héllo wörld x", "a b c"))).toDF("doc_id", "sh")
    val rows = df.select(col("doc_id"), minhash(col("sh"), 4).as("native"),
      hofSig(4).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"id=${r.getLong(0)}")
    }
    // empty set => all-null signature elements, exactly like array_min
    assert(rows.find(_.getLong(0) == 1L).get.getSeq[Any](1).forall(_ == null))
    val withNull = spark.sql("SELECT array('a b c', cast(null as string)) AS sh")
      .select(minhash(col("sh"), 4).as("native"), hofSig(4).as("hof")).head()
    assert(withNull.getSeq[Long](0) == withNull.getSeq[Long](1))
  }

  test("SQL registration with literal k") {
    MinHashExpr.register(spark)
    val sig = spark.sql("SELECT graft_minhash(array('x'), 2) AS s").head().getSeq[Long](0)
    assert(sig.length == 2 && sig.forall(v => v >= 0L && v < (1L << 60)))
  }
}
