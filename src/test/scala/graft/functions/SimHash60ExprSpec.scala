package graft.functions

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import SimHash60Expr.simhash60

class SimHash60ExprSpec extends SparkTestBase {

  /** the composable-HOF reference formulation the oracle mirrors: 60
    * interpreted folds of ±1 over the per-token 60-bit md5 hashes */
  private val hofSimhash =
    """aggregate(transform(sequence(0, 59), j ->
      |  CASE WHEN aggregate(transform(
      |         transform(toks, w -> cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint)),
      |         h -> CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END),
      |       0, (a, x) -> a + x) > 0
      |  THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END),
      |cast(0 as bigint), (a, x) -> a + x)""".stripMargin

  test("bit-identical to the composable 60-fold HOF on real documents") {
    val docs = graft.catalog.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200)
    val rows = docs
      .withColumn("toks", split(lower(col("text")), " "))
      .select(simhash60(col("toks")).as("native"), expr(hofSimhash).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("edge cases: empty array, empty-string token, unicode, null token") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[String]()),
      (2L, Seq("")),
      (3L, Seq("héllo", "wörld", "héllo")),
      (4L, Seq("a")),
      (5L, Seq("a", "b", "a"))).toDF("id", "toks")
    val rows = df.select(col("id"), simhash60(col("toks")).as("native"),
      expr(hofSimhash).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}")
    }
    // empty array => no token outvotes: signature 0
    assert(rows.find(_.getLong(0) == 1L).get.getLong(1) == 0L)
    // null tokens contribute -1 to every counter (CASE ELSE arm parity)
    val withNull = spark.sql(
      "SELECT array('x', cast(null as string), 'x', 'x') AS toks")
      .select(simhash60(col("toks")).as("native"), expr(hofSimhash).as("hof"))
      .head()
    assert(withNull.getLong(0) == withNull.getLong(1))
  }

  test("result fits in 60 bits and SQL registration works") {
    SimHash60Expr.register(spark)
    val sig = spark.sql(
      "SELECT graft_simhash60(split('the quick brown fox', ' ')) AS s")
      .head().getLong(0)
    assert(sig >= 0L && sig < (1L << 60))
  }
}
