package graft.functions

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._
import DotProductExpr.dotProduct

class DotProductExprSpec extends SparkTestBase {

  test("bit-identical to the composable aggregate(zip_with(...)) fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.5f, -2.25f, 3.0f), Array(0.5f, 4.0f, -1.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.9f, 0.8f, 0.7f)),
      (Array.fill(64)(0.123f), Array.fill(64)(-0.456f)))
      .toDF("a", "b")
    val rows = df.select(
      dotProduct(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("hof"))
      .collect()
    // exact equality required: same widening, same summation order
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("mixed double-plane × float-embedding matches manual fold") {
    import spark.implicits._
    val plane = Array(0.25, -0.5, 0.75)
    val embs = Seq(Array(1.0f, 2.0f, 3.0f), Array(-4.0f, 5.0f, -6.0f))
    val got = embs.toDF("e")
      .select(dotProduct(typedLit(plane.toSeq), col("e")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    val want = embs.map(e => e.indices.foldLeft(0.0)((s, i) => s + plane(i) * e(i).toDouble))
    assert(got == want)
  }

  test("null array propagates, length mismatch truncates") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]),
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(10.0f))))
      .toDF("a", "b")
    val rows = df.select(dotProduct(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 10.0)
  }

  test("registered SQL function works") {
    DotProductExpr.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(cast(1 as double), cast(2 as double)), " +
        "array(cast(3 as double), cast(4 as double))) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }
}
