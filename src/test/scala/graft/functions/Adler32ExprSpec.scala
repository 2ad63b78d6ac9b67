package graft.functions

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._

class Adler32ExprSpec extends SparkTestBase {

  test("matches java.util.zip.Adler32 and stays codegen'd") {
    import spark.implicits._
    val inputs = Seq("F00000123", "F00014999", "", "a", "hello world",
      "é中文") // non-ascii utf-8
    val got = inputs.toDF("s")
      .select(Adler32Expr.adler32(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val want = inputs.map { s =>
      val a = new java.util.zip.Adler32()
      a.update(s.getBytes("UTF-8"))
      a.getValue
    }
    assert(got == want)
  }

  test("registered SQL function works") {
    Adler32Expr.register(spark)
    val r = spark.sql("SELECT graft_adler32('F00000123') AS h").collect().head.getLong(0)
    assert(r == 155779533L)
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s")
      .select(Adler32Expr.adler32(col("s"))).collect().head
    assert(r.isNullAt(0))
  }
}
