package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions route: a session built with
  * `withExtensions(new GraftExtensions)` (equivalently
  * `spark.sql.extensions=graft.functions.GraftExtensions`) exposes the
  * native expressions to pure-SQL clients. Uses its own session build —
  * extensions bind at construction — then restores the shared one. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("native functions callable from plain SQL via SparkSessionExtensions") {
    // capture BOTH the default and active sessions and restore both —
    // another suite observing getActiveSession mid-test must not pick up
    // the extensions session (round-3 advice)
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-ext-test")
      .getOrCreate()
    try {
      val h = spark.sql("SELECT graft_adler32('F00000001') AS h")
        .collect().head.getLong(0)
      val z = new java.util.zip.Adler32
      z.update("F00000001".getBytes("UTF-8"))
      assert(h == z.getValue)

      val d = spark.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(math.abs(d - 11.0) < 1e-12)

      // wrong arity surfaces the registration's own message
      val e = intercept[Exception](spark.sql("SELECT graft_adler32('a', 'b')").collect())
      assert(e.getMessage.contains("graft_adler32"))
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
