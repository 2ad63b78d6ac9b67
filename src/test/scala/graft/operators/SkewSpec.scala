package graft.operators

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join returns exactly the plain-join rows under heavy skew") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(7)).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
    val small = Seq((7L, "hot"), (0L, "cold"), (50L, "warm")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).select("k", "v", "tag")
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 8).select("k", "v", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
