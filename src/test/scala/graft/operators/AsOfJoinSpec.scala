package graft.operators

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {

  test("asOf picks the most recent right row at or before, per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"), (3L, 9L, "p4"))
      .toDF("k", "o", "lv")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (1L, 30L, "c"), (2L, 7L, "d"))
      .toDF("k", "o", "rv")
    val got = AsOfJoin.asOf(left, right, "k", "o").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("o"), r.getAs[String]("lv"),
        r.getAs[Long]("r_o"), r.getAs[String]("r_rv"))).toSet
    assert(got == Set(
      (1L, 10L, "p1", 10L, "a"), // tie: right at equal ord matches
      (1L, 20L, "p2", 15L, "b"), // skips the later "c"
      // k=2: left at 5 precedes right at 7 -> dropped (inner semantics)
      // k=3: no right rows at all -> dropped
    ))
  }

  test("asOf result equals a quadratic reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val left = Seq.tabulate(300)(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = Seq.tabulate(200)(j => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, j.toLong))
    // unique (k, o) on the right: keep max payload per cell like the gate does
    val rightU = right.groupBy(r => (r._1, r._2)).map { case ((k, o), rs) =>
      (k, o, rs.map(_._3).max)
    }.toSeq
    val want = left.flatMap { case (k, o, lv) =>
      val cands = rightU.filter(r => r._1 == k && r._2 <= o)
      if (cands.isEmpty) None
      else {
        val m = cands.maxBy(_._2)
        Some((k, o, lv, m._2, m._3))
      }
    }.toSet
    val got = AsOfJoin.asOf(
      left.toDF("k", "o", "lv").repartition(7),
      rightU.toDF("k", "o", "rv").repartition(3), "k", "o").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("o"), r.getAs[Long]("lv"),
        r.getAs[Long]("r_o"), r.getAs[Long]("r_rv"))).toSet
    assert(got == want)
  }

  test("tolerance drops matches further than t in the past, keeps boundary") {
    import spark.implicits._
    val left = Seq((1L, 20L, "p"), (1L, 30L, "q")).toDF("k", "o", "lv")
    val right = Seq((1L, 10L, "a")).toDF("k", "o", "rv")
    // gaps: 10 and 20; tolerance 10 keeps the boundary match only
    val got = AsOfJoin.asOf(left, right, "k", "o", tolerance = Some(10L))
      .collect().map(r => (r.getAs[Long]("o"), r.getAs[String]("r_rv"))).toSet
    assert(got == Set((20L, "a")))
    // reserved-name collision fails fast
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left.withColumnRenamed("lv", "__side"), right, "k", "o")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left.withColumnRenamed("lv", "r_rv"), right, "k", "o")
    }
  }

  test("tolerance on timestamp and date ordering columns") {
    import spark.implicits._
    // timestamp ord: tolerance is in MICROSECONDS
    val lts = Seq((1L, "2024-01-01 00:00:20", "p"), (1L, "2024-01-01 00:00:30", "q"))
      .toDF("k", "s", "lv").withColumn("o", col("s").cast("timestamp")).drop("s")
    val rts = Seq((1L, "2024-01-01 00:00:10", "a"))
      .toDF("k", "s", "rv").withColumn("o", col("s").cast("timestamp")).drop("s")
    // gaps: 10 s and 20 s; tolerance 10 s keeps the boundary match only
    val got = AsOfJoin.asOf(lts, rts, "k", "o", tolerance = Some(10000000L))
      .collect().map(r => (r.getAs[String]("lv"), r.getAs[String]("r_rv"))).toSet
    assert(got == Set(("p", "a")))
    // date ord: tolerance is in DAYS
    val ld = Seq((1L, "2024-01-05", "p"), (1L, "2024-01-09", "q"))
      .toDF("k", "s", "lv").withColumn("o", col("s").cast("date")).drop("s")
    val rd = Seq((1L, "2024-01-02", "a"))
      .toDF("k", "s", "rv").withColumn("o", col("s").cast("date")).drop("s")
    val gotD = AsOfJoin.asOf(ld, rd, "k", "o", tolerance = Some(3L))
      .collect().map(r => (r.getAs[String]("lv"), r.getAs[String]("r_rv"))).toSet
    assert(gotD == Set(("p", "a")))
  }

  test("asOf plan is one keyed window, not a range join") {
    import spark.implicits._
    val plan = AsOfJoin.asOf(
      Seq((1L, 1L, "x")).toDF("k", "o", "lv"),
      Seq((1L, 1L, "y")).toDF("k", "o", "rv"), "k", "o")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window") && !plan.toLowerCase.contains("cartesian"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
