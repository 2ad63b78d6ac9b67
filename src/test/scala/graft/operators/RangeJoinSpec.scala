package graft.operators

import graft.mql.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame, keys: Seq[String]) = {
    val joined =
      if (keys.isEmpty) l.crossJoin(r.withColumnRenamed("id", "rid"))
      else l.join(r.withColumnRenamed("id", "rid"), keys)
    joined.filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("id"), col("p"), col("rid"))
  }

  test("matches a quadratic reference on random numeric data, with and without keys") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)).toDF("id", "grp", "p")
    val ivs = (0 until 120).map { i =>
      val lo = rnd.nextInt(1000) - 50
      (i.toLong, rnd.nextInt(5).toLong, lo.toLong, (lo + rnd.nextInt(90)).toLong)
    }.toDF("id", "grp", "lo", "hi")

    for (keys <- Seq(Nil, Seq("grp")); w <- Seq(7L, 32L, 1000L)) {
      val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi",
          keys = keys, binWidth = w)
        .select(col("id"), col("p"), col("r_id").as("rid"))
      val want = naive(pts.select("id", "grp", "p"),
        ivs.select(col("id"), col("grp"), col("lo"), col("hi")), keys)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"mismatch at keys=$keys binWidth=$w")
      assert(got.count() === got.distinct().count()) // one bucket per true pair
    }
  }

  test("timestamp and date axes use micros/days binWidth; empty intervals drop") {
    val pts = Seq((1L, "2024-03-01 10:00:00"), (2L, "2024-03-05 00:00:00"))
      .toDF("id", "ts").select(col("id"), to_timestamp(col("ts")).as("p"))
    val ivs = Seq(
      (10L, "2024-03-01 09:00:00", "2024-03-01 11:00:00"),
      (11L, "2024-03-04 00:00:00", "2024-03-06 00:00:00"),
      (12L, "2024-03-09 00:00:00", "2024-03-08 00:00:00")) // hi < lo: empty
      .toDF("id", "l", "h")
      .select(col("id"), to_timestamp(col("l")).as("lo"), to_timestamp(col("h")).as("hi"))
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi",
        binWidth = 3600L * 1000000) // 1h bins in micros
      .select(col("id"), col("r_id")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L)))

    val dp = Seq((1L, "2024-03-02"), (2L, "2024-05-01")).toDF("id", "d")
      .select(col("id"), to_date(col("d")).as("p"))
    val di = Seq((20L, "2024-03-01", "2024-03-10"), (21L, "2024-04-25", "2024-05-02"))
      .toDF("id", "l", "h")
      .select(col("id"), to_date(col("l")).as("lo"), to_date(col("h")).as("hi"))
    val got2 = RangeJoin.pointInInterval(dp, di, "p", "lo", "hi", binWidth = 7) // 7-day bins
      .select(col("id"), col("r_id")).as[(Long, Long)].collect().toSet
    assert(got2 == Set((1L, 20L), (2L, 21L)))
  }

  test("plan is an equi-join: no nested-loop, no cartesian") {
    val pts = (0L until 100L).map(i => (i, i % 500)).toDF("id", "p")
    val ivs = (0L until 50L).map(i => (i, i * 7, i * 7 + 40)).toDF("id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("degenerate interval fails fast naming the knob") {
    val pts = Seq((1L, 5L)).toDF("id", "p")
    val ivs = Seq((1L, 0L, 10000000L)).toDF("id", "lo", "hi")
    val e = intercept[Exception](
      RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi",
        binWidth = 1, maxBinsPerInterval = 100).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxBinsPerInterval")))
  }
}
