package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Interval (range) join — each left POINT row matches the right
  * INTERVAL rows whose [lo, hi] contains it (plus optional equi-keys).
  *
  * Spark has no first-class range join: a non-equi `p BETWEEN lo AND hi`
  * predicate plans as BroadcastNestedLoopJoin (or a cartesian product
  * when neither side broadcasts) — O(n·m) comparisons per key, the named
  * scale-killer class. The standard fix (the interval-binning technique
  * behind Databricks' range-join hint and Flink's interval join) turns
  * the range predicate into an EQUI-join on fixed-width bins:
  *
  *  - every point maps to exactly ONE bin: floor(p / binWidth);
  *  - every interval explodes to the bins it covers
  *    (floor(lo/w) .. floor(hi/w) — bounded rows per interval);
  *  - candidates equi-join on (keys…, bin); the exact `BETWEEN` runs as
  *    a post-filter on that bounded candidate set.
  *
  * Because a point owns a single bin and an interval covers each of its
  * bins once, every true (point, interval) pair meets in EXACTLY one
  * bucket — no duplicate elimination pass. The shuffle carries bin keys,
  * never payloads fanned out O(n·m); candidate volume is bin occupancy ×
  * intervals-per-bin, tuned by `binWidth` (rule of thumb: the typical
  * interval length — wider wastes post-filtering, narrower explodes more
  * interval rows).
  *
  * `binWidth` units follow the point column's type: native units for
  * numerics, MICROSECONDS for timestamps, DAYS for dates (same
  * type-driven convention as [[AsOfJoin]] tolerance). Intervals with
  * hi < lo are empty by definition and dropped. A degenerate interval
  * spanning more than `maxBinsPerInterval` bins fails fast with a
  * per-row error naming the knob instead of silently exploding the
  * candidate set.
  */
object RangeJoin {

  /** `left` point rows gain each matching `right` interval's non-key
    * columns (aliased `rightPrefix + name`); non-matching left rows are
    * dropped (inner semantics). `keys` are additional equi-join columns
    * present on both sides. */
  def pointInInterval(left: DataFrame, right: DataFrame, point: String,
      lo: String, hi: String, keys: Seq[String] = Nil, binWidth: Long = 32,
      rightPrefix: String = "r_", maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "pointInInterval: binWidth must be positive")
    val reserved = Set("__bin", "__lo", "__hi", "__p")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty, s"pointInInterval reserves ${clash.mkString(", ")}")
    val prefClash = left.columns.toSet
      .intersect(right.columns.filter(!keys.contains(_)).map(rightPrefix + _).toSet)
    require(prefClash.isEmpty,
      s"left columns collide with prefixed right outputs: ${prefClash.mkString(", ")}")

    // normalize the three boundary columns to a common long axis; the
    // exact BETWEEN post-filter also runs on this axis so mixed
    // timestamp/date sides compare consistently
    def axis(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
      case DateType => unix_date(c)
      case _ => c
    }
    val pAxis = axis(col(point), left.schema(point).dataType)
    val loAxis = axis(col(lo), right.schema(lo).dataType)
    val hiAxis = axis(col(hi), right.schema(hi).dataType)

    val lBinned = left.withColumn("__p", pAxis)
      .withColumn("__bin", floor(col("__p") / binWidth))
    val spanBins = floor(hiAxis / binWidth) - floor(loAxis / binWidth) + 1
    val rBinned = right
      .withColumn("__lo", loAxis).withColumn("__hi", hiAxis)
      .filter(col("__hi") >= col("__lo")) // hi < lo ⇒ empty interval
      .withColumn("__bin", explode(when(spanBins <= maxBinsPerInterval,
        sequence(floor(col("__lo") / binWidth), floor(col("__hi") / binWidth)))
        .otherwise(raise_error(concat(lit(
          s"pointInInterval: interval spans more than $maxBinsPerInterval bins " +
            s"at binWidth=$binWidth (lo axis "), col("__lo"),
          lit(", hi axis "), col("__hi"),
          lit("); widen binWidth or raise maxBinsPerInterval"))))))

    val rOut = right.columns.filter(!keys.contains(_)).toSeq
    val joined = lBinned
      .join(rBinned.select((keys :+ "__bin").map(col) ++
        Seq(col("__lo"), col("__hi")) ++
        rOut.map(c => col(c).as(rightPrefix + c)): _*),
        keys :+ "__bin")
      .filter(col("__p") >= col("__lo") && col("__p") <= col("__hi"))
    joined.select(left.columns.map(col) ++
      rOut.map(c => col(rightPrefix + c)): _*)
  }
}
