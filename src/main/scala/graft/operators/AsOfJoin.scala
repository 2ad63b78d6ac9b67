package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the standard time-series operator
  * Spark has no built-in for: each left row picks the right row with the
  * greatest ordering value ≤ its own, per key.
  *
  * Scale design: NOT a range join (whose candidate set is O(n·m) per key
  * before pruning) and NOT a per-key collect. Both sides union into one
  * frame tagged by side, then a single window per key carries the latest
  * right payload forward in ordering-column order (right rows sort before
  * left rows at equal ordering values, so "at or before" includes ties).
  * Cost: one shuffle on the key + one sort within partitions — the same
  * shape as any keyed window, AQE/skew-safe, no candidate blow-up at any
  * scale. This mirrors how streaming engines implement temporal joins
  * (sorted merge per key), declared in DataFrame terms.
  *
  * The right side must be unique per (key, ord) — pre-aggregate if not
  * (ties there have no defined "latest"); left duplicates are fine.
  */
object AsOfJoin {

  /** `left` gains `right`'s non-key columns (each aliased
    * `rightPrefix + name`, the matched ordering value included) from the
    * matched as-of row; unmatched left rows (no right row at or before)
    * are dropped (inner as-of semantics). With `tolerance`, a match
    * further than `tolerance` in the past counts as no match (the pandas
    * merge_asof contract) — a post-filter, since the carried payload is
    * already the closest one. Tolerance units follow the ordering column's
    * type: native units for numeric `ord`, MICROSECONDS for
    * timestamp `ord`, DAYS for date `ord` (a raw `__o - __m.ord` would
    * yield an interval for time types and fail analysis against a Long). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ord: String,
      rightPrefix: String = "r_", tolerance: Option[Long] = None): DataFrame = {
    val reserved = Set("__k", "__o", "__side", "__r", "__m")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty, s"asOf reserves ${clash.mkString(", ")}")
    val rValueCols = right.columns.filter(_ != key).toSeq
    val prefClash = left.columns.toSet
      .intersect(rValueCols.map(rightPrefix + _).toSet)
    require(prefClash.isEmpty,
      s"left columns collide with prefixed right outputs: ${prefClash.mkString(", ")}")
    val rPayload = struct(rValueCols.map(col): _*)
    val rType = right.select(rPayload).schema.head.dataType
    val lPayloadCols = left.columns.filter(c => c != key && c != ord).toSeq

    val lTagged = left.select(
      col(key).as("__k") +: col(ord).as("__o") +: lit(1).as("__side") +:
        lit(null).cast(rType).as("__r") +: lPayloadCols.map(col): _*)
    val rTagged = right.select(
      col(key).as("__k") +: col(ord).as("__o") +: lit(0).as("__side") +:
        rPayload.as("__r") +: lPayloadCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col("__k")).orderBy(col("__o"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .filter(tolerance match {
        case Some(t) =>
          import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
          val matched = col("__m").getField(ord)
          left.schema(ord).dataType match {
            case TimestampType | TimestampNTZType =>
              // (NTZ goes through a session-tz cast: the offsets cancel
              // in the difference)
              unix_micros(col("__o").cast(TimestampType)) -
                unix_micros(matched.cast(TimestampType)) <= t
            case DateType => datediff(col("__o"), matched) <= t
            case _ => col("__o") - matched <= t
          }
        case None => lit(true)
      })

    val out = col("__k").as(key) +: col("__o").as(ord) +:
      (lPayloadCols.map(col) ++
        rValueCols.map(c => col("__m").getField(c).as(rightPrefix + c)))
    carried.select(out: _*)
  }
}
