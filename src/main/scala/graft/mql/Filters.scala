package graft.mql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable
import Ast._

/** MQL `filter name(params)(queries)` — the reference's UDTF surface
  * (`metacat/filters/filters.py:27-199`, SURVEY.md §2.7).
  *
  * The reference streams rows through Python generators; order-sensitive
  * filters (`sample`, `stride`, `randomize`, `mix`) observe whatever order
  * the stream happens to have (documented as unspecified,
  * docs/mql.rst:811-830). Our engine fixes the canonical stream order to
  * file id, which makes the order-sensitive filters deterministic and
  * oracle-testable.
  *
  * Scale notes: `sample`/`stride` need a global row index — a full sort.
  * That is inherent to their semantics (the reference streams through one
  * generator, i.e. is single-threaded anyway). The scale path the reference
  * itself recommends (docs/mql.rst:314-322) is `hash`, which is
  * order-independent, partition-disjoint and runs embarrassingly parallel
  * here (one codegen'd predicate, no shuffle). `mix` is inherently
  * sequential (weighted round-robin with global dedup) and runs driver-side
  * over `toLocalIterator` streams, exactly like the reference's generator.
  */
object Filters {

  /** user-filter extension point (filters.py:201-218 loads these from
    * config; we take registrations in-process) */
  trait GraftFilter {
    def apply(spark: SparkSession, inputs: Seq[DataFrame],
        params: Seq[Const], kw: Map[String, Const]): DataFrame
  }

  private val custom = mutable.Map.empty[String, GraftFilter]
  def register(name: String, f: GraftFilter): Unit = custom.synchronized {
    custom(name) = f
  }

  /** External-data join filter — the reference's runsdb/rucio custom
    * filters (`DUNE_specials/custom_filters/runsdb.py:44-60`,
    * `rucio_rses.py:21-40`): look up rows in an external source keyed by a
    * metadata value and merge the fetched columns into each file's
    * metadata. The external source is modeled as a DataFrame (JDBC, REST
    * snapshot, …); the reference's chunked 1000-file lookups become a
    * broadcast left join + top-level JSON merge — distributed, one pass.
    *
    * `lookup` must have a `key` column; every other column `c` lands in
    * metadata as `<prefix>.<c>`. Files without a match pass through
    * unchanged (left join, like the reference's generators).
    */
  final class LookupJoinFilter(lookup: DataFrame, metaKey: String,
      prefix: String) extends GraftFilter {
    import org.apache.spark.sql.DataFrame

    override def apply(spark: SparkSession, inputs: Seq[DataFrame],
        params: Seq[Const], kw: Map[String, Const]): DataFrame = {
      val df = inputs.head
      spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      val extCols = lookup.columns.filter(_ != "key")
      val extStruct = struct(extCols.map(c => lookup(c).as(s"$prefix.$c")).toIndexedSeq: _*)
      val keyed = lookup.select(col("key").cast("double").as("__lk"),
        extStruct.as("__ext"))
      val joined = df.withColumn("__lk",
        try_variant_get(col("metadata"), s"$$['$metaKey']", "double"))
        .join(broadcast(keyed), Seq("__lk"), "left")
      val mergedMeta = when(col("__ext").isNotNull,
        parse_json(to_json(map_concat(
          try_variant_get(col("metadata"), "$", "map<string,variant>"),
          try_variant_get(parse_json(to_json(col("__ext"))), "$", "map<string,variant>")))))
        .otherwise(col("metadata"))
      joined.withColumn("metadata", mergedMeta).drop("__lk", "__ext")
    }
  }

  /** adler32(fid) — must be exactly adler32 to reproduce the reference's
    * partition assignment (filters.py:105-123). Native codegen'd Catalyst
    * expression: stays inside the whole-stage codegen span. */
  def adler32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.Adler32Expr.adler32(c)

  private def num(c: Const): Double = c match {
    case IntC(v) => v.toDouble
    case FloatC(v) => v
    case DateC(v) => v
    case BoolC(v) => if (v) 1.0 else 0.0
    case StringC(s) => s.toDouble
  }

  def apply(spark: SparkSession, name: String, params: List[Const],
      kw: Map[String, Const], inputs: List[DataFrame]): DataFrame = {

    def one: DataFrame = inputs match {
      case List(df) => df
      case _ => throw new IllegalArgumentException(s"filter $name takes one file set")
    }
    val byFid = Window.orderBy("fid")

    name match {
      case "sample" =>
        // accumulator x+=f; if x>=1 {x-=1; yield} over the id-ordered
        // stream (filters.py:52-69) == keep i-th (0-based) iff
        // floor((i+1)f) > floor(i f)
        val f = num(params.head)
        one.withColumn("__rn", row_number().over(byFid).cast("double"))
          .filter(floor(col("__rn") * f) > floor((col("__rn") - 1) * f))
          .drop("__rn")

      case "limit" =>
        one.limit(num(params.head).toInt)

      case "stride" =>
        // every m-th starting at index r over the id-ordered stream
        // (filters.py:85-103)
        val m = num(params.head).toLong
        val r = params.drop(1).headOption.map(num(_).toLong).getOrElse(0L)
        one.withColumn("__rn", row_number().over(byFid))
          .filter((col("__rn") - 1) % m === r)
          .drop("__rn")

      case "hash" =>
        // adler32(fid) % m == r — order-independent, partition-disjoint for
        // a fixed m (filters.py:105-123; docs/mql.rst:314-322)
        val m = num(params.head).toLong
        val r = params.drop(1).headOption.map(num(_).toLong).getOrElse(0L)
        one.filter(adler32(col("fid")) % m === r)

      case "randomize" =>
        // pseudo-random but deterministic reorder: sort by a seeded hash of
        // the id. The reference shuffles within a bounded window
        // (filters.py:125-149) and documents the output order only as
        // "pseudo random"; a keyed-hash sort meets that contract and stays
        // distributed.
        val seed = params.headOption.map(num(_).toLong)
          .orElse(kw.get("seed").map(num(_).toLong)).getOrElse(0L)
        one.orderBy(xxhash64(col("fid"), lit(seed)))

      case "mix" =>
        mix(spark, params.map(num), inputs)

      case other =>
        custom.synchronized(custom.get(other)) match {
          case Some(f) => f(spark, inputs, params, kw)
          case None => throw new IllegalArgumentException(s"Unknown filter: $other")
        }
    }
  }

  /** weighted round-robin interleave of k id-ordered streams with global
    * dedup by fid; stops at first exhaustion — faithful port of the score
    * algorithm in filters.py:151-191. Driver-side by nature. */
  private def mix(spark: SparkSession, ratios: List[Double],
      inputs: List[DataFrame]): DataFrame = {
    require(ratios.length == inputs.length,
      s"mix: ${ratios.length} ratios for ${inputs.length} inputs")
    val schema = inputs.head.schema
    val iters: Array[Iterator[Row]] = inputs.map { df =>
      val it = df.orderBy("fid").toLocalIterator()
      new Iterator[Row] {
        def hasNext: Boolean = it.hasNext
        def next(): Row = it.next()
      }
    }.toArray

    val out = mutable.ArrayBuffer.empty[Row]
    val sent = mutable.HashSet.empty[String]
    val fidIdx = schema.fieldIndex("fid")
    // scores: (score, inputIndex)
    var scores = inputs.indices.map(i => (0.0, i)).toList
    var stop = false
    while (scores.nonEmpty && !stop) {
      scores = scores.map { case (s, i) => (s + ratios(i), i) }
      scores = scores.sortBy { case (s, i) => (-s, -i) }
      val (s0, i0) = scores.head
      scores = scores.map { case (s, i) => (s - s0, i) }
      var sentOne = false
      val it = iters(i0)
      while (!sentOne && !stop) {
        if (!it.hasNext) stop = true
        else {
          val row = it.next()
          val fid = row.getString(fidIdx)
          if (!sent(fid)) {
            out += row
            sent += fid
            scores = (scores.head._1 - 1.0, i0) :: scores.tail
            sentOne = true
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.toSeq.asJava, schema)
  }
}
