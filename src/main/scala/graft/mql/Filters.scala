package graft.mql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType
import scala.collection.mutable
import graft.TempDirs
import Ast._

/** MQL `filter name(params)(queries)` — the reference's UDTF surface
  * (`metacat/filters/filters.py:27-199`, SURVEY.md §2.7).
  *
  * The reference streams rows through Python generators; order-sensitive
  * filters (`sample`, `stride`, `randomize`, `mix`) observe whatever order
  * the stream happens to have (documented as unspecified,
  * docs/mql.rst:811-830). Our engine fixes the canonical CONSUMPTION order
  * to file id, which makes each filter's selected SET deterministic and
  * oracle-testable. The emitted rows remain an unordered file set — the
  * reference's own contract (mql.rst:9-10) — until an explicit `ordered`
  * (`randomize`/`mix` outputs do carry their reorder).
  *
  * Scale notes: `sample`/`stride` need a global row index over the
  * id-ordered stream. That index is computed distributedly (see
  * [[Filters.selectByGlobalIndex]]) — a range-partitioned sort of the
  * narrow fid column plus per-partition offsets, never a single-partition
  * window. The scale path the reference itself recommends
  * (docs/mql.rst:314-322) is `hash`, which is order-independent,
  * partition-disjoint and runs embarrassingly parallel here (one codegen'd
  * predicate, no shuffle). `mix` is inherently sequential (weighted
  * round-robin with global dedup) and must stream through one consumer,
  * exactly like the reference's generator — but only the narrow
  * (fid, rank) pair crosses the driver, in bounded chunks.
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

  /** Config-driven filter loading — the reference instantiates filter
    * classes named in server config (`filters.py:201-218`). The Spark
    * analog of a server config is the session conf:
    * `spark.graft.filters` holds comma-separated
    * `name=fully.qualified.ClassName` entries, each class a zero-arg
    * [[GraftFilter]].
    *
    * The conf is consulted on EVERY call and instances are cached per
    * CLASS NAME (not per filter name, and never written into the
    * [[register]] registry): a session that changes or unsets the conf
    * sees the change immediately, one session's mapping never leaks into
    * another session or outlives it in the process-global registry, and
    * a class is still only instantiated once per JVM. (The reference
    * loads filter classes from trusted server-side startup config;
    * keeping the runtime-settable conf surface means a client able to
    * SET session conf chooses which registered-on-classpath class runs —
    * acceptable for an in-process library, but nothing a client names
    * can pin itself globally.) */
  private val confInstances = mutable.Map.empty[String, GraftFilter]
  private def fromConf(spark: SparkSession, name: String): Option[GraftFilter] =
    spark.conf.getOption("spark.graft.filters").flatMap { entries =>
      entries.split(',').iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.split("=", 2))
        .collectFirst { case Array(n, cls) if n.trim == name =>
          confInstances.synchronized {
            confInstances.getOrElseUpdate(cls.trim,
              Class.forName(cls.trim).getDeclaredConstructor()
                .newInstance().asInstanceOf[GraftFilter])
          }
        }
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
    * unchanged (left join, like the reference's generators). The join key
    * is typed from the lookup's `key` column: numeric keys match numeric
    * metadata values, string keys match string values — a Python dict
    * lookup's strictness (`"42"` never matches `42`).
    */
  final class LookupJoinFilter(lookup: DataFrame, metaKey: String,
      prefix: String) extends GraftFilter {

    override def apply(spark: SparkSession, inputs: Seq[DataFrame],
        params: Seq[Const], kw: Map[String, Const]): DataFrame = {
      val df = inputs.head
      val keyIsNum = lookup.schema("key").dataType.isInstanceOf[NumericType]
      val extCols = lookup.columns.filter(_ != "key")
      val extStruct = struct(extCols.map(c => lookup(c).as(s"$prefix.$c")).toIndexedSeq: _*)
      val keyed = lookup.select(
        col("key").cast(if (keyIsNum) "double" else "string").as("__lk"),
        extStruct.as("__ext"))
      val mv = try_variant_get(col("metadata"), s"$$['$metaKey']", "variant")
      val fileKey =
        if (keyIsNum) MetaCompiler.numericVariant(mv)
        else MetaCompiler.stringVariant(mv)
      val joined = df.withColumn("__lk", fileKey)
        .join(broadcast(keyed), Seq("__lk"), "left")
      // top-level merge, patch wins: drop colliding original keys instead of
      // relying on the session-wide spark.sql.mapKeyDedupPolicy
      val orig = try_variant_get(col("metadata"), "$", "map<string,variant>")
      val ext = try_variant_get(parse_json(to_json(col("__ext"))), "$", "map<string,variant>")
      val mergedMeta = when(col("__ext").isNotNull,
        parse_json(to_json(map_concat(
          map_filter(orig, (k, _) => !map_contains_key(ext, k)), ext))))
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

    name match {
      case "sample" =>
        // accumulator x+=f; if x>=1 {x-=1; yield} over the id-ordered
        // stream (filters.py:52-69) == keep 0-based row i iff
        // floor((i+1)f) > floor(i f). The closed form is an intentional
        // deviation from the reference's float accumulation (which drifts:
        // ten 0.1-adds sum to 0.9999…); both our engine and the oracle use
        // the exact form, so they agree on every row.
        val f = num(params.head)
        selectByGlobalIndex(one, i => math.floor((i + 1) * f) > math.floor(i * f))

      case "limit" =>
        one.limit(num(params.head).toInt)

      case "stride" =>
        // every m-th starting at index r over the id-ordered stream
        // (filters.py:85-103)
        val m = num(params.head).toLong
        val r = params.drop(1).headOption.map(num(_).toLong).getOrElse(0L)
        selectByGlobalIndex(one, i => i % m == r)

      case "hash" =>
        // adler32(fid) % m == r — order-independent, partition-disjoint for
        // a fixed m (filters.py:105-123; docs/mql.rst:314-322)
        val m = num(params.head).toLong
        val r = params.drop(1).headOption.map(num(_).toLong).getOrElse(0L)
        one.filter(adler32(col("fid")) % m === r)

      case "randomize" =>
        // pseudo-random but deterministic reorder: sort by a seeded keyed
        // hash of the id. The reference shuffles within a bounded window
        // (filters.py:125-149) and documents the output order only as
        // "pseudo random"; a keyed-hash sort meets that contract, stays
        // distributed, and — using md5 rather than an engine-specific
        // hash — is reproducible by any engine (the DuckDB oracle derives
        // the identical key). fid tiebreak guards md5 collisions.
        val seed = params.headOption.map(num(_).toLong)
          .orElse(kw.get("seed").map(num(_).toLong)).getOrElse(0L)
        one.orderBy(randomizeKey(col("fid"), seed), col("fid"))

      case "mix" =>
        mix(spark, params.map(num), inputs)

      case other =>
        // explicit in-process registration wins; the session conf mapping
        // is re-resolved per call (never promoted into the registry, so
        // unsetting the conf genuinely removes the filter)
        custom.synchronized(custom.get(other))
          .orElse(fromConf(spark, other)) match {
          case Some(f) => f(spark, inputs, params, kw)
          case None => throw new IllegalArgumentException(s"Unknown filter: $other")
        }
    }
  }

  /** `randomize` sort key: md5("<seed>:<fid>") — portable across engines */
  def randomizeKey(fid: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    md5(concat(lit(s"$seed:"), fid))

  /** Select rows of `df` whose 0-based position in the fid-ordered stream
    * satisfies `keep`, with the global index computed DISTRIBUTEDLY:
    *
    *  1. sort the narrow fid column (range-partitioned exchange — every
    *     partition holds a contiguous fid range, sorted);
    *  2. `RDD.zipWithIndex` — one light count job, then every partition
    *     numbers itself in parallel from its offset;
    *  3. semi-join the selected ids back to the full rows (co-located when
    *     `files` is bucketed by fid).
    *
    * Only the fid string crosses the DataFrame→RDD boundary, so the wide
    * row (Variant metadata and all) stays in columnar land. This replaces
    * the round-1 `Window.orderBy("fid")` with no partitionBy, which
    * funneled the entire set through a single task.
    */
  private def selectByGlobalIndex(df: DataFrame, keep: Long => Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Materialize the narrow sorted-fid frame ONCE (eager local checkpoint,
    // cleaned by the ContextCleaner when unreferenced). Without it the
    // upstream plan — possibly a full BFQ — executed three times: once for
    // zipWithIndex's size job, once when the semi-join consumed the picked
    // RDD's lineage, and once as the join's own left side. Now only the
    // unavoidable left-side scan replays the upstream.
    val fids = df.select("fid").sort("fid").localCheckpoint()
    val picked = fids.as[String].rdd
      .zipWithIndex()
      .collect { case (fid, i) if keep(i) => fid }
    df.join(spark.createDataset(picked).toDF("fid"), Seq("fid"), "left_semi")
  }

  /** (fid, rank) pairs the driver buffers per spill chunk during `mix`.
    * Var only so tests can shrink it to exercise the multi-chunk spill
    * path on small data. */
  private[mql] var MixChunk = 100000

  /** Hard ceiling on `mix`'s RETAINED dedup set (the reference's
    * generator holds the full set, filters.py:160; ours is pruned — see
    * [[mix]] — so this bounds the inter-stream skew window, not the
    * output size). Crossing it raises a clear error instead of slowly
    * strangling the driver heap; at ~60 bytes/fid the default is <1 GiB.
    * Var only so tests can exercise the bound. */
  private[mql] var MixMaxDedup = 10000000

  /** Weighted round-robin interleave of k id-ordered streams with global
    * dedup by fid; stops at first exhaustion — faithful port of the score
    * algorithm in filters.py:151-191, driver-sequenced by nature.
    *
    * Unlike round 1 (which buffered every full Row in an ArrayBuffer), the
    * driver now pulls only the narrow fid column from each input, assigns
    * mix ranks lazily, spills (fid, rank) in [[MixChunk]]-sized chunks to a
    * scratch parquet, and re-attaches the full rows with a distributed
    * join; the result is ordered by mix rank.
    *
    * Driver memory is BOUNDED: because every fid stream arrives id-sorted,
    * a fid below every stream's next unconsumed head can never be pulled
    * again, so the dedup set is a TreeSet pruned to that floor once per
    * [[MixChunk]] pulls. What remains is the skew window between the
    * fastest and slowest stream — O(ratio spread × chunk), not O(output).
    * [[MixMaxDedup]] backstops pathological skew with an explicit error
    * naming the knob, the operator's one true ceiling.
    */
  private def mix(spark: SparkSession, ratios: List[Double],
      inputs: List[DataFrame]): DataFrame = {
    require(inputs.nonEmpty, "mix: no inputs")
    require(ratios.length == inputs.length,
      s"mix: ${ratios.length} ratios for ${inputs.length} inputs")
    import scala.jdk.CollectionConverters._
    // each input is consumed TWICE — the fid stream for the interleave and
    // the re-attachment join below — so materialize it once (eager local
    // checkpoint, ContextCleaner-owned); round 2 re-executed every input's
    // upstream plan for the second consumption
    val pinned = inputs.map(_.localCheckpoint())
    // narrow driver streams: only fid is pulled through toLocalIterator;
    // BUFFERED so the dedup prune can see each stream's next unconsumed
    // head without disturbing it
    val fidIters: Array[BufferedIterator[String]] = pinned.map { df =>
      df.select("fid").sort("fid").toLocalIterator().asScala
        .map(_.getString(0)).buffered
    }.toArray

    // (fid, rank, winning source): the SOURCE matters — when a fid exists
    // in several inputs, the reference emits the row object pulled from
    // the stream that won the score round (filters.py:151-191), and a
    // lookup filter may have enriched exactly that branch's metadata
    val interleaved: Iterator[(String, Long, Int)] = new Iterator[(String, Long, Int)] {
      // ordered so prune() can evict everything below the stream floor
      private val sent = new java.util.TreeSet[String]()
      private var scores = ratios.indices.map(i => (0.0, i)).toList
      private var rank = 0L
      private var nextFid: String = _
      private var nextSrc = 0
      private var done = false
      private var primed = false

      /** sorted-stream eviction: a fid strictly below EVERY live stream's
        * next unconsumed head can never be pulled again, so it needs no
        * dedup memory. Exhausted streams produce nothing and don't hold
        * the floor down. */
      private def prune(): Unit = {
        val live = fidIters.filter(_.hasNext)
        if (live.isEmpty) sent.clear()
        else sent.headSet(live.map(_.head).min).clear()
      }

      private def advance(): Unit = {
        primed = true
        nextFid = null
        while (nextFid == null && !done) {
          scores = scores.map { case (s, i) => (s + ratios(i), i) }
          scores = scores.sortBy { case (s, i) => (-s, -i) }
          val (s0, i0) = scores.head
          scores = scores.map { case (s, i) => (s - s0, i) }
          val it = fidIters(i0)
          var sentOne = false
          while (!sentOne && !done) {
            if (!it.hasNext) done = true
            else {
              val fid = it.next()
              if (!sent.contains(fid)) {
                sent.add(fid)
                if (sent.size > MixMaxDedup)
                  throw new IllegalStateException(
                    s"mix: dedup window exceeded $MixMaxDedup retained fids " +
                      "(pathological skew between input streams); raise " +
                      "Filters.MixMaxDedup or rebalance the mix ratios")
                scores = (scores.head._1 - 1.0, i0) :: scores.tail
                nextFid = fid
                nextSrc = i0
                sentOne = true
              }
            }
          }
        }
      }

      def hasNext: Boolean = { if (!primed) advance(); nextFid != null }
      def next(): (String, Long, Int) = {
        if (!hasNext) throw new NoSuchElementException("mix exhausted")
        val out = (nextFid, rank, nextSrc); rank += 1; primed = false
        if (rank % MixChunk == 0) prune()
        out
      }
    }

    import spark.implicits._
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-mix-")
    TempDirs.register(tmpDir)
    var any = false
    interleaved.grouped(MixChunk).foreach { chunk =>
      spark.createDataset(chunk).toDF("fid", "__mix_rank", "__mix_src")
        .write.mode("append").parquet(tmpDir.toString)
      any = true
    }
    // re-attach full rows from exactly the input each fid was consumed
    // from (join on fid AND source index); per-input fid dedup guards an
    // upstream that emits duplicate fids (e.g. a lookup join that fanned
    // out) from duplicating a rank's row
    val base = pinned.zipWithIndex
      .map { case (df, i) => df.withColumn("__mix_src", lit(i)) }
      .reduce(_.unionByName(_))
      .dropDuplicates("fid", "__mix_src")
    if (!any) base.limit(0).drop("__mix_src")
    else base.join(spark.read.parquet(tmpDir.toString), Seq("fid", "__mix_src"))
      .orderBy("__mix_rank").drop("__mix_rank", "__mix_src")
  }
}
