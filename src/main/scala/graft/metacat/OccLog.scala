package graft.metacat

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.Path

/** One multi-writer OCC-governed delta log under `root`:
  *
  *  - `<name>/s<seq>/` — published commit segments (one parquet dir per
  *    mutation)
  *  - `<name>_claims/s<seq>` — atomic claim markers
  *  - `<name>_ckpt/s<seq>/` — checkpoints (the folded published prefix)
  *
  * The reference serializes concurrent clients through Postgres
  * transactions (data_handler.py handlers run on one transactional
  * connection each; uniqueness comes from the schema's primary keys).
  * Here the log IS the commit protocol, in the Delta-log shape: each
  * mutation occupies exactly one `__seq`, a seq is CLAIMED by an atomic
  * create-if-absent marker file and PUBLISHED by renaming the written
  * parquet directory to `<name>/s<seq>/`. Claims are dense (next = max
  * claimed + 1) and taken FIRST: the winner of seq s waits for every
  * predecessor's publish and then computes its row versions against
  * exactly the published state of seqs < s — the state they serialize
  * after. Serializable, with one Spark write per mutation; a lost claim
  * race costs a failed file-create, never a recompute (see [[commit]]).
  *
  * Atomicity of the claim: `java.nio.Files.createFile` (O_CREAT|O_EXCL)
  * on local filesystems — Hadoop's RawLocalFileSystem.create is
  * check-then-act, not atomic — and `FileSystem.create(p, overwrite =
  * false)` elsewhere (a single atomic namenode op on HDFS). Object
  * stores without atomic create-if-absent need a CAS-capable commit
  * service, the same caveat Delta documents for S3 multi-writer.
  *
  * Crash window: a writer that dies between claim and publish leaves an
  * orphaned claim; successors block on [[awaitPublished]] and fail
  * loudly after a timeout naming the orphan (Fsck.audit flags the same
  * state). Recovery is manual marker removal — the Delta-equivalent of
  * clearing a stale lock.
  *
  * Checkpoint + vacuum bound the log's read cost WITHOUT an exclusive
  * window: [[checkpoint]] materializes `fold` over the published prefix
  * ≤ n into `<name>_ckpt/s<n>/` (tmp write + atomic rename, idempotent —
  * a PURE FUNCTION of already-published commits, so no coordination with
  * writers is needed); [[records]] then reads one checkpoint dir + only
  * the segments ABOVE it; [[vacuum]] deletes the covered raw segments,
  * claim markers, legacy flat files and older checkpoints. The one
  * operation that must not run concurrently is compaction ([[truncate]]
  * callers), which folds the log into its base table and deletes all
  * three directories — it needs an EXCLUSIVE window in every mode.
  *
  * @param schema    full at-rest record shape INCLUDING `__op`/`__seq`
  * @param fold      pure latest-wins collapse used by checkpoints; must
  *                  preserve the read semantics of the prefix it replaces
  * @param legacyFlat when true, parquet part files directly under
  *                  `<name>/` (a pre-OCC flat layout) are honored: their
  *                  max `__seq` joins the allocation frontier and they are
  *                  readable until the first vacuum/compaction that covers
  *                  them
  */
private[metacat] final class OccLog(
    spark: SparkSession, root: String, name: String, schema: StructType,
    fold: DataFrame => DataFrame, legacyFlat: Boolean = false) {

  private val hconf = spark.sparkContext.hadoopConfiguration
  private def path(t: String) = s"$root/$t"
  private def hPath(t: String) = new Path(path(t))
  private def fsOf(p: Path) = p.getFileSystem(hconf)
  private val claimsT = s"${name}_claims"
  private val ckptT = s"${name}_ckpt"

  /** Cross-log transaction recovery hook (wired by the owning catalog):
    * called at a publish deadline with (logName, stuckSeq); returning
    * true means the stuck claim's owning transaction was rolled forward
    * or back — its seq is now published (as the staged leg or a no-op)
    * and the wait may re-check. Default: no recovery, time out loudly. */
  private[metacat] var stuckClaimRecovery: (String, Long) => Boolean =
    (_, _) => false

  /** Test seam: fires in [[records]] between the pinned segment listing
    * (already re-validated against the checkpoint pointer) and the EAGER
    * `spark.read` file-index resolution — the exact window where a
    * concurrent checkpoint+vacuum deletes just-listed segments and the
    * read throws PATH_NOT_FOUND out of plan CONSTRUCTION. */
  private[metacat] var onRecordsPinned: () => Unit = () => ()

  private def align(df: DataFrame): DataFrame =
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq: _*)

  /** Output-partition count for COMMIT writes. Mutation-sized commits
    * inherit the session's shuffle/scan partitioning (32 local), so each
    * tiny segment landed as 5-10 near-empty part files — written by as
    * many tasks, then listed and footer-read by EVERY later [[records]]
    * fold (guide §6: small files hurt twice). Local default 1 part file
    * per commit; a deployment doing bulk commits (millions of rows per
    * mutation) raises `spark.graft.commit.partitions` — the value is a
    * WRITE LAYOUT choice, never a semantics change. Checkpoint folds are
    * O(log state), not mutation-sized — they size by estimated bytes
    * ([[OccLog.foldSized]]), never by this conf. */
  private def sized(df: DataFrame): DataFrame = OccLog.commitSized(spark, df)

  private val SeqDirName = "s(\\d{20})".r

  private def seqDirName(s: Long): String = f"s$s%020d"

  /** seq numbers present as `s<20 digits>` children of `t` */
  private def listSeqNames(t: String): Seq[Long] = {
    OccLog.listings.incrementAndGet()
    val p = hPath(t)
    val fs = fsOf(p)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case SeqDirName(d) => d.toLong
    }
  }

  def rawNonEmpty(): Boolean = {
    val p = hPath(name)
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory && fs.listStatus(p).nonEmpty
  }

  /** true iff any UNFOLDED log state exists — raw commit segments or a
    * checkpoint (after [[vacuum]] the raw directory may be empty while
    * the checkpoint still carries every not-yet-compacted mutation) */
  def nonEmpty(): Boolean = rawNonEmpty() || ckptSeq() > 0L

  /** The RAW log as a DataFrame. One commit = one `s<seq>/` parquet
    * directory, so the read recurses; a pre-OCC flat layout's top-level
    * part files are picked up by the same recursive listing. Post-vacuum
    * this holds only segments above the checkpoint horizon — full-log
    * readers go through [[records]]. */
  def readRaw(): DataFrame =
    spark.read.schema(schema).option("recursiveFileLookup", "true")
      .parquet(path(name))

  /** Every unfolded log record, reading the cheapest equivalent source:
    * with a checkpoint at seq c, the checkpoint (`fold` over seqs ≤ c,
    * original `__seq`/`__op` preserved) plus only the raw segments ABOVE
    * c — one small parquet dir instead of c tiny commit dirs, the
    * read-cost bound that keeps an always-on multi-writer catalog
    * O(base + recent commits) instead of O(all commits ever). Latest-wins
    * semantics are unchanged because the checkpoint already IS the fold
    * of its prefix. Falls back to the raw log when legacy flat-layout
    * rows reach above the checkpoint.
    *
    * Concurrency: the segment listing must be CONSISTENT with the
    * checkpoint pointer it was taken against, and any later vacuum must
    * fail the read LOUDLY. Two measures enforce that:
    * (1) the pointer is re-read after the listing — if a concurrent
    *     checkpoint advanced it, segments in (c, c'] may already be
    *     vacuumed out of the listing, so recompute from the new pointer;
    * (2) segments are read via PINNED per-seq paths, never a recursive
    *     directory scan — a directory scan re-lists lazily at action
    *     time, so a vacuum between plan and action SILENTLY drops the
    *     folded-away segments (observed: an existence check inside a
    *     commit read an empty log mid-vacuum and failed a live dataset).
    *     Pinned paths turn that race into FileNotFoundException, which
    *     every materializing caller ([[stageRows]], [[checkpoint]],
    *     retryOnVanish sites) already retries with a fresh plan. */
  def records(): DataFrame = {
    var guard = 0
    while (true) {
      val c = ckptSeq()
      if (legacyFlatSeq() > c) {
        // pre-OCC flat part files live directly under the log dir — only
        // the recursive listing sees them; flat files are immutable and
        // only vacuumed once a covering checkpoint exists (c >= flat max)
        return readRaw()
      }
      val above = listSeqNames(name).filter(_ > c).sorted
        .map(s => s"${path(name)}/${seqDirName(s)}")
      if (ckptSeq() == c) {
        onRecordsPinned()
        // spark.read.parquet resolves its file index EAGERLY, so a vacuum
        // deleting a just-listed segment (or a superseded checkpoint)
        // between the listing and here throws PATH_NOT_FOUND out of plan
        // CONSTRUCTION — before any caller's materialization retry can
        // see it (observed: an ingest stream's very first mkBatch() in
        // declareFiles, built outside the pin-retry loop, died against an
        // admin loop's vacuum cadence). A fresh listing is always correct
        // (the covering checkpoint carries the vacuumed segments), so the
        // race is absorbed here, inside the existing guard loop.
        try {
          val aboveDf =
            if (above.isEmpty) None
            else Some(spark.read.schema(schema).parquet(above: _*))
          val ckptDf =
            if (c <= 0L) None
            else Some(spark.read.schema(schema)
              .parquet(s"${path(ckptT)}/${seqDirName(c)}"))
          return (ckptDf, aboveDf) match {
            case (Some(k), Some(a)) => k.unionByName(a)
            case (Some(k), None)    => k
            case (None, Some(a))    => a
            case (None, None)       => spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          }
        } catch {
          case e: Throwable if OccLog.fileVanished(e) => () // recompute
        }
      }
      guard += 1 // a checkpoint/vacuum moved mid-listing — recompute
      if (guard > 50) throw new IllegalStateException(
        s"records() of $root/$name could not take a stable listing after " +
        s"$guard attempts (checkpoint pointer kept moving)")
    }
    sys.error("unreachable")
  }

  /** Highest seq of the pre-OCC flat layout (parquet part files directly
    * under `<name>/`). Flat files are immutable once OCC is in force (no
    * new flat writes happen), so the computed value is MEMOIZED — the
    * pre-memo path cost a directory listing plus, when flat files exist,
    * a full Spark aggregate over the raw log PER CLAIM ATTEMPT on the
    * commit hot path. [[truncate]] and [[vacuum]] (the two operations
    * that delete flat files in this instance) invalidate; a concurrent
    * vacuum in ANOTHER instance can leave this memo stale-nonzero, but
    * only after proving `legacyFlatSeq <= ckptSeq`, so every consumer —
    * the allocation frontier (max with ckpt), the awaitPublished filter
    * (> legacy implies > some published prefix) and [[records]]'s
    * `legacy > ckpt` branch test — degrades safely. */
  def legacyFlatSeq(): Long = {
    if (!legacyFlat) return 0L
    val memo = legacyMemo
    if (memo >= 0L) return memo
    val p = hPath(name)
    val fs = fsOf(p)
    val hasFlat = fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val computed =
      if (!hasFlat) 0L
      else readRaw().agg(max(col("__seq"))).collect().head match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    legacyMemo = computed
    computed
  }

  /** -1 = not yet computed */
  @volatile private var legacyMemo: Long = -1L

  /** highest checkpointed seq (0 = no checkpoint). The checkpoint dir
    * name IS the horizon record, so a vacuumed log (claims ≤ horizon
    * removed) still allocates correctly: the frontier never falls below
    * it. */
  def ckptSeq(): Long = (0L +: listSeqNames(ckptT)).max

  /** highest CLAIMED seq — the allocation frontier for the next commit.
    * Includes the checkpoint horizon: vacuum deletes claim markers the
    * checkpoint proves published, and the frontier must survive that. */
  private def maxClaimed(): Long =
    ((0L +: listSeqNames(claimsT)) :+ legacyFlatSeq() :+ ckptSeq()).max

  /** highest PUBLISHED seq — the log's current version number */
  def currentSeq(): Long =
    ((0L +: listSeqNames(name)) :+ legacyFlatSeq() :+ ckptSeq()).max

  /** Write the claimed seq's DECLARED KEY SET beside its marker
    * (`<claims>/s<seq>.keys`): the conflict-detection handshake that
    * lets DISJOINT-key successors compute concurrently instead of
    * serializing behind every predecessor's Spark write (the flat
    * ~2 commits/s ceiling measured through 8 writers). One key per
    * line; the single line `*` means "all keys" (an unkeyed commit —
    * conflicts with everything, the original total order). Written
    * immediately after winning the claim, so a reader finding a marker
    * without keys is either a microsecond-old claim (grace-polled) or a
    * crashed writer (degrades to the conservative full wait). */
  private def writeKeys(s: Long, keys: Option[Seq[String]]): Unit = {
    val p = new Path(path(claimsT), seqDirName(s) + ".keys")
    val fs = fsOf(p)
    val content = keys match {
      case Some(ks) => ks.distinct.sorted.mkString("\n")
      case None => "*"
    }
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** the declared key set of claimed seq `s`: Some(keys), or None for
    * "treat as conflicting" (unkeyed `*`, a not-yet-written keys file
    * past the grace, or a pre-keys legacy claim) */
  private def readKeys(s: Long): Option[Set[String]] = {
    val p = new Path(path(claimsT), seqDirName(s) + ".keys")
    val fs = fsOf(p)
    var graceLeft = 40 // ~1 s: the writer stamps keys right after claiming
    while (!fs.exists(p) && graceLeft > 0) {
      if (!fs.exists(new Path(path(claimsT), seqDirName(s)))) return None
      Thread.sleep(25L)
      graceLeft -= 1
    }
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val content =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    if (content.trim == "*") None
    else Some(content.split("\n").map(_.trim).filter(_.nonEmpty).toSet)
  }

  /** atomically claim `s`: create-if-absent on the marker file; false ⇒
    * another writer owns it */
  private def claim(s: Long): Boolean = {
    val marker = new Path(path(claimsT), seqDirName(s))
    val fs = fsOf(marker)
    fs.mkdirs(marker.getParent)
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(marker.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { fs.create(marker, false).close(); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    }
  }

  /** Block until every claimed seq ≤ `upTo` has published its data dir —
    * under claim-first commits a predecessor holds its claim for its
    * whole compute+publish, so the wait covers the queue of commits
    * ahead (deadline via `graft.occ.publishTimeoutMs`, default 120 s). A
    * claim that never publishes (crashed writer) fails loudly after the
    * timeout. */
  private def awaitPublished(upTo: Long,
      myKeys: Option[Seq[String]] = None): Unit = {
    if (upTo <= 0L) return
    val legacy = legacyFlatSeq()
    val ckpt = ckptSeq() // the checkpoint proves its prefix published
    var pending = listSeqNames(claimsT)
      .filter(s => s <= upTo && s > legacy && s > ckpt)
    // conflict detection: a KEYED commit waits only for predecessors
    // whose declared key sets intersect its own — disjoint mutations
    // commute under the per-key latest-wins folds, so computing against
    // the published state (which can only lack disjoint records) is the
    // same serializable outcome, and the Spark writes overlap instead of
    // queueing. Predecessors with unknown keys conservatively conflict.
    myKeys.foreach { mine =>
      val mineSet = mine.toSet
      val pubFs = fsOf(hPath(name))
      pending = pending.filter { s =>
        // a PUBLISHED predecessor never needs conflict evaluation —
        // claims persist until vacuum, and a claim without a .keys
        // sidecar (pre-keys deployment, or a writer that crashed between
        // claim and writeKeys) would otherwise burn readKeys' full ~1 s
        // grace poll on EVERY keyed commit until a vacuum clears it
        if (pubFs.exists(new Path(path(name), seqDirName(s)))) false
        else readKeys(s) match {
          case Some(theirs) => theirs.exists(mineSet.contains)
          case None => true // unkeyed or unknown: total-order behavior
        }
      }
    }
    if (pending.isEmpty) return
    val fs = fsOf(hPath(name))
    val timeoutMs =
      sys.props.getOrElse("graft.occ.publishTimeoutMs", "120000").toLong
    // the checkpoint frontier is re-listed only every ~250 ms (cached
    // across wait iterations — the pre-cache loop re-listed the ckpt dir
    // every 5 ms, O(listings) growing with commits-since-vacuum), and the
    // sleep backs off exponentially 5 → 80 ms per pending seq
    var cachedCkpt = ckpt
    var nextCkptProbe = System.nanoTime() + 250L * 1000 * 1000
    for (s <- pending.sorted) {
      val dir = new Path(path(name), seqDirName(s))
      val marker = new Path(path(claimsT), seqDirName(s))
      // the deadline is PER pending seq: a queue of k slow predecessors
      // gets k independent windows instead of timing out collectively
      val deadline = System.nanoTime() + timeoutMs * 1000 * 1000
      var sleepMs = 5L
      var waiting = true
      var recoveryTried = false
      while (waiting && !fs.exists(dir)) {
        val now = System.nanoTime()
        if (now > nextCkptProbe) {
          cachedCkpt = ckptSeq()
          nextCkptProbe = now + 250L * 1000 * 1000
        }
        // a concurrent vacuum may retire the claim (and its segment)
        // after we listed it — the checkpoint carries that commit, stop
        // waiting
        if (!fs.exists(marker) || s <= cachedCkpt) waiting = false
        else if (now > deadline && !recoveryTried &&
            stuckClaimRecovery(name, s)) {
          // a cross-log transaction recovery hook rolled the stuck
          // claim's owning transaction forward (published its staged
          // leg) or back (published a no-op) — re-check once
          recoveryTried = true
        }
        else if (now > deadline)
          throw new IllegalStateException(
            s"log seq $s is claimed but never published (crashed writer?); " +
            s"publish an empty no-op commit (mkdir ${path(name)}/${seqDirName(s)}) " +
            s"to recover gap-free, or remove ${path(claimsT)}/${seqDirName(s)} " +
            "(fsck will flag the seq gap)")
        else {
          Thread.sleep(sleepMs)
          sleepMs = math.min(80L, sleepMs * 2L)
        }
      }
    }
  }

  /** Commit one mutation's records under multi-writer OCC — O(rows
    * touched), no base-table I/O beyond the read feeding `mkRows`.
    *
    * CLAIM-FIRST: own the next dense seq before computing, await the
    * predecessors' publishes, then compute the mutation against exactly
    * the state of seqs < s and publish — each mutation runs its Spark
    * write exactly ONCE. (The original write-first variant computed
    * speculatively and re-computed on every lost claim; at 4 concurrent
    * writers a slow writer burned a full write per collision and starved
    * past the retry cap. Losing a claim-first race costs one failed
    * file-create, ~ms.) The cost is that commits serialize behind each
    * other's computes — the same aggregate throughput write-first
    * delivered under contention, with none of the wasted work.
    *
    * The frame `mkRows` returns carries the record shape minus `__seq`
    * (stamped here); a frame WITHOUT `__op` gets `op` stamped, one WITH
    * it keeps its per-row ops — the one seq then holds a mixed mutation
    * (e.g. a replace = wildcard remove + new rows) that readers see
    * atomically. If the compute/write FAILS, the claimed seq publishes
    * as an EMPTY no-op commit so the sequence space stays dense and
    * successors are never stranded behind the claim. */
  def commit(mkRows: () => DataFrame, op: String): Unit =
    commit(mkRows, op, None)

  /** [[commit]] with a DECLARED KEY FOOTPRINT: the caller contracts that
    * this mutation's reads and records concern only `keys` (under the
    * log's per-key fold — e.g. one dataset's identity on the members
    * log, the touched fids on the edges log). Commits whose footprints
    * are disjoint from every unpublished predecessor skip the publish
    * wait and compute CONCURRENTLY — disjoint per-key mutations commute,
    * so any publish order folds to the same state (a reader may
    * momentarily see seq s without s-1; that is the serialization where
    * s came first). Unkeyed commits keep the total order. */
  def commit(mkRows: () => DataFrame, op: String,
      keys: Option[Seq[String]]): Unit = {
    val fs = fsOf(hPath(name))
    val s = claimNext(keys)
    val dst = new Path(path(name), seqDirName(s))
    // Predecessors may still be computing/publishing: the snapshot for
    // THIS mutation is exactly the published seqs < s. A failure HERE —
    // an unpublished predecessor timing out — must NOT publish this seq
    // as an empty no-op: seq s landing while s-1 is merely slow (any
    // Spark write can exceed the timeout under load) would open a hole
    // BELOW a published seq, and a reader counting published frontiers
    // could mistake the queue for further along than it is. The claim is
    // left in place (it joins the stuck queue behind the orphan, loudly
    // named below); [[checkpoint]] independently refuses to fold past a
    // hole, so even a hand-published no-op above a slow predecessor can
    // never cost that predecessor's eventual commit.
    try awaitPublished(s - 1L, keys)
    catch {
      case e: Throwable =>
        throw new IllegalStateException(
          s"commit of claimed log seq $s in $root/$name aborted while " +
          s"waiting for its predecessors (${e.getMessage}); this claim " +
          s"remains and blocks successors — clear it (remove " +
          s"${path(claimsT)}/${seqDirName(s)}) after recovering the stuck " +
          "predecessor", e)
    }
    try {
      val tmp = new Path(path("_tmp"), s"commit-${java.util.UUID.randomUUID()}")
      stageRows(s, mkRows, op, tmp)
      publishStaged(s, tmp, strict = true)
    } catch {
      case e: Throwable =>
        // keep the protocol dense and successors unblocked: the claimed
        // seq publishes as an empty no-op commit before the failure
        // propagates (readers fold zero rows from it)
        publishNoop(s)
        throw e
    }
  }

  // ---- cross-log transaction primitives (see [[TxnLog]]) ----
  // The single-log [[commit]] is claimNext → awaitPublished → stageRows →
  // publishStaged; a multi-log transaction drives the same primitives
  // across several logs with an intent marker deciding atomicity.

  /** this log's name (the leg tag in transaction markers) */
  private[metacat] def logName: String = name

  /** Await the conflicting predecessors of claimed seq `s` — the
    * [[commit]] posture, exposed for [[TxnLog]]'s store-SENSITIVE
    * primary leg: after this returns, a fold computed from the store
    * reads exactly the published state its keys depend on (seqs < s
    * with intersecting keys are all published; disjoint-key records
    * commute under the per-key folds). */
  private[metacat] def awaitForStaging(s: Long, keys: Option[Seq[String]]): Unit =
    awaitPublished(s - 1L, keys)

  private[metacat] def isPublished(s: Long): Boolean =
    fsOf(hPath(name)).exists(new Path(path(name), seqDirName(s)))

  /** Claim the next dense seq and stamp its key sidecar; returns the seq.
    * The sidecar is an OPTIMIZATION, never a correctness input: a
    * transient FS failure there must not strand the claimed seq with
    * neither a publish nor a no-op (successors would block the full
    * publish timeout for a failure that preceded any work), so it is
    * swallowed — successors finding a sidecar-less claim degrade to the
    * conservative total-order wait, and the awaitPublished published-dir
    * short-circuit bounds that degradation to this commit's own
    * in-flight window. */
  private[metacat] def claimNext(keys: Option[Seq[String]]): Long = {
    var attempt = 0
    var s = 0L
    // ONE listing anchors the walk; collisions probe FORWARD with atomic
    // create attempts instead of re-listing. A failed claim proves that
    // seq was just taken by another writer (markers only appear, never
    // move), so the next candidate is simply +1 — each failure is
    // global progress, which makes the walk lock-free and starvation-free.
    // The old list-per-collision loop cost O(writers) listings per commit
    // under contention (measured: listings/commit 6.5 → 11.8 → 20.2 at
    // 8/16/32 writers, max single commit 18.5 s — re-listing writers
    // stampeded the same minimum free seq every round); the walk restores
    // the flat ~5 listings/commit of the uncontended path at any writer
    // count, with a jittered periodic resync in case a checkpoint
    // advanced the frontier past the walk.
    var candidate = maxClaimed() + 1L
    while (s == 0L) {
      if (claim(candidate)) {
        // Claim/vacuum TOCTOU guard: between resyncs a concurrent
        // checkpoint+vacuum may have advanced past `candidate` and
        // deleted its (published) marker — this claim then recreated a
        // marker BELOW the checkpoint horizon. Publishing there would be
        // a silent loss: records() folds ckpt + segments > ckpt, so the
        // commit is never read and the next vacuum deletes it. One
        // ckptSeq() listing per WON claim (the uncontended cost shape)
        // closes the window: a checkpoint covering s is proof s was
        // already published by someone else, so our fresh marker is
        // bogus — release it and resync above the horizon.
        if (candidate > ckptSeq()) s = candidate
        else {
          val fs = fsOf(hPath(claimsT))
          fs.delete(new Path(path(claimsT), seqDirName(candidate)), false)
          candidate = math.max(candidate + 1L, maxClaimed() + 1L)
        }
      } else {
        attempt += 1
        if (attempt >= 10000)
          throw new IllegalStateException(
            s"gave up claiming a seq in $root/$name after $attempt collisions")
        candidate += 1L
        if (attempt % 64 == 0) {
          Thread.sleep(1L +
            java.util.concurrent.ThreadLocalRandom.current().nextLong(20L))
          candidate = math.max(candidate, maxClaimed() + 1L)
        }
      }
    }
    try writeKeys(s, keys)
    catch { case _: Throwable => () }
    s
  }

  /** Compute and write claimed seq `s`'s records to `tmp` (not yet
    * published). Retries the write when its file listing raced a
    * concurrent vacuum — the checkpoint now carries the deleted
    * segments, so a FRESH plan from `mkRows` is correct (the same remedy
    * Delta prescribes for reads racing VACUUM). */
  private[metacat] def stageRows(s: Long, mkRows: () => DataFrame,
      op: String, tmp: Path): Unit = {
    val fs = fsOf(tmp)
    var wrote = false
    var writeAttempt = 0
    while (!wrote) {
      try {
        val rows = mkRows()
        sized(align((if (rows.columns.contains("__op")) rows
            else rows.withColumn("__op", lit(op)))
            .withColumn("__seq", lit(s))))
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        wrote = true
      } catch {
        case e: Throwable if OccLog.fileVanished(e) && writeAttempt < 5 =>
          writeAttempt += 1
          fs.delete(tmp, true)
          Thread.sleep(10L * writeAttempt)
      }
    }
  }

  /** Publish claimed seq `s` by renaming `tmp` into the log. `strict`
    * (single-log commits) throws when the rename fails; lenient callers
    * (transaction roll-forward, where a racing recoverer may have
    * published the same staged leg first) accept an already-published
    * destination. */
  private[metacat] def publishStaged(s: Long, tmp: Path,
      strict: Boolean): Unit = {
    val fs = fsOf(hPath(name))
    val dst = new Path(path(name), seqDirName(s))
    fs.mkdirs(dst.getParent)
    // The lenient race has TWO shapes, not one: a recoverer that won the
    // publish leaves dst in place (rename returns false), but a
    // recoverer that ALSO finished its stage-dir cleanup leaves tmp
    // GONE — and RawLocalFileSystem.rename surfaces a vanished source as
    // FileNotFoundException from its copy fallback rather than `false`
    // (the r12 one-in-N TxnSpec flake: a snapshot's GC pass rolled the
    // txn forward and deleted the stage dir mid-race; the writer's own
    // publish then threw here). Either way, dst published == success.
    val renamed =
      try fs.rename(tmp, dst)
      catch {
        case _: java.io.FileNotFoundException if !strict && fs.exists(dst) =>
          false
      }
    if (!renamed) {
      if (strict || !fs.exists(dst))
        throw new IllegalStateException(
          s"publish of claimed log seq $s failed: $tmp -> $dst")
      fs.delete(tmp, true) // a recoverer won the race — ours is surplus
    }
  }

  /** publish claimed seq `s` as an EMPTY no-op commit (readers fold zero
    * rows from it) — the rollback/compute-failure path that keeps the
    * sequence space dense and successors unblocked */
  private[metacat] def publishNoop(s: Long): Unit = {
    val fs = fsOf(hPath(name))
    val dst = new Path(path(name), seqDirName(s))
    if (!fs.exists(dst)) { fs.mkdirs(dst); () }
  }

  /** the vacuum horizon: 0 while the raw segments still cover the
    * checkpointed prefix (checkpoint taken, nothing vacuumed yet — full
    * per-seq history remains readable); the checkpoint seq once
    * [[vacuum]] has dropped the prefix (snapshots below it are gone,
    * exactly like `VERSION AS OF` below a Delta VACUUM boundary) */
  def vacuumHorizon(): Long = {
    val c = ckptSeq()
    if (c > 0L && legacyFlatSeq() == 0L &&
        !listSeqNames(name).exists(_ <= c)) c
    else 0L
  }

  /** Highest seq `n` such that EVERY seq in 1..n is published (or proven
    * published by the legacy/checkpoint floor) — the only prefix a
    * checkpoint may fold. Folding up to the raw maximum instead would be
    * unsafe: with seq s published while s-1 is still in flight (a
    * hand-published recovery no-op, or any protocol deviation), a fold
    * bounded at s would cover the hole, and when the slow-but-alive
    * writer later publishes s-1 BELOW the checkpoint, [[records]] would
    * never read it and [[vacuum]] would delete it — a commit that
    * returned success, silently lost. */
  def densePublishedSeq(): Long = {
    val floor = math.max(ckptSeq(), legacyFlatSeq())
    val published = listSeqNames(name).filter(_ > floor).toSet
    var n = floor
    while (published(n + 1L)) n += 1L
    n
  }

  /** Materialize the published prefix into a checkpoint; returns its seq
    * (0 = empty log, nothing to do). Safe under concurrent writers; must
    * not race compaction (it truncates what the checkpoint reads). The
    * fold is bounded at the DENSE published prefix ([[densePublishedSeq]])
    * — never past a hole a slow predecessor may still fill — and the
    * read+write retries when its file listing races a concurrent
    * [[vacuum]] (same remedy as [[commit]]'s snapshot writes; the two are
    * advertised concurrent-safe and run together by maintenance CLIs). */
  def checkpoint(): Long = {
    val n = densePublishedSeq()
    if (n <= 0L) return 0L
    if (ckptSeq() >= n) return ckptSeq() // already covered
    val fs = fsOf(hPath(ckptT))
    val tmp = new Path(path("_tmp"), s"ckpt-${java.util.UUID.randomUUID()}")
    var wrote = false
    var attempt = 0
    while (!wrote) {
      try {
        val merged = fold(records()
          .filter(col("__seq") <= n)) // guard: a commit may publish mid-write
        // the fold covers the ENTIRE published log state — size its write
        // by estimated bytes, not the mutation-commit conf (a fixed
        // coalesce(1) here is a single-task write of the whole log at scale)
        OccLog.foldSized(spark, align(merged))
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        wrote = true
      } catch {
        case e: Throwable if OccLog.fileVanished(e) && attempt < 5 =>
          attempt += 1
          fs.delete(tmp, true)
          Thread.sleep(10L * attempt)
      }
    }
    val dst = new Path(path(ckptT), seqDirName(n))
    fs.mkdirs(dst.getParent)
    if (!fs.rename(tmp, dst)) {
      // a concurrent checkpointer won the rename — theirs is equivalent
      fs.delete(tmp, true)
      if (!fs.exists(dst))
        throw new IllegalStateException(s"checkpoint publish failed: $tmp -> $dst")
    }
    n
  }

  /** Drop the raw log prefix the newest checkpoint covers; returns the
    * vacuum horizon (0 = no checkpoint, nothing vacuumed). Concurrent
    * with writers; historical reads racing this degrade to the horizon
    * (the Delta `VERSION AS OF` vs VACUUM race). Deletion order (claims
    * first, then segments, older checkpoints last) keeps concurrent
    * commit allocation safe: the frontier reads max(claims, checkpoint),
    * and the checkpoint dir landed before any claim it supersedes is
    * removed. */
  def vacuum(): Long = {
    val c = ckptSeq()
    if (c <= 0L) return 0L
    val fs = fsOf(hPath(name))
    // claims first: a lingering claim whose segment is gone would strand
    // awaitPublished; a gone claim with a lingering segment is inert.
    // Key sidecars go with their claims (an orphaned sidecar is inert
    // but would accumulate).
    listSeqNames(claimsT).filter(_ <= c).foreach { s =>
      fs.delete(new Path(path(claimsT), seqDirName(s)), false)
      fs.delete(new Path(path(claimsT), seqDirName(s) + ".keys"), false)
    }
    listSeqNames(name).filter(_ <= c).foreach { s =>
      fs.delete(new Path(path(name), seqDirName(s)), true)
    }
    // legacy flat part files: deletable only when the checkpoint covers
    // their max seq (always true for checkpoints this class wrote —
    // records() refuses a ckpt below the flat max, so never strand them)
    val logDir = hPath(name)
    if (legacyFlatSeq() <= c && fs.exists(logDir))
      fs.listStatus(logDir).filter(st => st.isFile &&
          !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
        .foreach(st => fs.delete(st.getPath, false))
    listSeqNames(ckptT).filter(_ < c).foreach { s =>
      fs.delete(new Path(path(ckptT), seqDirName(s)), true)
    }
    legacyMemo = -1L // flat files may be gone — recompute on next use
    c
  }

  /** Delete the log, its claims and its checkpoints together — the final
    * step of COMPACTION (exclusive window required): post-compaction
    * sequences restart at 1 everywhere (allocation reads the store, never
    * a live counter). A surviving checkpoint would be poison — its records
    * are already folded into the base, but its seq would push the
    * allocation frontier past the restart. */
  def truncate(): Unit = {
    fsOf(hPath(name)).delete(hPath(name), true)
    fsOf(hPath(claimsT)).delete(hPath(claimsT), true)
    fsOf(hPath(ckptT)).delete(hPath(ckptT), true)
    legacyMemo = -1L // compaction removed the flat layout for good
    ()
  }

  /** protocol integrity counters for Fsck: (seq gaps, orphaned claims,
    * unclaimed publishes). Seqs the vacuumed checkpoint covers are
    * PRESENT by proof (the ckpt is their fold); pre-vacuum the raw
    * segments must still be dense, so the horizon contributes nothing
    * and a deleted commit stays visible. */
  def protocolAudit(): (Long, Long, Long) = {
    val published = listSeqNames(name)
    val claims = listSeqNames(claimsT)
    val legacy = legacyFlatSeq()
    val horizon = vacuumHorizon()
    val present = (1L to legacy).toSet ++ (1L to horizon) ++ published
    val maxSeq = ((0L +: published.toList) :+ legacy :+ ckptSeq()).max
    // Under KEYED commits a disjoint successor publishing above a
    // still-computing predecessor is a NORMAL transient state, not a
    // crashed writer: an unpublished seq whose claim marker is younger
    // than the publish timeout is IN FLIGHT — counted as neither a seq
    // gap nor an orphaned claim (it either publishes, or ages past the
    // timeout and then surfaces as both).
    val timeoutMs =
      sys.props.getOrElse("graft.occ.publishTimeoutMs", "120000").toLong
    val now = System.currentTimeMillis()
    val cfs = fsOf(hPath(claimsT))
    def inFlight(s: Long): Boolean = {
      val m = new Path(path(claimsT), seqDirName(s))
      try cfs.exists(m) &&
        now - cfs.getFileStatus(m).getModificationTime < timeoutMs
      catch { case _: java.io.FileNotFoundException => false }
    }
    ((1L to maxSeq).count(s => !present(s) && !inFlight(s)).toLong,
      claims.count(s => s > legacy && !present(s) && !inFlight(s)).toLong,
      published.count(s => s > legacy && !claims.contains(s)).toLong)
  }
}

private[graft] object OccLog {
  /** process-wide directory-listing counter (every [[listSeqNames]]) —
    * probes read it to report listings-per-commit on the claim path */
  private[graft] val listings = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Output-partition count for MUTATION-SIZED commit/append writes
    * (`spark.graft.commit.partitions`, default 1; < 1 disables the
    * coalesce). One shared parse replaces four copy-pasted try/catch
    * blocks that caught Throwable — swallowing fatal errors and silently
    * coercing a typo'd conf value to 1; an unparseable value now fails
    * loudly (NumberFormatException names the bad setting). */
  private[graft] def commitParts(spark: SparkSession): Int =
    spark.conf.get("spark.graft.commit.partitions", "1").toInt

  /** [[commitParts]]-sized view of a mutation-sized frame — a WRITE
    * LAYOUT choice (guide §6 small files), never a semantics change.
    * O(log)/O(table) writes (checkpoint folds, rewrites) must NOT use
    * this: they size by estimated output bytes instead ([[foldSized]]). */
  private[graft] def commitSized(spark: SparkSession, df: DataFrame): DataFrame = {
    val n = commitParts(spark)
    if (n >= 1) df.coalesce(n) else df
  }

  /** Size-DERIVED output partitioning for O(log)/O(table) writes —
    * checkpoint folds, full-table rewrites, COW partition rewrites. The
    * r14 commit sizing (fixed coalesce(1)) leaked onto these paths, and
    * coalesce has no shuffle barrier: at scale the ENTIRE fold/sort/write
    * stage collapsed to one task. Parts here = ceil(optimized-plan size
    * estimate / `spark.graft.write.targetFileBytes`, default 128 MiB,
    * guide §6's output-file floor), floor 1 — a mutation-sized fold still
    * lands as one file while a 100 GB fold keeps hundreds of write tasks.
    * coalesce never RAISES partition counts, so the result is naturally
    * capped by the plan's own parallelism. `spark.graft.checkpoint.partitions`
    * (>= 1) overrides outright; < 1 disables the coalesce. */
  private[graft] def foldSized(spark: SparkSession, df: DataFrame): DataFrame = {
    val conf = spark.conf.get("spark.graft.checkpoint.partitions", "")
    if (conf.nonEmpty) {
      val n = conf.toInt
      return if (n >= 1) df.coalesce(n) else df
    }
    val target = spark.conf
      .get("spark.graft.write.targetFileBytes", (128L * 1024 * 1024).toString)
      .toLong
    // upper-bound estimate (filters keep their child's size without CBO);
    // only the order of magnitude matters for a file-count choice
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (bytes / BigInt(math.max(target, 1L))).toLong + 1L
    df.coalesce(math.max(1L, math.min(parts, 1L << 20)).toInt)
  }
  /** true when any cause in the chain is a missing-file read failure —
    * the signature of a snapshot listing racing [[OccLog.vacuum]] */
  def fileVanished(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 12) {
      if (t.isInstanceOf[java.io.FileNotFoundException]) return true
      val m = t.getMessage
      // execution-time miss (task read; Spark 4 surfaces it as
      // FAILED_READ_FILE.FILE_NOT_EXIST) or plan-time miss (the listing
      // saw a segment a vacuum then deleted before spark.read opened it)
      if (m != null && (m.contains("FileNotFoundException") ||
          m.contains("PATH_NOT_FOUND") || m.contains("Path does not exist") ||
          m.contains("FILE_NOT_EXIST") || m.contains("File does not exist")))
        return true
      t = t.getCause
      depth += 1
    }
    false
  }

  /** the standard checkpoint fold: latest record per key, original
    * `__seq`/`__op` preserved */
  def latestPerKey(keys: Seq[String])(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(col("__seq").desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
