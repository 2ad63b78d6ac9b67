package graft.metacat

import org.apache.spark.sql.DataFrame
import org.apache.hadoop.fs.Path

/** CROSS-LOG ATOMIC TRANSACTIONS over a set of [[OccLog]]s — the
  * replacement for the one property the reference gets from a single
  * Postgres transaction per handler (data_handler.py:631-1263) and a
  * pile of independent delta logs cannot give by themselves: a mutation
  * spanning several logs (removeFiles touches edges ⊕ members ⊕ files;
  * removeDataset touches admin ⊕ members) must be visible ALL-OR-NOTHING
  * to readers, snapshots and crash recovery.
  *
  * Protocol (presumed-abort two-phase commit over rename-atomic files):
  *
  *  1. CLAIM a seq in every participating log ([[OccLog.claimNext]] —
  *     atomic marker create; conflicting successors in each log now
  *     queue behind the legs via the normal keyed awaits).
  *  2. Write the intent marker `_txn/t<id>.preparing` naming every
  *     (log, seq) leg.
  *  3. STAGE each leg's records under `_txn/t<id>/<log>/` — a parquet
  *     write per leg, same cost as a single-log commit's tmp write.
  *     Legs must be STORE-INSENSITIVE (literal rows the caller
  *     pre-computed driver-side, wildcards/tombstones whose fold
  *     semantics are content-independent): staging never awaits
  *     predecessor publishes, so two concurrent transactions can never
  *     deadlock across logs — the latest-wins per-key folds make any
  *     publish interleave collapse to the seq order the claims fixed.
  *  4. COMMIT POINT: rename the marker `.preparing` → `.committed`
  *     (atomic). Before the rename the transaction is invisible (no leg
  *     published) and rolls BACK; after it, the staged legs are the
  *     durable record and the transaction always rolls FORWARD.
  *  5. PUBLISH each staged leg (rename into its log) in leg order;
  *     delete the stage dir; the marker is GARBAGE-COLLECTED only once
  *     every leg is inside its log's DENSE published frontier — until
  *     then [[ParquetCatalog.snapshot]] sees the marker and refuses to
  *     capture a cut that would straddle the transaction.
  *
  * Crash recovery ([[recoverAll]] / [[recoverSeq]], also wired into
  * [[OccLog]]'s publish-timeout path so a successor blocked on a dead
  * transaction heals it instead of failing):
  *
  *  - `.preparing` older than the publish timeout → ABORT: the marker is
  *    renamed `.aborted` first (the rename arbitrates against a slow but
  *    alive writer reaching its commit point — its own `.preparing` →
  *    `.committed` rename then fails and the writer aborts loudly), then
  *    every claimed leg publishes as an empty no-op, keeping all seq
  *    spaces dense. Nothing of the mutation is ever visible.
  *  - `.committed` → ROLL FORWARD: publish every still-staged leg (the
  *    data is complete by definition of the commit point); rename races
  *    with the original writer are benign (first rename wins, the loser
  *    sees the published dir).
  *  - `.aborted` → finish the no-op publishes and delete the marker.
  *
  * The residual crash window is claims taken before the intent marker
  * lands (step 1→2, a few file creates, no Spark job): those claims are
  * indistinguishable from a crashed single-log writer and keep the
  * existing loud-timeout posture.
  *
  * Scale: everything here is O(legs) driver-side file operations plus
  * one mutation-sized parquet write per leg — no base-table I/O, no
  * corpus-sized shuffle; the marker directory is listed only by
  * transactions, snapshots, fsck and stuck-claim recovery, never on the
  * single-log commit hot path. */
private[metacat] final class TxnLog(spark: org.apache.spark.sql.SparkSession,
    root: String, logs: Map[String, OccLog]) {

  private val hconf = spark.sparkContext.hadoopConfiguration

  /** test-only failpoint: the name of the protocol seam to crash at
    * (throws [[TxnLog.TxnKill]] there, once). Seams: `after-claims`,
    * `after-intent`, `after-stage:<log>`, `after-commit-flip`,
    * `after-publish:<log>`. */
  @volatile private[metacat] var failpoint: Option[String] = None

  private def boom(at: String): Unit =
    if (failpoint.contains(at)) { failpoint = None; throw new TxnLog.TxnKill(at) }

  private val txnDirPath = new Path(s"$root/_txn")
  private def fs = txnDirPath.getFileSystem(hconf)

  private def markerPath(id: String, state: String) =
    new Path(txnDirPath, s"t$id.$state")
  private def stageDir(id: String) = new Path(txnDirPath, s"t$id")
  private def legStage(id: String, log: String) = new Path(stageDir(id), log)

  private def writeMarker(p: Path, legs: Seq[(String, Long)]): Unit = {
    val out = fs.create(p, true)
    try out.write(legs.map { case (l, s) => s"$l $s" }.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readMarker(p: Path): Seq[(String, Long)] = {
    val in = fs.open(p)
    val content =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    content.split("\n").map(_.trim).filter(_.nonEmpty).toSeq.map { line =>
      val Array(l, s) = line.split(" ")
      (l, s.toLong)
    }
  }

  private def timeoutMs: Long =
    sys.props.getOrElse("graft.occ.publishTimeoutMs", "120000").toLong

  /** Run one atomic multi-log mutation. On return every leg is
    * published; the marker may outlive the call until each leg falls
    * inside its log's dense frontier (snapshot straddle protection) —
    * [[gc]] reaps it. A single-leg call degenerates to the plain
    * single-log commit. */
  def run(legs: Seq[TxnLog.Leg]): Unit = {
    require(legs.nonEmpty, "empty transaction")
    require(legs.map(_.log).distinct.size == legs.size,
      "one leg per log: merge same-log records into one mixed-op frame")
    legs.foreach(l => require(logs.contains(l.log), s"unknown log ${l.log}"))
    if (legs.size == 1) {
      val l = legs.head
      logs(l.log).commit(l.mkRows, l.op, l.keys)
      return
    }
    val id = java.util.UUID.randomUUID().toString
    // 1. claim every leg (driver-side file creates, ms — the one
    // pre-marker crash window, documented above)
    val seqs: Seq[(TxnLog.Leg, Long)] =
      legs.map(l => l -> logs(l.log).claimNext(l.keys))
    boom("after-claims")
    // 2. intent marker
    val preparing = markerPath(id, "preparing")
    fs.mkdirs(txnDirPath)
    writeMarker(preparing, seqs.map { case (l, s) => (l.log, s) })
    boom("after-intent")
    // 3. stage every leg — NO predecessor awaits (store-insensitive legs)
    try {
      for ((l, s) <- seqs) {
        logs(l.log).stageRows(s, l.mkRows, l.op, legStage(id, l.log))
        boom(s"after-stage:${l.log}")
      }
    } catch {
      case e: Throwable =>
        // presumed abort: nothing is visible yet — publish no-ops at
        // every claimed seq so all sequence spaces stay dense, then
        // surface the failure
        try abort(id, seqs.map { case (l, s) => (l.log, s) }, preparing)
        catch { case ae: Throwable => e.addSuppressed(ae) }
        throw e
    }
    // 4. commit point
    if (!fs.rename(preparing, markerPath(id, "committed"))) {
      fs.delete(stageDir(id), true) // our staged legs are dead weight now
      throw new IllegalStateException(
        s"transaction $id lost its commit-point rename — an expiry-based " +
        "recovery aborted it (this writer exceeded the publish timeout); " +
        "the mutation did NOT apply")
    }
    boom("after-commit-flip")
    // 5. publish (lenient: a concurrent recoverer may win a rename)
    for ((l, s) <- seqs) {
      logs(l.log).publishStaged(s, legStage(id, l.log), strict = false)
      boom(s"after-publish:${l.log}")
    }
    fs.delete(stageDir(id), true)
    gcMarker(markerPath(id, "committed"))
  }

  private def abort(id: String, legs: Seq[(String, Long)],
      preparing: Path): Unit = {
    // flip first: the rename arbitrates against a racing commit point
    val aborted = markerPath(id, "aborted")
    if (!fs.rename(preparing, aborted) && !fs.exists(aborted))
      return // someone else owns the marker now (committed) — leave it
    legs.foreach { case (l, s) => logs(l).publishNoop(s) }
    fs.delete(stageDir(id), true)
    fs.delete(aborted, false)
    ()
  }

  /** every pending marker as (path, state, legs) */
  private def pendingMarkers(): Seq[(Path, String, Seq[(String, Long)])] = {
    if (!fs.exists(txnDirPath)) return Nil
    val M = "t[0-9a-f-]+\\.(preparing|committed|aborted)".r
    fs.listStatus(txnDirPath).toSeq.filter(_.isFile).flatMap { st =>
      st.getPath.getName match {
        case M(state) =>
          // a marker can vanish between the listing and the read (its
          // writer finished) — treat as already recovered
          try Some((st.getPath, state, readMarker(st.getPath)))
          catch { case _: java.io.FileNotFoundException => None }
        case _ => None
      }
    }
  }

  /** pending transaction count (fsck) */
  def pendingCount(): Long = pendingMarkers().size.toLong

  /** Legs of transactions that could still STRADDLE a snapshot cut: for
    * each committed-but-not-yet-GC'd marker, its (log, seq) legs. A
    * `.preparing` transaction has no published leg (every leg is above
    * every dense frontier), so only committed ones matter. */
  def committedLegs(): Seq[Seq[(String, Long)]] =
    pendingMarkers().filter(_._2 == "committed").map(_._3)

  /** GC a committed marker once every leg is inside its log's dense
    * published frontier — before that, the marker is the snapshot
    * straddle guard. Returns true when deleted. */
  private def gcMarker(p: Path): Boolean = {
    val legs =
      try readMarker(p)
      catch { case _: java.io.FileNotFoundException => return true }
    val done = legs.forall { case (l, s) =>
      logs(l).densePublishedSeq() >= s }
    if (done) fs.delete(p, false)
    done
  }

  /** Recover (or finish) every pending transaction: roll committed ones
    * forward, abort preparing ones older than the publish timeout (or
    * all of them when `force`), finish aborted ones, GC markers whose
    * legs are all dense-published. Returns the number of markers acted
    * on. Safe to run concurrently with live writers — every step is an
    * atomic create/rename arbitrating against the owner. */
  def recoverAll(force: Boolean = false): Int = {
    var acted = 0
    val now = System.currentTimeMillis()
    pendingMarkers().foreach { case (p, state, legs) =>
      state match {
        case "committed" =>
          val id = p.getName.stripPrefix("t").stripSuffix(".committed")
          legs.foreach { case (l, s) =>
            if (!logs(l).isPublished(s))
              logs(l).publishStaged(s, legStage(id, l), strict = false)
          }
          fs.delete(stageDir(id), true)
          if (gcMarker(p)) acted += 1
        case "preparing" =>
          val age = now - fs.getFileStatus(p).getModificationTime
          if (force || age > timeoutMs) {
            val id = p.getName.stripPrefix("t").stripSuffix(".preparing")
            abort(id, legs, p)
            acted += 1
          }
        case "aborted" =>
          legs.foreach { case (l, s) => logs(l).publishNoop(s) }
          val id = p.getName.stripPrefix("t").stripSuffix(".aborted")
          fs.delete(stageDir(id), true)
          fs.delete(p, false)
          acted += 1
        case _ => ()
      }
    }
    acted
  }

  /** Targeted recovery for ONE stuck claim (the [[OccLog]] publish-
    * timeout hook): find the pending transaction owning (log, seq) and
    * roll it forward or back; false when no transaction owns it (a
    * plain crashed single-log writer — keep the loud-timeout posture). */
  def recoverSeq(log: String, seq: Long): Boolean = {
    val owner = pendingMarkers().find(_._3.contains((log, seq)))
    owner match {
      case None => false
      case Some((p, state, legs)) =>
        state match {
          case "committed" =>
            val id = p.getName.stripPrefix("t").stripSuffix(".committed")
            legs.foreach { case (l, s) =>
              if (!logs(l).isPublished(s))
                logs(l).publishStaged(s, legStage(id, l), strict = false)
            }
            fs.delete(stageDir(id), true)
            gcMarker(p)
            true
          case "preparing" =>
            // the caller already waited out the full publish timeout on
            // this seq, so the owner is presumed dead regardless of the
            // marker's own age
            val id = p.getName.stripPrefix("t").stripSuffix(".preparing")
            abort(id, legs, p)
            true
          case "aborted" =>
            legs.foreach { case (l, s) => logs(l).publishNoop(s) }
            true
          case _ => false
        }
    }
  }
}

private[metacat] object TxnLog {
  /** one transaction leg: `mkRows` MUST be store-insensitive (see
    * [[TxnLog]]'s staging contract) — it is computed without awaiting
    * predecessor publishes */
  final case class Leg(log: String, op: String, keys: Option[Seq[String]],
      mkRows: () => DataFrame)

  /** test-only failpoint crash */
  final class TxnKill(at: String)
    extends RuntimeException(s"txn failpoint: $at")
}
