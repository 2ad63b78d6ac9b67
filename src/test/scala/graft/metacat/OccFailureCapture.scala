package graft.metacat

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.Outcome

/** Failure-transcript capture for the OCC/transaction suites (r13).
  *
  * Round 12 had a TxnSpec test fail ONCE in a 38-test OCC group run and
  * never reproduce — and the run left nothing to diagnose with: the
  * failing catalog root was one of dozens of anonymous temp dirs, and
  * the seed/seam context lived only in the assertion message. A 2PC
  * recovery path that fails 1-in-N deserves a transcript, not a shrug.
  *
  * Suites mix this in and route their roots/seeds through
  * [[registerRoot]]/[[registerSeed]]. On ANY test failure the fixture
  * prints, to stderr, a `OCC-FAILURE-CAPTURE` block with the test name,
  * every registered seed, and a recursive listing (path, size, mtime)
  * of every registered catalog root — the durable FS state IS the
  * protocol transcript for a claim/stage/publish log, since every
  * protocol step is a file operation under the root. The temp dirs are
  * never deleted on failure, so the block's paths stay inspectable
  * after the run. */
trait OccFailureCapture extends AnyFunSuite {

  private val roots = new scala.collection.mutable.ArrayBuffer[String]
  private val seeds = new scala.collection.mutable.ArrayBuffer[Long]

  protected def registerRoot(p: String): String =
    synchronized { roots += p; p }

  protected def registerSeed(s: Long): Long =
    synchronized { seeds += s; s }

  private def listTree(root: java.nio.file.Path): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    try {
      val stream = java.nio.file.Files.walk(root)
      try {
        stream.forEach { p =>
          val rel = root.relativize(p)
          if (rel.toString.nonEmpty) {
            val attrs = java.nio.file.Files.readAttributes(
              p, classOf[java.nio.file.attribute.BasicFileAttributes])
            val kind = if (attrs.isDirectory) "d" else "f"
            out += f"  $kind ${attrs.size()}%9d ${attrs.lastModifiedTime()} $rel"
          }
        }
      } finally stream.close()
    } catch { case e: Throwable => out += s"  <walk failed: $e>" }
    out.sorted.toSeq
  }

  override def withFixture(test: NoArgTest): Outcome = {
    synchronized { roots.clear(); seeds.clear() }
    val outcome = super.withFixture(test)
    if (!outcome.isSucceeded && !outcome.isCanceled) {
      val (rs, ss) = synchronized { (roots.toSeq, seeds.toSeq) }
      val sb = new StringBuilder
      sb ++= s"\n===== OCC-FAILURE-CAPTURE =====\n"
      sb ++= s"suite: ${getClass.getName}\n"
      sb ++= s"test:  ${test.name}\n"
      if (ss.nonEmpty) sb ++= s"seeds: ${ss.mkString(", ")}\n"
      for (r <- rs) {
        sb ++= s"root (retained): $r\n"
        listTree(java.nio.file.Paths.get(r)).foreach(l => sb ++= l + "\n")
      }
      sb ++= "===== end capture =====\n"
      System.err.print(sb.result())
    }
    outcome
  }
}
