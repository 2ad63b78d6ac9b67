package graft

import java.nio.file.{Files, Path}

/** Scratch-directory registry: ONE JVM shutdown hook, recursive delete.
  * (`File.deleteOnExit` is a no-op on non-empty directories, and a hook
  * per call site would accumulate one thread per query.) */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach(p => delete(p.toFile))
  }))

  def register(p: Path): Unit = { hook; dirs.add(p); () }

  /** Recursive delete that NEVER follows symlinks: staged dirs contain
    * links to source data (DedupStream, EventsStream), and recursing
    * through a directory symlink would delete the TARGET's contents.
    * Only the link entry itself is removed. */
  private[graft] def delete(f: java.io.File): Unit = {
    if (f.isDirectory && !Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
