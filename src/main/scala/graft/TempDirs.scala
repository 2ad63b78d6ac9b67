package graft

import java.nio.file.Path

/** Scratch-directory registry: ONE JVM shutdown hook, recursive delete.
  * (`File.deleteOnExit` is a no-op on non-empty directories, and a hook
  * per call site would accumulate one thread per query.) */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach(p => delete(p.toFile))
  }))

  def register(p: Path): Unit = { hook; dirs.add(p); () }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete(): Unit
  }
}
