package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Tracked scratch directories for queries that exercise a persisted
  * index lifecycle per execution (q164–q166 build a real on-disk index
  * v1, upgrade it, and serve it — the cost IS the gate). The result
  * DataFrames read from these dirs lazily, so deletion must wait until
  * the JVM is done with them: one shutdown hook removes every tracked
  * dir recursively. Before this, a Bench run leaked ~9 index trees into
  * /tmp per rep (round-11 verdict housekeeping item).
  */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach { p =>
        try {
          if (Files.exists(p)) {
            // Files.walk holds a directory handle until closed — close it
            // even when a delete throws, or cleanup itself leaks one
            // handle per tracked dir.
            val walk = Files.walk(p)
            try walk.sorted(Comparator.reverseOrder[Path]())
              .forEach(f => { try Files.deleteIfExists(f) catch { case _: Exception => () } })
            finally walk.close()
          }
        } catch { case _: Exception => () }
      }
    }, "graft-tempdir-cleanup"))
    true
  }

  /** Create a temp directory deleted recursively at JVM exit. */
  def create(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
