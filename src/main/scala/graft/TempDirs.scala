package graft

/** Shared recursive temp-dir delete for the measurement mains and
  * specs (one copy — the review-r13 dedup; SparkEntry's shutdown
  * sweep and ScaleGen's Using.resource walk are the other two
  * sanctioned deleters). Closes the Files.walk stream (an unclosed
  * walk holds directory handles until GC) and never throws: cleanup
  * in a finally must not mask the real failure. */
private[graft] object TempDirs {
  def rmTree(p: java.nio.file.Path): Unit =
    try {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => try { java.nio.file.Files.deleteIfExists(f); () }
          catch { case _: Throwable => () })
      finally s.close()
    } catch { case _: Throwable => () }
}
