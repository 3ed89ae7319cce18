package graft

/** Per-process scratch roots for the persisted-index lifecycles
  * (a12/a13/s25 ANN, d9/s26 LSH) and their streaming temp dirs.
  *
  * Two defects this closes (ADVICE r14):
  *  - The index warehouses lived at a FIXED machine-global path
  *    (java.io.tmpdir/graft_*_index) while the build/fold coherence
  *    guard (ConcurrentHashMap + object synchronized) is JVM-local —
  *    two concurrent bench/test processes on one host could
  *    interleave writes into the same bands/sets directories and
  *    serve a mixed-generation index. Keying the root by PID makes
  *    the on-disk generations as process-private as the guard.
  *  - Streaming serve paths created temp dirs per invocation and
  *    never removed them. Every dir minted here is registered for
  *    recursive deletion in one JVM shutdown hook, so repeated runs
  *    do not accumulate under java.io.tmpdir.
  */
private[graft] object TmpDirs {

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[java.nio.file.Path, java.lang.Boolean]())

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => deleteRecursively(p))
    }, "graft-tmpdirs-cleanup"))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    // Best-effort at exit, and per-DIRECTORY total: Files.walk surfaces
    // I/O failures as UncheckedIOException (not IOException), and
    // Spark's own shutdown hooks may be tearing down checkpoint dirs
    // under these roots concurrently — one failing walk must not kill
    // the hook thread and leak every remaining registered dir.
    try {
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f =>
            try { java.nio.file.Files.deleteIfExists(f); () }
            catch { case _: Throwable => () })
        finally walk.close()
      }
    } catch { case _: Throwable => () }

  /** A process-private root directory under java.io.tmpdir, created
    * on first use and deleted (recursively) at JVM exit. The same
    * `name` returns the same path within one process — callers layer
    * their own per-corpus/per-generation structure beneath it. */
  def processRoot(name: String): String = {
    hook
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"${name}_${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(p)
    registered.add(p)
    p.toString
  }

  /** A fresh temp dir under the process root — unique per call,
    * cleaned up with the root at exit. */
  def scratch(name: String): String = {
    val root = java.nio.file.Paths.get(processRoot(name + "_scratch"))
    java.nio.file.Files.createTempDirectory(root, name).toString
  }
}
