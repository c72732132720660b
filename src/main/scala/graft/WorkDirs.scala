package graft

/**
 * Per-JVM-unique scratch root for query-pack store artifacts (inverted
 * index, IVF/IVF×PQ layouts, cell stores, z-order layouts).
 *
 * These used to live at fixed names (`/tmp/graft_ivf_<sf>` …), which is a
 * cross-process race: a bench JVM and a verify JVM running concurrently at
 * the same scale factor could overwrite a store mid-read (`mode(
 * "overwrite")` deletes before it writes). `createTempDirectory` never
 * returns an existing path, so every JVM builds — and reads — only its own
 * copies; within a JVM the per-site `buildOnce`/`computeIfAbsent` guards
 * still amortize the build across bench passes. The root is removed on JVM
 * exit (best-effort, like any tmp artifact).
 */
object WorkDirs {

  lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_qp_")
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        val cs = f.listFiles()
        if (cs != null) cs.foreach(del)
        f.delete(); ()
      }
      del(p.toFile)
    }
    p
  }

  /** Absolute path of a named scratch dir under this JVM's unique root. */
  def dir(name: String): String = root.resolve(name).toString
}
