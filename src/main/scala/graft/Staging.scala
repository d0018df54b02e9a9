package graft

/** JVM-lifetime staging of deterministic intermediate parquet dirs shared
  * across bench repeats (the stagedFrame / ensureEncoded convention): built
  * once per key, read back after. Centralizes the three lifecycle concerns
  * the ad-hoc per-map versions each half-handled:
  *  - per-KEY build locking (`ConcurrentHashMap.compute` bin locks) —
  *    unrelated stagings no longer serialize behind one build;
  *  - deletion at JVM exit (shutdown hook) — staged corpora no longer
  *    accumulate in the system temp dir across processes;
  *  - an input-content fingerprint folded into the key, so inputs
  *    regenerated at the SAME path mid-JVM re-stage instead of silently
  *    serving the stale corpus.
  * Use ONLY for inputs whose derivation is priced by another declared key
  * (staging away a key's own gated semantics would hollow the slot). */
private[graft] object Staging {
  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.values.forEach { d =>
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      catch { case _: Exception => () }
    }
  }))

  /** Content fingerprint of input paths: (name, size, mtime) per file, one
    * listing level deep — enough to catch a regenerated parquet table at an
    * unchanged path. Metadata-only; never reads file contents. */
  def fingerprint(paths: Seq[String]): String = {
    val parts = paths.flatMap { p =>
      val f = new java.io.File(p)
      val entries =
        if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
          .sortBy(_.getName)
        else Seq(f)
      entries.map(x => s"${x.getName}:${x.length}:${x.lastModified}")
    }
    java.lang.Long.toHexString(
      parts.foldLeft(1125899906842597L)((h, s) => 31 * h + s.hashCode))
  }

  /** Staged dir for `key`: reuse if already built and still on disk,
    * otherwise run `build` into a fresh temp dir. Callers fold the input
    * identity (path + [[fingerprint]]) and any algorithm identity (codec,
    * layout params) into `key`. */
  def dirFor(key: String, prefix: String)(build: String => Unit): String =
    dirs.compute(key, (_, d0) =>
      if (d0 != null && new java.io.File(d0).exists()) d0
      else {
        val d = java.nio.file.Files.createTempDirectory(prefix).toString
        build(d)
        d
      })
}
