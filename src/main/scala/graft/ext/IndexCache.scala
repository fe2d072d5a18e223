package graft.ext

import java.io.File

import org.apache.spark.sql.SparkSession

/** Build-once/serve-many materialization for persisted ANN indexes in the
  * registered-query harness.
  *
  * The production pattern at scale is: fit the index ONCE (an offline
  * job), then serve many queries against the persisted artifact —
  * `sim_topk_pq`/`sim_topk_ivf_kmeans` conflate the two because each
  * registered query must be a self-contained `(spark, sfDir) => DataFrame`.
  * The `*_index` twins split them: `ensure` builds into a cache directory
  * keyed by the SOURCE FILE's identity + fingerprint (path, length,
  * mtime — recursive for directory tables) on first use, and every later
  * call serves from the existing artifact. Under the bench's min-of-N
  * repetitions, rep 1 pays the build and the min reports pure SERVE cost;
  * a testdata regeneration changes the fingerprint and forces a rebuild
  * rather than serving stale cells.
  */
object IndexCache {

  /** Per-cache-key JVM-wide monitors: `FileChannel.lock()` only arbitrates
    * ACROSS processes — an overlapping lock request from a second thread in
    * the SAME JVM throws `OverlappingFileLockException` instead of
    * blocking, so two threads racing `ensure` for one key would crash
    * rather than queue. Serializing same-key callers on a shared monitor
    * first makes the file lock strictly cross-process.
    */
  private val keyMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def fingerprint(f: File): String = {
    def stats(x: File): Seq[String] =
      if (x.isDirectory) x.listFiles().sortBy(_.getName).toSeq.flatMap(stats)
      else Seq(s"${x.getAbsolutePath}:${x.length}:${x.lastModified}")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(stats(f).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(); ()
  }

  /** Resolve (building if needed) the cached index of `kind` over
    * `$sfDir/$table.parquet`. `build` receives the target directory and
    * must leave a complete, readable index there. `params` is the build
    * hyperparameter signature (nCells/m/ks/iters/...) and is part of the
    * cache key — without it, editing a registration's parameters would
    * silently serve the index fitted with the OLD ones.
    *
    * Concurrency: the cache lives in a shared java.io.tmpdir, and two
    * JVMs (e.g. bench and verify in parallel) can race on the same key.
    * The fast path (`_GRAFT_READY` present) is lock-free; otherwise the
    * build-and-commit runs under an exclusive cross-process FILE LOCK on
    * `<dir>.lock`, the build lands in a private `<dir>.build-<pid>`
    * staging directory, and the commit is an atomic rename onto the
    * final path with the marker already inside — so a reader either sees
    * no directory or a complete one, the lock loser finds the winner's
    * marker and serves it without rebuilding, and a partial directory
    * without the marker (crashed build, pre-fix layout) is swept under
    * the lock, never while another process could be committing or
    * reading a complete artifact over the same path.
    */
  def ensure(spark: SparkSession, sfDir: String, kind: String,
      table: String = "embeddings", params: String = "")(build: String => Unit): String = {
    val src = new File(s"$sfDir/$table.parquet")
    require(src.exists(), s"no source table at $src")
    val paramSig = if (params.isEmpty) "" else {
      val md = java.security.MessageDigest.getInstance("MD5")
      "-" + md.digest(params.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    }
    val dir = new File(
      s"${sys.props("java.io.tmpdir")}/graft_indexes/$kind-${fingerprint(src)}$paramSig")
    val ready = new File(dir, "_GRAFT_READY")
    if (ready.exists()) return dir.getAbsolutePath
    dir.getParentFile.mkdirs()
    // keyed by the FULL path: a leaf-name key would false-share one
    // monitor across unrelated cache roots that happen to collide
    val monitor = keyMonitors.computeIfAbsent(dir.getAbsolutePath, _ => new Object)
    monitor.synchronized {
      val lockCh = java.nio.channels.FileChannel.open(
        new File(dir.getParentFile, dir.getName + ".lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      // blocks until exclusive — a concurrent builder finishes, this
      // process then sees its marker and serves without a duplicate build
      val lock = lockCh.lock()
      try {
        if (!ready.exists()) {
          // sweep orphaned staging dirs from crashed past builds of THIS
          // key (we hold its lock, so none of them can be mid-commit);
          // without this a build() that threw would leak its staging dir
          // in the shared tmpdir forever
          Option(dir.getParentFile.listFiles()).getOrElse(Array.empty)
            .filter(_.getName.startsWith(dir.getName + ".build-"))
            .foreach(deleteRec)
          val staging = new File(dir.getParentFile,
            s"${dir.getName}.build-${ProcessHandle.current().pid()}-${System.nanoTime()}")
          var committed = false
          try {
            build(staging.getAbsolutePath)
            // marker BEFORE the commit rename: it travels with the
            // directory, so `ready.exists()` implies the whole artifact
            // is in place
            new File(staging, "_GRAFT_READY").createNewFile()
            // no marker under the lock ⇒ anything at the path is a crashed
            // build or the pre-fix in-place layout: safe to sweep
            if (dir.exists()) deleteRec(dir)
            require(staging.renameTo(dir), s"index cache commit failed for $dir")
            committed = true
          } finally if (!committed && staging.exists()) deleteRec(staging)
        }
      } finally { lock.release(); lockCh.close() }
    }
    dir.getAbsolutePath
  }
}
