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
    * The build therefore lands in a private `<dir>.build-<pid>` staging
    * directory and is COMMITTED by an atomic rename onto the final path —
    * the marker file inside travels with it, so a reader either sees no
    * directory, or a complete one. The rename loser deletes its staging
    * copy and serves the winner's artifact; a partial directory without
    * the marker (pre-fix layout, or a crashed build) is swept and
    * replaced rather than served.
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
    if (!ready.exists()) {
      dir.getParentFile.mkdirs()
      val staging = new File(dir.getParentFile,
        s"${dir.getName}.build-${ProcessHandle.current().pid()}-${System.nanoTime()}")
      build(staging.getAbsolutePath)
      // marker BEFORE the commit rename: it travels with the directory,
      // so `ready.exists()` implies the whole artifact is in place
      new File(staging, "_GRAFT_READY").createNewFile()
      if (!staging.renameTo(dir)) {
        if (ready.exists()) {
          // concurrent builder won the rename — serve its artifact
          deleteRec(staging)
        } else {
          // the path is occupied by a partial artifact (old in-place
          // layout, or a crashed build): sweep it and retry the commit.
          // If ANOTHER racer commits in this window the retry fails with
          // its complete artifact in place — serve that.
          deleteRec(dir)
          if (!staging.renameTo(dir)) {
            require(ready.exists(), s"index cache commit failed for $dir")
            deleteRec(staging)
          }
        }
      }
    }
    dir.getAbsolutePath
  }
}
