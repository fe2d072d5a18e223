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

  /** Resolve (building if needed) the cached index of `kind` over
    * `$sfDir/$table.parquet`. `build` receives the target directory and
    * must leave a complete, readable index there. `params` is the build
    * hyperparameter signature (nCells/m/ks/iters/...) and is part of the
    * cache key — without it, editing a registration's parameters would
    * silently serve the index fitted with the OLD ones.
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
      dir.mkdirs()
      build(dir.getAbsolutePath)
      // marker last: a crash mid-build leaves no marker and the next call
      // rebuilds over the partial artifact (all writers use overwrite)
      ready.createNewFile()
    }
    dir.getAbsolutePath
  }
}
