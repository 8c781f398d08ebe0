package graft.streaming

import org.apache.spark.sql.SparkSession

/** The versioned-snapshot `_CURRENT` pointer protocol, shared by every
  * streaming twin that publishes atomically-flipped artifact versions
  * ([[StreamingIvf]], [[StreamingGraph]], [[StreamingBpe]],
  * [[StreamingCoPurchase]]). One implementation because the protocol is
  * safety-critical and must evolve in lockstep:
  *
  *   - `writeCurrent` is a delete-then-rename flip — not atomic as a
  *     pair, but every intermediate state is recoverable: marker-only
  *     (old version), both (old wins until the delete), tmp-only (healed
  *     forward by `currentVersion`).
  *   - `currentVersion` heals the torn window: a crash between delete and
  *     rename leaves only `_CURRENT.tmp`, whose content is the fully
  *     materialized new version — promote it.
  */
private[streaming] object Snapshots {

  private[streaming] def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_CURRENT")

  /** Live version under `dir`, or None before the first publish; heals a
    * torn flip. `label` names the owning store in error messages.
    */
  private[streaming] def currentVersion(spark: SparkSession, dir: String, label: String): Option[Int] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs   = fsOf(spark, root)
    val m    = marker(root)
    val tmp  = m.suffix(".tmp")
    if (!fs.exists(m) && fs.exists(tmp))
      require(fs.rename(tmp, m), s"$label: failed to heal torn pointer flip at $tmp")
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  /** Flip `_CURRENT` to `v`. The new version's data dirs must be fully
    * materialized BEFORE this call — the flip is the publish.
    */
  private[streaming] def writeCurrent(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      v: Int,
      label: String
  ): Unit = {
    val m   = marker(root)
    val tmp = m.suffix(".tmp")
    val os  = fs.create(tmp, true)
    try os.write(v.toString.getBytes("UTF-8"))
    finally os.close()
    if (fs.exists(m)) fs.delete(m, false)
    require(fs.rename(tmp, m), s"$label: failed to flip $m to v=$v")
  }
}
