package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Thin storage-layer helper: every directory mutation an admin verb makes
  * (replaced-segment cleanup, cache resets, export copies) goes
  * through the Hadoop FileSystem API instead of `java.io.File`, so the verbs
  * behave identically on local disk and on an object store / HDFS (where
  * `java.io.File` silently sees nothing). Reads of small control files
  * (manifests, lineage) also route through here.
  *
  * Resolution uses the active Spark session's Hadoop configuration when one
  * exists (picking up any object-store credentials/committer settings) and
  * falls back to a default configuration otherwise.
  */
object Store {

  private def conf =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsOf(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf) match {
      // local FS: use the raw (non-checksum) layer — control files must
      // stay editable/restorable by plain tools without tripping stale
      // `.crc` sidecars (object stores have no client-side sidecars)
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    (fs, p)
  }

  def exists(path: String): Boolean = {
    val (fs, p) = fsOf(path)
    fs.exists(p)
  }

  /** Recursive delete; quietly a no-op when the path is absent. */
  def delete(path: String): Unit = {
    val (fs, p) = fsOf(path)
    fs.delete(p, true)
    ()
  }

  /** Child names (not paths) of a directory; empty when absent. */
  def list(path: String): Seq[String] = {
    val (fs, p) = fsOf(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** Total bytes under a path (recursive); 0 when absent. Driver-side
    * metadata op — the LSM maintenance policy sizes merge candidates from
    * file metadata, never from data scans. */
  def sizeOf(path: String): Long = {
    val (fs, p) = fsOf(path)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  def mkdirs(path: String): Unit = {
    val (fs, p) = fsOf(path)
    fs.mkdirs(p)
    ()
  }

  /** Recursive copy (dirs or files) — the export primitive. Goes through
    * `FileUtil.copy`, so source and destination may live on different
    * filesystems (local → object store and back). */
  def copy(src: String, dst: String): Unit = {
    val (sfs, sp) = fsOf(src)
    val (dfs, dp) = fsOf(dst)
    org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp, false, true, conf)
    ()
  }

  /** Read a small control file (manifest-sized) fully as UTF-8. */
  def readString(path: String): String = {
    val (fs, p) = fsOf(path)
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Overwrite a small control file with UTF-8 content. */
  def writeString(path: String, content: String): Unit = {
    val (fs, p) = fsOf(path)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
