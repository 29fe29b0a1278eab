package graft.lake

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** All lake/catalog metadata I/O, routed through the Hadoop `FileSystem`
  * API so the storage layer is scheme-agnostic: `file://` in the sandbox,
  * HDFS / S3A / GCS / ABFS on a real cluster by configuration alone — the
  * Spark-world analog of the reference's `object_store` abstraction
  * (reference `src/object_store/factory.rs`, `src/context/delta.rs:275-380`,
  * which resolve a store per table URI the same way `Path.getFileSystem`
  * resolves a `FileSystem` per scheme).
  *
  * The `Configuration` comes from the active SparkSession's Hadoop conf, so
  * `spark.hadoop.fs.*` settings (credentials, custom scheme impls) apply to
  * manifest/catalog I/O exactly as they do to Spark's own parquet I/O —
  * metadata and data always resolve the same store.
  */
object LakeIO {

  @volatile private var confOverride: Option[Configuration] = None

  /** Test/embedding hook: force a specific Hadoop configuration. */
  def setConf(c: Configuration): Unit = confOverride = Some(c)
  def clearConf(): Unit = confOverride = None

  def conf: Configuration = confOverride.getOrElse(
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration()))

  def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def path(root: String, rel: String*): Path =
    rel.foldLeft(new Path(root))((p, r) => new Path(p, r))

  def exists(p: Path): Boolean = fs(p).exists(p)

  def isDirectory(p: Path): Boolean = {
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  def mkdirs(p: Path): Unit = fs(p).mkdirs(p)

  /** Delete a file (or, when recursive, a tree); missing path is a no-op. */
  def delete(p: Path, recursive: Boolean = false): Boolean =
    fs(p).delete(p, recursive)

  def size(p: Path): Long = fs(p).getFileStatus(p).getLen

  def listStatus(p: Path): Seq[FileStatus] = {
    val f = fs(p)
    if (!f.exists(p)) Seq.empty else f.listStatus(p).toIndexedSeq
  }

  /** Recursive file listing — one round trip on object stores (S3 LIST)
    * instead of a per-directory walk. */
  def listFilesRecursive(p: Path): Seq[FileStatus] = {
    val f = fs(p)
    if (!f.exists(p)) return Seq.empty
    val it = f.listFiles(p, true)
    val b = Seq.newBuilder[FileStatus]
    while (it.hasNext) b += it.next()
    b.result()
  }

  def readString(p: Path): String = {
    val in = fs(p).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Plain overwrite write (non-atomic; use writeAtomic for metadata that
    * concurrent readers may load). */
  def writeString(p: Path, content: String): Unit = {
    val out = fs(p).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write `content` to a same-directory temp file and rename onto
    * `target`, so readers only ever observe complete content. With
    * `failIfExists`, an existing target (or a rename lost to a concurrent
    * committer) returns false and leaves the target untouched — the
    * optimistic-concurrency primitive manifest commits rely on. On HDFS
    * and local FS the rename is atomic; object-store deployments would
    * swap this for a conditional put, behind this same call. */
  def writeAtomic(target: Path, content: String, failIfExists: Boolean): Boolean = {
    val f = fs(target)
    f.mkdirs(target.getParent)
    if (failIfExists && f.exists(target)) return false
    val tmp = new Path(target.getParent, s".${target.getName}.${UUID.randomUUID.toString.take(8)}.tmp")
    val out = f.create(tmp, false)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (failIfExists) {
      if (f.exists(target) || !f.rename(tmp, target)) { f.delete(tmp, false); false }
      else true
    } else {
      // local/HDFS rename replaces an existing target atomically; fall back
      // to delete+rename for FileSystems that refuse to clobber
      if (f.rename(tmp, target)) true
      else { f.delete(target, false); val ok = f.rename(tmp, target); if (!ok) f.delete(tmp, false); ok }
    }
  }

  /** Server-side-less copy of a single file between (possibly different)
    * FileSystems. */
  def copyFile(src: Path, dst: Path): Unit = {
    val ok = FileUtil.copy(fs(src), src, fs(dst), dst, false, true, conf)
    require(ok, s"copy $src -> $dst failed")
  }
}
