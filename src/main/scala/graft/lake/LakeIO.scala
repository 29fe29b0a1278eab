package graft.lake

import java.io.{FileNotFoundException, IOException}
import java.nio.charset.StandardCharsets
import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

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
  *
  * Call-count economy: every helper issues exactly ONE metadata round trip
  * (getFileStatus / listStatus and catch FileNotFoundException) rather than
  * an exists() pre-check plus the real call — on object stores each
  * avoided round trip is a billable request and ~10-100 ms of latency.
  */
object LakeIO {

  @volatile private var confOverride: Option[Configuration] = None

  /** Test/embedding hook: force a specific Hadoop configuration. */
  def setConf(c: Configuration): Unit = confOverride = Some(c)
  def clearConf(): Unit = confOverride = None

  /** I/O telemetry (specs assert call-count bounds on metadata-resolution
    * paths; negligible overhead in production). */
  val fileReads = new AtomicLong
  val listCalls = new AtomicLong

  def conf: Configuration = confOverride.getOrElse(
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration()))

  def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def path(root: String, rel: String*): Path =
    rel.foldLeft(new Path(root))((p, r) => new Path(p, r))

  /** Single-round-trip stat; None for a missing path. */
  def statusOpt(p: Path): Option[FileStatus] =
    try Some(fs(p).getFileStatus(p))
    catch { case _: FileNotFoundException => None }

  def exists(p: Path): Boolean = statusOpt(p).isDefined

  def isDirectory(p: Path): Boolean = statusOpt(p).exists(_.isDirectory)

  def mkdirs(p: Path): Unit = fs(p).mkdirs(p)

  /** Delete a file (or, when recursive, a tree); missing path is a no-op. */
  def delete(p: Path, recursive: Boolean = false): Boolean =
    fs(p).delete(p, recursive)

  def size(p: Path): Long = fs(p).getFileStatus(p).getLen

  /** One LIST call; empty for a missing directory. */
  def listStatus(p: Path): Seq[FileStatus] = {
    listCalls.incrementAndGet()
    try fs(p).listStatus(p).toIndexedSeq
    catch { case _: FileNotFoundException => Seq.empty }
  }

  /** Recursive file listing — one round trip on object stores (S3 LIST)
    * instead of a per-directory walk; empty for a missing directory.
    *
    * LIVE-TREE tolerance: callers (vacuum's data-file sweep) list roots
    * that concurrent committers are mutating — a file can vanish between
    * the LIST page and the iterator's lazy stat of it (on the local FS
    * that surfaces as a RuntimeException from the permission loader, not
    * FileNotFoundException — caught live by ManifestRaceSpec's gc-churn
    * test on a manifest commit's .tmp rename). A vanished entry just
    * means the snapshot is already stale there; retry the listing, and
    * if the tree churns faster than listFiles can walk it, fall back to
    * a per-directory listStatus walk that skips vanished entries
    * individually instead of aborting the whole listing. */
  def listFilesRecursive(p: Path): Seq[FileStatus] = {
    def attempt(): Seq[FileStatus] = {
      listCalls.incrementAndGet()
      val it = fs(p).listFiles(p, true)
      val b = Seq.newBuilder[FileStatus]
      while (it.hasNext) b += it.next()
      b.result()
    }
    def walk(dir: Path): Seq[FileStatus] =
      listStatus(dir).flatMap { st => // listStatus: empty on vanished dir
        if (st.isDirectory) walk(st.getPath) else Seq(st)
      }
    var tries = 0
    while (tries < 3) {
      tries += 1
      try return attempt()
      catch {
        case _: FileNotFoundException => return Seq.empty
        case scala.util.control.NonFatal(_) if tries < 3 => () // churn: retry
        case scala.util.control.NonFatal(_) => return walk(p)
      }
    }
    walk(p) // unreachable; keeps the compiler's definite-return analysis happy
  }

  def readString(p: Path): String = {
    fileReads.incrementAndGet()
    val in = fs(p).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  def readBytes(p: Path): Array[Byte] = {
    fileReads.incrementAndGet()
    val in = fs(p).open(p)
    try in.readAllBytes()
    finally in.close()
  }

  /** Plain overwrite byte write (write-once sidecar payloads). */
  def writeBytes(p: Path, content: Array[Byte]): Unit = {
    val out = fs(p).create(p, true)
    try out.write(content)
    finally out.close()
  }

  /** Plain overwrite write (non-atomic; use writeAtomic for metadata that
    * concurrent readers may load). */
  def writeString(p: Path, content: String): Unit = {
    val out = fs(p).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write `content` to a same-directory temp file and rename onto
    * `target`, so readers only ever observe complete content.
    *
    * With `failIfExists` — the optimistic-concurrency primitive manifest
    * and catalog commits rely on — the guarantee is per-FileSystem:
    *
    *  - HDFS: the two-arg rename fails when the destination exists, so a
    *    lost race is detected by the rename itself (true atomicity).
    *  - local / Checksum FS: rename(2) silently REPLACES an existing
    *    destination, so the publish step is link(2) instead — a hard
    *    link of the written temp onto the target is KERNEL-atomic and
    *    fails with EEXIST when the target already exists. This is
    *    create-if-absent with full content visibility, correct under
    *    cross-PROCESS contention (ManifestRaceSpec races two JVMs on
    *    it; the earlier exists-check + rename + content-verify scheme
    *    had a two-winner interleaving that real contention could hit).
    *    Filesystems without hard links fall back to rename + verify.
    *  - S3A/GCS: rename is copy+delete (not atomic); deployments there
    *    should layer a conditional-put/DynamoDB-style commit service
    *    behind this same call.
    *
    * Returns false ONLY for a detected lost race (target exists with other
    * content); genuine I/O failures propagate as IOException so callers
    * don't misreport them as concurrent commits. */
  def writeAtomic(target: Path, content: String, failIfExists: Boolean): Boolean = {
    val f = fs(target)
    f.mkdirs(target.getParent)
    val tmp = new Path(target.getParent, s".${target.getName}.${UUID.randomUUID.toString.take(8)}.tmp")
    val out = f.create(tmp, false)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (failIfExists) {
      val isLocal = f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
        f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
      if (isLocal) {
        // link(2): atomic create-if-absent publish of the complete temp
        // content; EEXIST IS the lost-race signal, no window at all
        val linked =
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(target.toUri.getPath),
              java.nio.file.Paths.get(tmp.toUri.getPath))
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            // No hard links on this mount: the JDK reports that as
            // UnsupportedOperationException only for providers that
            // declare it; on Linux, CIFS/SMB, VFAT and some FUSE/overlay
            // mounts surface EPERM ("Operation not permitted") as a
            // generic FileSystemException instead. ONLY those downgrade
            // to the legacy rename+verify publish — a transient
            // AccessDenied/EIO must propagate loudly, never silently
            // re-enter the racy rename path the link() publish exists to
            // replace (FileAlreadyExistsException is excluded above —
            // that IS the lost-race signal).
            case _: UnsupportedOperationException =>
              return renamePublish(f, tmp, target, content)
            case e: java.nio.file.FileSystemException =>
              if (isNoHardLinks(e)) return renamePublish(f, tmp, target, content)
              probeHardLinks(
                java.nio.file.Paths.get(tmp.toUri.getPath).getParent,
                java.nio.file.Paths.get(target.toUri.getPath).getParent) match {
                case Some(false) => return renamePublish(f, tmp, target, content)
                // Some(true): links demonstrably work on this dir pair,
                // so e is a REAL I/O failure — propagate it. None: the
                // probe itself could not run (unwritable dir, disk
                // full) and proved nothing — propagate rather than
                // silently re-enter the racy rename path.
                case _ => throw e
              }
          } finally {
            // drop the temp either way (link copies nothing; the target
            // now shares the inode). Checksum sidecar goes with it —
            // LocalFileSystem reads fine without a .crc.
            try f.delete(tmp, false) catch { case scala.util.control.NonFatal(_) => () }
          }
        linked
      } else renamePublish(f, tmp, target, content)
    } else {
      // overwrite mode: local rename replaces the target atomically; HDFS
      // two-arg rename refuses a live destination, so fall back to
      // delete+rename there. Callers needing crash-safe overwrite under
      // concurrency should version files and resolve latest instead
      // (Catalog does exactly that).
      if (f.rename(tmp, target)) true
      else { f.delete(target, false); val ok = f.rename(tmp, target); if (!ok) f.delete(tmp, false); ok }
    }
  }

  /** EPERM-shaped link(2) failures — what Linux mounts without hard-link
    * support (CIFS/SMB, VFAT, some FUSE/overlay) report instead of
    * UnsupportedOperationException. Matched narrowly by reason text so
    * genuine I/O failures (EACCES, EIO, ENOSPC) keep propagating. */
  private def isNoHardLinks(e: java.nio.file.FileSystemException): Boolean = {
    val r = String.valueOf(e.getReason).toLowerCase(java.util.Locale.ROOT)
    r.contains("operation not permitted") || r.contains("not supported") ||
      r.contains("invalid cross-device link")
  }

  /** (supported, nanoTime re-probe deadline). Positives carry
    * Long.MaxValue — hard-link support is a property of the mount, it
    * never degrades. Negatives EXPIRE: a probe that failed transiently
    * (brief EIO, ENOSPC on the inode table) must not forever route a
    * link-capable filesystem onto the legacy rename+verify publish —
    * that would both mask genuine I/O errors and silently re-open the
    * two-winner rename race the link(2) publish exists to eliminate. */
  private val hardLinkProbe =
    new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Long)]()
  private[lake] val NegativeProbeTtlNanos = 60L * 1000 * 1000 * 1000

  /** Locale-independent hard-link capability check, cached per
    * (src-dir, dst-dir) pair: strerror text follows LC_MESSAGES, so on a
    * non-English locale the EPERM a CIFS/VFAT/FUSE mount reports wouldn't
    * match isNoHardLinks and the publish would fail loudly instead of
    * downgrading. Instead, link a scratch file from srcDir into dstDir
    * and remember the answer (keyed on both dirs so the EXDEV
    * cross-device case is probed faithfully).
    *
    * Three-valued: Some(true) = links work here (cached permanently);
    * Some(false) = the probe's own link failed, capability-shaped
    * (cached for [[NegativeProbeTtlNanos]], then re-probed); None = the
    * probe could not run at all (scratch file creation failed — dir
    * unwritable, disk full). None is NEVER cached and the caller must
    * propagate its original exception rather than downgrade: a probe
    * that never linked anything proved nothing about capability. */
  private[lake] def probeHardLinks(srcDir: java.nio.file.Path,
                                   dstDir: java.nio.file.Path,
                                   negativeTtlNanos: Long = NegativeProbeTtlNanos): Option[Boolean] = {
    if (srcDir == null || dstDir == null) return None
    val key = srcDir.toString + "\u0000" + dstDir.toString
    val cached = hardLinkProbe.get(key)
    if (cached != null && (cached._1 || System.nanoTime() < cached._2))
      return Some(cached._1)
    var src: java.nio.file.Path = null
    try src = java.nio.file.Files.createTempFile(srcDir, ".graft-linkprobe", ".tmp")
    catch { case scala.util.control.NonFatal(_) => return None }
    var dst: java.nio.file.Path = null
    try {
      dst = dstDir.resolve(src.getFileName.toString + ".lnk")
      try {
        java.nio.file.Files.createLink(dst, src)
        hardLinkProbe.put(key, (true, Long.MaxValue))
        Some(true)
      } catch {
        case scala.util.control.NonFatal(_) =>
          hardLinkProbe.put(key, (false, System.nanoTime() + negativeTtlNanos))
          Some(false)
      }
    } finally {
      if (dst != null)
        try java.nio.file.Files.deleteIfExists(dst)
        catch { case scala.util.control.NonFatal(_) => () }
      try java.nio.file.Files.deleteIfExists(src)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Legacy publish for FileSystems without hard links: exists-check +
    * rename + content-verify. HDFS's no-clobber rename makes this truly
    * atomic there; elsewhere it only narrows the race window (see
    * writeAtomic's scaladoc). */
  private def renamePublish(f: FileSystem, tmp: Path, target: Path,
                            content: String): Boolean = {
    if (f.exists(target)) { f.delete(tmp, false); return false }
    val renamed =
      try f.rename(tmp, target)
      catch { case e: IOException => f.delete(tmp, false); throw e }
    if (!renamed) {
      f.delete(tmp, false)
      // distinguish a lost race from a real I/O failure (permissions,
      // quota, transient store error): only the former returns false
      if (f.exists(target)) false
      else throw new IOException(s"rename $tmp -> $target failed with no concurrent commit present")
    } else {
      // rename may clobber silently: winning the rename doesn't prove
      // we won the race — verify the target holds our bytes
      try readString(target) == content catch { case _: FileNotFoundException => false }
    }
  }

  /** Server-side-less copy of a single file between (possibly different)
    * FileSystems. */
  def copyFile(src: Path, dst: Path): Unit = {
    val ok = FileUtil.copy(fs(src), src, fs(dst), dst, false, true, conf)
    require(ok, s"copy $src -> $dst failed")
  }
}
