package graft.lake

import org.apache.hadoop.fs.Path

/** The ONE atomicity primitive the lake commit protocol needs:
  * put-if-absent of a complete, immutable object. Everything else in the
  * protocol (optimistic retry against the next version, hint checkpoints,
  * cache seeding) is built on top and store-agnostic.
  *
  * Implementations by deployment:
  *  - [[FileSystemCommitStore]] (default): Hadoop FileSystem — hard-link
  *    publish on local FS (kernel-atomic create-if-absent), no-clobber
  *    rename on HDFS. What ManifestRaceSpec races across two JVMs.
  *  - S3 / GCS / Azure: rename is copy+delete there, NOT atomic — bind
  *    this trait to the store's conditional write instead: S3
  *    `PutObject` with `If-None-Match: *` (412 ⇒ lost race), GCS
  *    `ifGenerationMatch=0`, Azure `If-None-Match: *` — or a
  *    DynamoDB-style coordination table when the bucket predates
  *    conditional writes (Delta's S3DynamoDBLogStore pattern; reference
  *    lean: src/context/delta.rs relies on Delta's LogStore protocol the
  *    same way). [[InMemoryCommitStore]] models these single-round-trip
  *    conditional-put semantics and proves the protocol yields a single
  *    winner per version under thread-level contention (ManifestRaceSpec).
  */
trait CommitStore {

  /** Atomically publish `content` at `path` iff nothing exists there.
    * Returns false ONLY for a detected lost race (the path already holds
    * a committed object); genuine I/O failures must propagate as
    * exceptions so callers don't misreport them as concurrent commits. */
  def putIfAbsent(path: Path, content: String): Boolean

  /** Overwrite publish for advisory objects (version hints): last writer
    * wins, readers tolerate lag/loss. */
  def put(path: Path, content: String): Unit

  /** True when objects committed through this store are readable back
    * via LakeIO at the same path — the capability Manifest.commit's
    * cache seeding relies on (the first post-write snapshot rebuild then
    * reads zero manifests). Wrappers/decorators over a readable store
    * should return their delegate's value; stores whose objects live
    * elsewhere (the in-memory test store) return false. */
  def readableViaLakeIO: Boolean = false

  /** Read back an advisory object; None when absent (or the store can't
    * read). Used by the MONOTONE hint update (Manifest.refreshHint) so a
    * slow committer's late hint write can't regress the checkpoint. */
  def getOpt(path: Path): Option[String] = None
}

/** Default store: the Hadoop FileSystem commit path (see
  * LakeIO.writeAtomic for the per-FS atomicity ladder). */
object FileSystemCommitStore extends CommitStore {
  override def putIfAbsent(path: Path, content: String): Boolean =
    LakeIO.writeAtomic(path, content, failIfExists = true)
  override def put(path: Path, content: String): Unit = {
    LakeIO.writeAtomic(path, content, failIfExists = false); ()
  }
  override def readableViaLakeIO: Boolean = true
  override def getOpt(path: Path): Option[String] =
    if (LakeIO.exists(path)) Some(LakeIO.readString(path)) else None
}

/** Conditional-put semantics in memory: one atomic compare-and-insert per
  * call, exactly the contract of S3 `If-None-Match: *` / GCS
  * `ifGenerationMatch=0`. Used by ManifestRaceSpec to hammer the commit
  * protocol with many threads and prove single-winner + loser-retry
  * without any filesystem in the loop. */
final class InMemoryCommitStore extends CommitStore {
  private val objects = new java.util.concurrent.ConcurrentHashMap[String, String]()

  override def putIfAbsent(path: Path, content: String): Boolean =
    objects.putIfAbsent(path.toString, content) == null

  override def put(path: Path, content: String): Unit = {
    objects.put(path.toString, content); ()
  }

  def get(path: Path): Option[String] = Option(objects.get(path.toString))
  override def getOpt(path: Path): Option[String] = get(path)
  def size: Int = objects.size()
}
