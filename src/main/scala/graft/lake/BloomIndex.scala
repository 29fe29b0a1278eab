package graft.lake

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, EqualNullSafe, EqualTo, Expression, In, Literal, XxHash64}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom membership indexes — the point-lookup half of data
  * skipping. Min/max stats (GraftFileIndex + Pruning) prune range
  * predicates, but on a high-cardinality key whose values interleave
  * across files (any column OTHER than the cluster key), every file's
  * [min,max] straddles every probe and nothing skips. A per-file Bloom
  * over the column answers "is value v definitely absent from this
  * file?" — so `WHERE doc_id = X` at 100 TB touches the handful of
  * files whose Bloom fires instead of every file in the table (the role
  * Delta Lake's bloom-filter indexes and Parquet's own bloom pages play;
  * here the index lives beside the manifest so pruning happens
  * driver-side before any footer is opened).
  *
  * Layout: `OPTIMIZE TABLE t BLOOM BY (col, ...)` runs ONE distributed
  * aggregate (groupBy input_file_name, one bloom_filter_agg per column —
  * Spark's own BloomFilterAggregate over xxhash64 values), writes each
  * sketch as a sidecar under `_bloom/`, and commits a new manifest
  * version whose entries carry column→sidecar mappings. Sidecars are
  * bytes-on-store (~1.2 MiB per 1M-row file at the default 8 bits/item,
  * ~2% FPP), NOT inlined in the manifest JSON — the manifest stays
  * listing-sized, and probes load only the sidecars of files that
  * survive min/max pruning, through a bounded LRU.
  *
  * Correctness: advisory and conservative. A probe drops a file only
  * when the Bloom PROVES absence; false positives just keep the file and
  * cost a scan. Rewritten files don't inherit blooms (contents changed);
  * untouched entries carried across DML commits keep theirs.
  */
object BloomIndex {

  /** Driver-side twin of the build-side `xxhash64(col)` (seed 42): the
    * hash a query literal must match in the sketch. Evaluated through
    * the same catalyst expression so representation details (UTF8String
    * bytes, Decimal scaling, timestamp micros) can never diverge. */
  def hashLiteral(l: Literal): Long =
    new XxHash64(Seq(l)).eval(null).asInstanceOf[Long]

  /** Equality probes provable from one conjunct of the scan's data
    * filters: (column name, candidate hashes). A file may be dropped
    * when, for ANY returned probe, its Bloom for that column contains
    * NONE of the hashes. Only bare `attr = lit` / `attr IN (lits)`
    * shapes qualify — a cast on the column side means the stored values
    * were hashed under a different type, so no probe is emitted. */
  def probes(pred: Expression): Seq[(String, Seq[Long])] = pred match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      probes(l) ++ probes(r)
    case EqualTo(a: AttributeReference, l: Literal) if eligible(a, l) =>
      Seq(a.name -> Seq(hashLiteral(l)))
    case EqualTo(l: Literal, a: AttributeReference) if eligible(a, l) =>
      Seq(a.name -> Seq(hashLiteral(l)))
    case EqualNullSafe(a: AttributeReference, l: Literal) if eligible(a, l) =>
      Seq(a.name -> Seq(hashLiteral(l)))
    case EqualNullSafe(l: Literal, a: AttributeReference) if eligible(a, l) =>
      Seq(a.name -> Seq(hashLiteral(l)))
    case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall {
      case l: Literal => eligible(a, l)
      case _ => false
    } =>
      Seq(a.name -> vs.map { case l: Literal => hashLiteral(l) })
    case _ => Seq.empty
  }

  private def eligible(a: AttributeReference, l: Literal): Boolean =
    l.value != null && l.dataType == a.dataType

  // Bounded cache of deserialized sidecars (each ≤ ~1.2 MiB): repeated
  // point lookups against the same table re-probe in memory. Keyed by
  // absolute sidecar path — content-immutable (sidecars are written once
  // under a fresh batch dir, never overwritten).
  private val MaxCached = 64
  private val cache =
    new java.util.LinkedHashMap[String, BloomFilter](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, BloomFilter]): Boolean =
        size() > MaxCached
    }

  private def load(root: String, rel: String): Option[BloomFilter] = {
    val key = s"$root/$rel"
    cache.synchronized { Option(cache.get(key)) } match {
      case some @ Some(_) => some
      case None =>
        try {
          val bytes = LakeIO.readBytes(LakeIO.path(root, rel))
          val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
          cache.synchronized { cache.put(key, bf) }
          Some(bf)
        } catch { case _: Exception => None } // unreadable sidecar → no pruning
    }
  }

  /** True unless the sidecar PROVES none of `hashes` is present. */
  def mightContainAny(root: String, rel: String, hashes: Seq[Long]): Boolean =
    load(root, rel) match {
      case Some(bf) => hashes.exists(bf.mightContainLong)
      case None => true
    }

  private[graft] def clearCacheForTests(): Unit =
    cache.synchronized(cache.clear())

  /** Sidecar paths (relative to root) under `_bloom/`. */
  private[graft] def listSidecars(root: String): Seq[String] = {
    val dir = LakeIO.path(root, "_bloom")
    if (!LakeIO.exists(dir)) Seq.empty
    else LakeIO.listFilesRecursive(dir).map { s =>
      val p = s.getPath.toString
      "_bloom/" + p.substring(p.indexOf("/_bloom/") + "/_bloom/".length)
    }
  }
}
