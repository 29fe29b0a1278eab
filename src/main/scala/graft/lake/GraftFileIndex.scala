package graft.lake

import graft.lake.Manifest.{FileEntry, TableManifest}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.{DataType, StructType}

/** Manifest-backed `FileIndex`: the table's pinned file list with
  * stats-based data skipping — the same design Delta Lake uses for its
  * scans, applied to the graft manifest (reference analog: delta-rs file
  * skipping on `Add` stats, consumed via the provider registered at
  * `src/catalog/metastore.rs:176-207`).
  *
  * `listFiles` receives the query's data filters from FileSourceStrategy
  * and drops every file whose per-column min/max/nullCount PROVE the
  * predicate can't match (`Pruning.mayMatch`) — so `SELECT ... WHERE k =
  * 5` plans a scan over only the files whose [min,max] straddle 5, before
  * any parquet footer is opened. At 100 TB this is the difference between
  * touching 3 files and touching 30,000: pruning happens on manifest
  * metadata (driver-side, O(files) over in-memory stats), and the parquet
  * row-group + page pruning below it still applies to whatever survives.
  */
class GraftFileIndex(
    root: String,
    manifest: TableManifest) extends FileIndex {

  private val schema: StructType =
    DataType.fromJson(manifest.schemaJson).asInstanceOf[StructType]

  /** Table identity for plan-based cache fingerprints: the storage UUID
    * (root's last path segment, `Catalog.tableRoot` layout) plus the
    * manifest version this scan is pinned to. */
  def tableUuid: String = root.substring(root.lastIndexOf('/') + 1)
  def version: Long = manifest.version

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def partitionSchema: StructType = StructType(Nil)

  private def status(f: FileEntry): FileStatusWithMetadata =
    FileStatusWithMetadata(new FileStatus(
      f.size, false, 1, 128L << 20, manifest.timestampMs,
      new Path(Manifest.resolveData(root, f.path))))

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val statsKept =
      if (dataFilters.isEmpty) manifest.files
      else manifest.files.filter(f =>
        dataFilters.forall(p => Pruning.mayMatch(p, f, schema)))
    // point-lookup skipping: equality/IN probes vs per-file Bloom
    // sidecars (BloomIndex) — only sidecars of stats-surviving files are
    // ever loaded, and only when the query carries an eligible probe
    val eqProbes = dataFilters.flatMap(BloomIndex.probes)
    val kept =
      if (eqProbes.isEmpty) statsKept
      else statsKept.filter { f =>
        eqProbes.forall { case (attr, hashes) =>
          f.blooms.collectFirst {
            case (c, rel) if c.equalsIgnoreCase(attr) => rel
          } match {
            case Some(rel) => BloomIndex.mightContainAny(root, rel, hashes)
            case None => true
          }
        }
      }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(status)))
  }

  override def inputFiles: Array[String] =
    manifest.files.map(f => Manifest.resolveData(root, f.path)).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = manifest.files.map(_.size).sum
}
