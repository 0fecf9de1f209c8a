package org.apache.spark.sql.graft

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, LocalScan,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES over a graft-lake table, addressed as an
  * extra identifier level through the catalog (Iceberg's own SQL
  * convention — `SELECT * FROM cat.db.t.files`):
  *
  *   cat.ns.t.files        — one row per live data file (path, partition,
  *                           footer row count, bytes); honors
  *                           `VERSION AS OF` (that snapshot's file set)
  *   cat.ns.t.snapshots    — the commit log (DESCRIBE HISTORY as a real,
  *                           joinable table)
  *   cat.ns.t.tags         — named refs → pinned version
  *   cat.ns.t.constraints  — CHECK constraints in force
  *
  * snapshots/tags/constraints are genuinely metadata-sized and plan as
  * [[LocalScan]]s (rows straight from the manifest at planning time,
  * LocalTableScan execution — ZERO data files opened). `files` is only
  * metadata-sized while the manifest is INLINE; once sharded it plans as
  * a distributed scan over the shard TSVs (see [[filesTable]]). Rows are
  * computed fresh per scan build, so a query always sees the current
  * metadata state.
  */
object GraftMetaTables {

  /** Metadata-table names, resolvable under `<cat>.<ns...>.<table>.` */
  val Names: Set[String] = Set("files", "snapshots", "tags", "constraints")

  def table(root: String, kind: String, versionSpec: Option[String]): Table = {
    val version = versionSpec.map(raw =>
      ManifestFileIndex.resolveVersionSpec(root, raw.trim))
    kind match {
      case "files" => filesTable(root, version)
      case "snapshots" =>
        requireNoTravel(kind, version)
        val schema = StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("committed_at", TimestampType, nullable = false),
          StructField("n_files", LongType, nullable = false),
          StructField("n_partitions", LongType, nullable = false),
          StructField("size_bytes", LongType, nullable = false)))
        meta(s"$root#snapshots", schema, () => {
          val head = ManifestFileIndex.headVersion(root).getOrElse(0)
          val ledger = ManifestFileIndex.readHistoryLedger(root)
          (1 to head).flatMap { v =>
            ledger.get(v).map { case (t, nf, np, bytes) =>
              InternalRow(v.toLong, t * 1000L, nf, np, bytes)
            }.orElse {
              ManifestFileIndex.read(root, Some(v)).map { case (_, es) =>
                val ms = ManifestFileIndex.snapshotCommitMs(root, v)
                  .getOrElse(0L) // commitMsOf falls back to mtime itself
                InternalRow(v.toLong, ms * 1000L,
                  es.size.toLong,
                  es.iterator.map(_.partValue).toSet.size.toLong,
                  es.iterator.map(_.size).sum)
              }
            }
          }.toArray
        })
      case "tags" =>
        requireNoTravel(kind, version)
        val schema = StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
        meta(s"$root#tags", schema, () =>
          ManifestFileIndex.listRefs(root).toSeq.sortBy(_._1).map {
            case (n, v) => InternalRow(UTF8String.fromString(n), v.toLong)
          }.toArray)
      case "constraints" =>
        requireNoTravel(kind, version)
        val schema = StructType(Seq(
          StructField("constraint", StringType, nullable = false),
          StructField("expr", StringType, nullable = false)))
        meta(s"$root#constraints", schema, () =>
          ManifestFileIndex.listConstraints(root).map { case (n, e) =>
            InternalRow(UTF8String.fromString(n), UTF8String.fromString(e))
          }.toArray)
      case other => sys.error(s"unknown metadata table '$other'")
    }
  }

  private val FilesSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("partition", StringType, nullable = false),
    StructField("num_rows", LongType, nullable = true),
    StructField("size_bytes", LongType, nullable = false)))

  private def fileRow(relPath: String, partValue: String,
      rowCount: Long, size: Long): InternalRow =
    InternalRow(UTF8String.fromString(relPath), UTF8String.fromString(partValue),
      if (rowCount >= 0L) rowCount else null, size)

  /** The `files` inventory. An INLINE manifest plans as a LocalScan
    * (driver-held rows, LocalTableScan execution — metadata-sized by the
    * shard threshold's own definition). A SHARDED manifest plans as a
    * DISTRIBUTED scan: one input partition per immutable shard file,
    * parsed on the executors — the driver holds only the shard-ref list
    * (O(#shards)). A table shards precisely when its inventory outgrew
    * single-process metadata, and `t.files` must not defeat that by
    * re-materializing the whole inventory as a driver array (r10
    * verdict: fine at 400k files ≈ 40 MB, a driver bottleneck at
    * multi-million-file tables).
    */
  private def filesTable(root: String, travel: Option[Int]): Table =
    new Table with SupportsRead {
      override def name(): String = s"$root#files"
      override def schema(): StructType = FilesSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = {
            // resolved at build time: every query sees current metadata
            val (_, inline, refs) = ManifestFileIndex.readList(root, travel)
              .getOrElse(sys.error(s"no committed manifest under $root"))
            if (refs.isEmpty)
              new LocalScan {
                private val data = inline.sortBy(_.relPath)
                  .map(e => fileRow(e.relPath, e.partValue, e.rowCount, e.size))
                  .toArray
                override def rows(): Array[InternalRow] = data
                override def readSchema(): StructType = FilesSchema
              }
            else new FilesShardScan(root, inline, refs)
          }
        }
    }

  /** Distributed `files` scan over a sharded manifest (see above). */
  private class FilesShardScan(root: String,
      inline: Seq[ManifestFileIndex.Entry],
      refs: Seq[ManifestFileIndex.ShardRef]) extends Scan with Batch {
    override def readSchema(): StructType = FilesSchema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val shardParts = refs.map(r => FilesShardPartition(
        root, r.name, r.minDir, r.maxDir, r.nEntries, r.nParts, r.nBytes)
        : InputPartition).toArray
      if (inline.isEmpty) shardParts
      else shardParts :+ (FilesInlinePartition(inline.map(e =>
        (e.relPath, e.partValue, e.rowCount, e.size)).toArray): InputPartition)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new FilesReaderFactory
  }

  /** One immutable shard file, re-read (and LRU-cached) where the reader
    * runs. Shard files live on the same shared storage as the data files
    * — an executor that can open the parquet can open the shard TSV.
    */
  private case class FilesShardPartition(root: String, name: String,
      minDir: String, maxDir: String, nEntries: Long, nParts: Long,
      nBytes: Long) extends InputPartition

  /** The manifest list's inline entries (recent small commits not yet
    * folded into a shard) — already metadata-sized, shipped as values.
    */
  private case class FilesInlinePartition(
      rows: Array[(String, String, Long, Long)]) extends InputPartition

  private class FilesReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val it: Iterator[InternalRow] = p match {
        case FilesShardPartition(root, name, minDir, maxDir, ne, np, nb) =>
          ManifestFileIndex.readShardEntries(root,
            ManifestFileIndex.ShardRef(name, minDir, maxDir, ne, np, nb))
            .iterator.map(e => fileRow(e.relPath, e.partValue, e.rowCount, e.size))
        case FilesInlinePartition(rows) =>
          rows.iterator.map { case (rp, pv, rc, sz) => fileRow(rp, pv, rc, sz) }
        case other => sys.error(s"unexpected partition $other")
      }
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean =
          if (it.hasNext) { cur = it.next(); true } else false
        override def get(): InternalRow = cur
        override def close(): Unit = ()
      }
    }
  }

  /** Only `files` is snapshot-scoped; the others describe CURRENT table
    * state (the commit log, refs and constraints are not themselves
    * versioned) — a travel spec on them must refuse, not silently answer
    * head.
    */
  private def requireNoTravel(kind: String, version: Option[Int]): Unit =
    require(version.isEmpty,
      s"metadata table '$kind' does not support VERSION/TIMESTAMP AS OF " +
        "(only 'files' is snapshot-scoped)")

  private def meta(tableName: String, tableSchema: StructType,
      compute: () => Array[InternalRow]): Table =
    new Table with SupportsRead {
      override def name(): String = tableName
      override def schema(): StructType = tableSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = new LocalScan {
            // computed at build time: every query sees current metadata
            private val data = compute()
            override def rows(): Array[InternalRow] = data
            override def readSchema(): StructType = tableSchema
          }
        }
    }
}
