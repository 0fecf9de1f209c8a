package org.apache.spark.sql.graft

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
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
  * Each is a [[LocalScan]]: the rows come straight from the manifest at
  * planning time and execute as a LocalTableScan — ZERO data files
  * opened, exactly like the SHOW/DESCRIBE commands these tables make
  * composable (joins, aggregates, WHERE over file inventories — the ops
  * queries a 400k-file table's maintenance cron actually runs). Rows are
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
      case "files" =>
        val schema = StructType(Seq(
          StructField("file", StringType, nullable = false),
          StructField("partition", StringType, nullable = false),
          StructField("num_rows", LongType, nullable = true),
          StructField("size_bytes", LongType, nullable = false)))
        meta(s"$root#files", schema, () => {
          val entries = ManifestFileIndex.read(root, version).map(_._2)
            .getOrElse(sys.error(s"no committed manifest under $root"))
          entries.sortBy(_.relPath).map { e =>
            InternalRow(UTF8String.fromString(e.relPath),
              UTF8String.fromString(e.partValue),
              if (e.rowCount >= 0L) e.rowCount else null,
              e.size)
          }.toArray
        })
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
                val snap = new java.io.File(
                  s"$root/${ManifestFileIndex.SnapshotDir}", s"manifest-$v.tsv")
                InternalRow(v.toLong, snap.lastModified() * 1000L,
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
