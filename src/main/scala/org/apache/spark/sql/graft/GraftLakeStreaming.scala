package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan

/** The graft lake as a STRUCTURED STREAMING SOURCE (Delta streaming-table
  * parity; the reference's Kafka→Flink ingest loop consumed this way,
  * weather-aggregation.sql:8-17): offsets are snapshot VERSIONS, a
  * micro-batch is the manifest diff between two snapshots, and the rows
  * are read by Spark's own vectorized parquet machinery.
  *
  * `spark.readStream.format("graft-lake").load(path)` starts at version 0
  * (full backfill as the first batch — resume from a checkpoint skips it),
  * then each poll of `latestOffset` picks up whatever snapshots the
  * single-writer committed since, and `planInputPartitions(v₁, v₂)` plans
  * EXACTLY the files those commits added — no directory listing, no
  * re-scan of the table, no duplicate delivery (appends never rewrite
  * files; checkpointed offsets make restarts exactly-once downstream of a
  * replayable sink). At 100 TB the per-batch planning cost is the size of
  * the increment's manifest delta, never the table.
  *
  * NON-APPEND commits (mergeInto/deleteWhere/optimizeZOrder/
  * compactSnapshots) REMOVE files from the manifest; their m{v}-rewrite
  * files are not inserts, and silently streaming them would re-deliver
  * whole rewritten partitions as phantom rows. Like Delta, the stream
  * FAILS on a change commit in the streamed range unless
  * `.option("skipChangeCommits", true)` is set, in which case the whole
  * offending commit (its removals AND its added rewrite files) is
  * skipped and only pure-append commits flow.
  *
  * ADMISSION CONTROL: `.option("maxFilesPerTrigger", n)` (or a
  * Trigger.AvailableNow read limit) chunks backfill and catch-up by
  * snapshot version — each micro-batch ends at the last version whose
  * cumulative added-file count fits the cap (always ≥ 1 version, so
  * progress is guaranteed). Without it the first trigger would plan the
  * entire table as one batch.
  *
  * Implementation: each batch builds a [[ManifestFileIndex]] restricted to
  * the ADDED files and plans through a copy of the batch `ParquetScan`
  * pinned to that index — bin-packing, vectorized reading and column
  * pruning are all inherited, not reimplemented.
  */
class GraftLakeMicroBatchStream(scan: ParquetScan, root: String, partCol: String,
    skipChangeCommits: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None)
  extends MicroBatchStream with SupportsAdmissionControl {

  private def head: Int = ManifestFileIndex.headVersion(root).getOrElse(0)

  override def initialOffset(): Offset = GraftVersionOffset(0)
  override def latestOffset(): Offset = GraftVersionOffset(head)
  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset = GraftVersionOffset(head)

  /** Rate-limited head: walk versions from `start`, accumulating each
    * commit's added-file count, and stop at the last version that fits
    * the cap — never zero progress (the first available commit is always
    * admitted even if it alone exceeds the cap, e.g. the v1 backfill).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startV = start.asInstanceOf[GraftVersionOffset].v
    val h = head
    val cap = limit match {
      case mf: ReadMaxFiles => Some(mf.maxFiles())
      case _                => None
    }
    cap match {
      case None => GraftVersionOffset(h)
      case Some(mx) =>
        var v = startV
        var files = 0
        var prev = entriesAt(v).map(_.relPath).toSet
        var stop = false
        while (!stop && v < h) {
          val next = entriesAt(v + 1).map(_.relPath).toSet
          val added = (next -- prev).size
          if (files > 0 && files + added > mx) stop = true
          else {
            files += added; prev = next; v += 1
            if (files >= mx) stop = true
          }
        }
        GraftVersionOffset(v)
    }
  }

  private def entriesAt(v: Int): Seq[ManifestFileIndex.Entry] =
    if (v <= 0) Seq.empty
    else ManifestFileIndex.read(root, Some(v)).map(_._2).getOrElse(Seq.empty)

  private def scanFor(entries: Seq[ManifestFileIndex.Entry]): ParquetScan =
    scan.copy(
      fileIndex = new ManifestFileIndex(scan.sparkSession, new Path(root),
        entries, partCol, Some(scan.readSchema())),
      partitionFilters = Seq.empty, dataFilters = Seq.empty)

  /** The commits of (start, end], walked ONE AT A TIME so a change commit
    * is detected even when the endpoint diff would hide it (a file added
    * then rewritten inside the range). Append commits contribute their
    * added files; change commits throw, or are skipped whole under
    * `skipChangeCommits`.
    */
  private def addedIn(startV: Int, endV: Int): Seq[ManifestFileIndex.Entry] = {
    val out = Seq.newBuilder[ManifestFileIndex.Entry]
    var prev = entriesAt(startV).map(_.relPath).toSet
    var v = startV
    while (v < endV) {
      val next = entriesAt(v + 1)
      val nextPaths = next.map(_.relPath).toSet
      val removed = prev -- nextPaths
      // a merge-on-read delete commit adds/removes NO files — only a
      // deletion-vector line — so the file diff alone would stream it as
      // an empty append while rows logically vanished
      val dvChanged = ManifestFileIndex.readDvs(root, Some(v + 1)) !=
        ManifestFileIndex.readDvs(root, Some(v))
      if (removed.isEmpty && !dvChanged)
        out ++= next.filterNot(e => prev.contains(e.relPath))
      else if (!skipChangeCommits)
        throw new IllegalStateException(
          s"graft-lake stream: commit v${v + 1} under $root is not append-only " +
          (if (removed.nonEmpty)
            s"(${removed.size} file(s) removed/rewritten — a MERGE/DELETE/OPTIMIZE). "
          else
            "(deletion vectors changed — a merge-on-read DELETE). ") +
          "Streaming it would mis-deliver the change as plain inserts. " +
          "Set .option(\"skipChangeCommits\", true) to skip change commits " +
          "and stream only appended data.")
      prev = nextPaths
      v += 1
    }
    out.result()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val added = addedIn(start.asInstanceOf[GraftVersionOffset].v,
      end.asInstanceOf[GraftVersionOffset].v)
    if (added.isEmpty) Array.empty
    else scanFor(added).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.toBatch.createReaderFactory()
}

/** Snapshot version as a streaming offset — total order for free. */
case class GraftVersionOffset(v: Int) extends Offset {
  override def json(): String = v.toString
}

/** `readStream.format("graft-lake-stream")` entry point. Spark routes any
  * `FileDataSourceV2` (which `graft-lake` is, for batch delegation) to the
  * V1 file-watch stream on `readStream.load` — the wrong semantics for a
  * snapshot-versioned table (it would re-deliver CoW rewrites and ignore
  * the manifest). This thin NON-file `TableProvider` hands out the same
  * [[GraftLakeTable]], so the V2 micro-batch path (snapshot offsets) is
  * taken. `spark.readStream.table("<catalog>.<ns>.<t>")` through
  * [[GraftCatalog]] reaches the same stream without this alias.
  */
class GraftLakeStreamSource
  extends org.apache.spark.sql.connector.catalog.TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  import org.apache.spark.sql.util.CaseInsensitiveStringMap

  override def shortName(): String = "graft-lake-stream"
  private val delegate = new GraftLakeSource()

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap)
    : org.apache.spark.sql.types.StructType =
    delegate.inferSchema(options)

  /** A user-supplied `.schema(...)` must MATCH the manifest schema — the
    * table's schema is commit-defined, and silently discarding the passed
    * one (the previous behavior) let a mismatched expectation surface as
    * runtime column errors instead of failing loudly here.
    */
  override def getTable(
      schema: org.apache.spark.sql.types.StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
    : org.apache.spark.sql.connector.catalog.Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val inferred = inferSchema(opts)
    require(schema == null || schema == inferred,
      s"graft-lake-stream: user-specified schema $schema does not match the " +
      s"table's committed schema $inferred — drop .schema(...) or make them equal")
    delegate.getTable(opts)
  }
}
