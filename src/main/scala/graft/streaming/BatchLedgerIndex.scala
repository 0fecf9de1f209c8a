package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The generic EXACTLY-ONCE micro-batch append machinery shared by every
  * streaming-maintained derived index (ANN cells: [[StreamingAnn]];
  * inverted-index postings: [[StreamingPostings]]). One index directory
  * holds one BATCH LEDGER plus one or more [[BatchLedgerIndex.Layout]]s —
  * partition-dir parquet layouts that grow by per-batch file appends.
  *
  * The contract (proved by StreamingAnnSpec / StreamingPostingsSpec):
  *  - every file of batch b carries a `b<b>-` prefix; the LEDGER write
  *    (atomic tmp+rename, single-writer — a streaming query has one
  *    driver) is the commit point and happens LAST, after ALL layouts'
  *    files moved in;
  *  - a replayed id found in the ledger is a no-op; a replay NOT in the
  *    ledger first deletes any `b<b>-` orphans of the crashed attempt
  *    (across all layouts — a crash between two layouts' moves leaves
  *    visible orphans in the first), then re-stages;
  *  - compaction (maintenance, stream STOPPED) sweeps uncommitted-batch
  *    orphans FIRST (a folded orphan would double when its batch
  *    legitimately replays), folds everything else into a `c<gen>-`
  *    generation per partition dir, and keeps the ledger's committed ids
  *    so pre-compaction replays stay no-ops.
  *
  * 100 TB shape: per micro-batch cost is O(batch) transform work + one
  * clustering shuffle per partitioned layout; files accrue
  * one-per-touched-partition-per-batch, reset by compaction — the same
  * arithmetic as any streaming lake sink. The index stays a DERIVED
  * artifact: the source-of-truth rebuild is always the base table.
  */
object BatchLedgerIndex {

  /** One sub-layout: rows land under `indexDir/sub` (or `indexDir`
    * itself when `sub` is empty), clustered into `partCol=` directories
    * (or a single flat directory when None — e.g. per-batch stats rows).
    */
  final case class Layout(sub: String, partCol: Option[String]) {
    def base(indexDir: String): java.io.File =
      if (sub.isEmpty) new java.io.File(indexDir)
      else new java.io.File(indexDir, sub)
  }

  private def ledgerFile(indexDir: String, ledgerName: String) =
    new java.io.File(indexDir, ledgerName)

  def committedBatches(indexDir: String, ledgerName: String): Set[Long] = {
    val f = ledgerFile(indexDir, ledgerName)
    if (!f.exists()) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(f.toPath).asScala
        .flatMap(_.trim.toLongOption).toSet
    }
  }

  private def recordBatch(indexDir: String, ledgerName: String,
      batchId: Long): Unit = {
    val dir = new java.io.File(indexDir)
    dir.mkdirs()
    val content = (committedBatches(indexDir, ledgerName) + batchId)
      .toSeq.sorted.mkString("", "\n", "\n")
    val tmp = new java.io.File(dir, s".$ledgerName.tmp")
    java.nio.file.Files.write(tmp.toPath, content.getBytes("UTF-8"))
    tmp.renameTo(ledgerFile(indexDir, ledgerName))
    ()
  }

  private def rm(f: java.io.File): Unit =
    graft.sources.LakeIO.rmDir(f.getPath)

  /** The layout's data directories: its `partCol=` dirs, or (flat) just
    * its base.
    */
  private def dataDirs(indexDir: String, l: Layout): Seq[java.io.File] = {
    val base = l.base(indexDir)
    l.partCol match {
      case Some(pc) =>
        Option(base.listFiles()).getOrElse(Array.empty).toSeq
          .filter(d => d.isDirectory && d.getName.startsWith(pc + "="))
      case None => Seq(base).filter(_.isDirectory)
    }
  }

  private def dataFiles(indexDir: String, l: Layout): Seq[java.io.File] =
    dataDirs(indexDir, l).flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet")))

  private def sweep(indexDir: String, l: Layout)
      (doomed: String => Boolean): Unit =
    dataFiles(indexDir, l).filter(f => doomed(f.getName)).foreach(_.delete())

  /** Move a staged write's files under the layout with `prefix`. */
  private def moveIn(stage: String, indexDir: String, l: Layout,
      prefix: String): Unit = {
    val stageDirs: Seq[(java.io.File, java.io.File)] = l.partCol match {
      case Some(pc) =>
        Option(new java.io.File(stage).listFiles()).getOrElse(Array.empty).toSeq
          .filter(d => d.isDirectory && d.getName.startsWith(pc + "="))
          .map(d => d -> new java.io.File(l.base(indexDir), d.getName))
      case None =>
        Seq(new java.io.File(stage) -> l.base(indexDir))
    }
    stageDirs.foreach { case (src, dest) =>
      dest.mkdirs()
      Option(src.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .foreach { f =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(dest, prefix + f.getName).toPath)
        }
    }
  }

  /** Append one micro-batch across all layouts, idempotently under
    * batch-id replay. `parts` pairs each layout with its (already
    * transformed) rows for this batch; a partitioned layout's DataFrame
    * must contain its partCol.
    */
  def appendBatch(indexDir: String, ledgerName: String,
      parts: Seq[(Layout, DataFrame)], batchId: Long): Unit = {
    recoverCompaction(indexDir, parts.map(_._1))
    if (committedBatches(indexDir, ledgerName).contains(batchId)) return
    val prefix = s"b$batchId-"
    parts.foreach { case (l, _) =>
      sweep(indexDir, l)(_.startsWith(prefix)) // crashed attempt's orphans
    }
    parts.zipWithIndex.foreach { case ((l, df), i) =>
      val stage = indexDir + s"_stage_p${i}_b$batchId"
      l.partCol match {
        case Some(pc) =>
          df.repartition(col(pc))
            .write.partitionBy(pc).mode("overwrite").parquet(stage)
        case None =>
          df.coalesce(1).write.mode("overwrite").parquet(stage)
      }
      moveIn(stage, indexDir, l, prefix)
      rm(new java.io.File(stage))
    }
    recordBatch(indexDir, ledgerName, batchId) // commit point, LAST
  }

  /** Read one layout's live rows. */
  def read(s: SparkSession, indexDir: String, l: Layout): DataFrame =
    s.read.parquet(l.base(indexDir).toString)

  private def markerFile(indexDir: String) =
    new java.io.File(indexDir, "_graft_compacting")

  private def writeMarker(indexDir: String, content: String): Unit = {
    val tmp = new java.io.File(indexDir, "._graft_compacting.tmp")
    java.nio.file.Files.write(tmp.toPath, content.getBytes("UTF-8"))
    tmp.renameTo(markerFile(indexDir))
    ()
  }

  private def relOf(indexDir: String, f: java.io.File): String =
    f.getAbsolutePath.stripPrefix(
      new java.io.File(indexDir).getAbsolutePath + "/")

  /** Recover a crashed compaction before touching the index. The marker
    * is two-phase: phase 1 (`gen:<g>` alone) means the crash happened
    * while the `c<g>-` generation was moving in — ROLL BACK by deleting
    * that generation's files (the folded originals are all still live).
    * Phase 2 (`gen:<g>` + the originals' relative paths) means the
    * generation is fully in and the originals were being deleted — ROLL
    * FORWARD by finishing those deletes. Either way the index holds
    * exactly one copy of every row afterwards; without this, a crash
    * between move-in and original-delete left BOTH copies live and the
    * next fold made the duplication permanent (doubled tf/df for
    * postings, doubled candidates for ANN cells).
    */
  private def recoverCompaction(indexDir: String, layouts: Seq[Layout]): Unit = {
    val m = markerFile(indexDir)
    if (!m.exists()) return
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(m.toPath).asScala.toSeq
    val gen = lines.head.stripPrefix("gen:")
    val olds = lines.drop(1).filter(_.nonEmpty)
    if (olds.nonEmpty) olds.foreach { r =>
      new java.io.File(indexDir, r).delete(); ()
    }
    else layouts.foreach(l => sweep(indexDir, l)(_.startsWith(s"c$gen-")))
    m.delete()
    ()
  }

  /** Compact every layout to ~one `c<gen>-` generation file per
    * partition dir. Maintenance contract: stream STOPPED. Returns
    * (filesBefore, filesAfter) summed over layouts.
    */
  def compact(s: SparkSession, indexDir: String, ledgerName: String,
      layouts: Seq[Layout]): (Int, Int) = {
    recoverCompaction(indexDir, layouts)
    val committed = committedBatches(indexDir, ledgerName)
    // orphans of UNCOMMITTED batches first: folded orphans become
    // permanent and double when their batch legitimately replays
    layouts.foreach(l => sweep(indexDir, l) { name =>
      name.startsWith("b") && name.contains("-") &&
        name.substring(1, name.indexOf('-')).toLongOption
          .exists(id => !committed.contains(id))
    })
    val before = layouts.map(l => dataFiles(indexDir, l)).reduce(_ ++ _)
    if (before.isEmpty) return (0, 0)
    val gen = System.currentTimeMillis()
    // stage EVERY layout first — stage writes read only original files
    val staged: Seq[(Layout, String)] = layouts.flatMap { l =>
      if (dataFiles(indexDir, l).isEmpty) None
      else {
        val stage = indexDir + s"_compact_${l.sub.replace('/', '_')}_$gen"
        val rows = read(s, indexDir, l)
        (l.partCol match {
          case Some(pc) => rows.repartition(col(pc)).write.partitionBy(pc)
          case None     => rows.coalesce(1).write
        }).mode("overwrite").parquet(stage)
        Some(l -> stage)
      }
    }
    val olds = staged.flatMap { case (l, _) => dataFiles(indexDir, l) }
    writeMarker(indexDir, s"gen:$gen") // phase 1: crash ⇒ roll back c<gen>-
    staged.foreach { case (l, stage) =>
      moveIn(stage, indexDir, l, s"c$gen-")
      rm(new java.io.File(stage))
    }
    // phase 2: generation fully in — crash ⇒ roll forward (finish deletes)
    writeMarker(indexDir,
      (s"gen:$gen" +: olds.map(relOf(indexDir, _))).mkString("\n"))
    olds.foreach(_.delete())
    markerFile(indexDir).delete()
    // watermark line: committed ids stay recorded so their replays
    // remain no-ops (their rows now live in the c<gen>- generation)
    recordBatch(indexDir, ledgerName, -1L * gen)
    (before.size, layouts.map(l => dataFiles(indexDir, l)).reduce(_ ++ _).size)
  }
}
