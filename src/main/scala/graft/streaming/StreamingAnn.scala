package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** STREAMING ANN index maintenance — the continuous form of the r11
  * incremental-IVF invariant: embedding batches arrive on a stream, each
  * micro-batch is assigned against the FROZEN centroids (a map-only pure
  * function) and appended into the cell-partitioned index directory, so
  * at every micro-batch boundary the index is row-identical to a full
  * rebuild over everything ingested so far. No retrain, no rebuild, no
  * rewrite of existing cells' files; centroid retraining is an explicit
  * new-index-generation event, never a streaming side effect.
  *
  * Exactly-once under foreachBatch's at-least-once replay: every file of
  * batch b lands under a `b<b>-` prefix inside its cell directory, and a
  * LEDGER file (atomic tmp+rename, single-writer — a streaming query has
  * one driver) records committed batch ids LAST. A replayed id found in
  * the ledger is a no-op; a replay NOT in the ledger first deletes any
  * `b<b>-` orphans of the failed attempt, then re-stages — the same
  * recovery discipline as LakeIO.appendExactlyOnce, minus the manifest
  * (the index is a derived artifact: a reader that raced a crashed batch
  * re-reads correctly after the replay, and the source of truth for
  * rebuild is always the embeddings table itself).
  *
  * 100 TB shape: per micro-batch cost is O(batch) assignment work + one
  * shuffle clustering the batch by cell; files accrue one-per-touched-
  * cell-per-batch (compaction is maintenance, as for any lake table).
  */
object StreamingAnn {

  private def ledgerFile(indexDir: String) =
    new java.io.File(indexDir, "_graft_ann_batches")

  private def committedBatches(indexDir: String): Set[Long] = {
    val f = ledgerFile(indexDir)
    if (!f.exists()) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(f.toPath).asScala
        .flatMap(_.trim.toLongOption).toSet
    }
  }

  private def recordBatch(indexDir: String, batchId: Long): Unit = {
    val dir = new java.io.File(indexDir)
    dir.mkdirs()
    val content = (committedBatches(indexDir) + batchId).toSeq.sorted
      .mkString("", "\n", "\n")
    val tmp = new java.io.File(dir, "._graft_ann_batches.tmp")
    java.nio.file.Files.write(tmp.toPath, content.getBytes("UTF-8"))
    tmp.renameTo(ledgerFile(indexDir))
    ()
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  /** Assign one embedding micro-batch (`vec_id`, `embedding`) to the
    * frozen `centroids` and append it to the index at `indexDir`,
    * idempotently under batch-id replay. The foreachBatch sink body.
    */
  def indexBatch(centroids: DataFrame, indexDir: String)
      (batch: DataFrame, batchId: Long): Unit = {
    if (committedBatches(indexDir).contains(batchId)) return
    val prefix = s"b$batchId-"
    // orphans of a crashed earlier attempt: visible files, absent ledger
    val root = new java.io.File(indexDir)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("cell="))
      .foreach { d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith(prefix)).foreach(_.delete())
      }
    val stage = indexDir + s"_stage_b$batchId"
    Similarity.ivfAssign(batch, centroids)
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(stage)
    Option(new java.io.File(stage).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("cell="))
      .foreach { d =>
        val dest = new java.io.File(root, d.getName)
        dest.mkdirs()
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .foreach { f =>
            java.nio.file.Files.move(f.toPath,
              new java.io.File(dest, prefix + f.getName).toPath)
          }
      }
    rm(new java.io.File(stage))
    recordBatch(indexDir, batchId) // the commit point, renamed LAST
  }

  /** Run the maintenance stream: `stream` is a streaming DataFrame of
    * (vec_id, embedding). Returns the started query.
    */
  def start(stream: DataFrame, centroids: DataFrame, indexDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        indexBatch(centroids, indexDir)(batch, id)
      }
      .start()

  /** The live index (vec_id → cell), for [[Similarity.ivfTopKOverCells]]. */
  def readIndex(s: org.apache.spark.sql.SparkSession, indexDir: String): DataFrame =
    s.read.parquet(indexDir).withColumn("cell", col("cell").cast("long"))

  /** Compact the index: per-batch appends accrue one file per touched
    * cell per micro-batch (the same small-files arithmetic as any
    * streaming sink); this rewrites every cell to ~one file. MAINTENANCE
    * contract: run with the maintenance stream STOPPED (single-writer,
    * like the ledger) — compaction folds all committed batches into a
    * `c<gen>-` generation file per cell, deletes the folded `b*`/older
    * `c*` files, and RESETS the batch ledger to a compaction watermark
    * line so replayed pre-compaction batch ids stay no-ops after the
    * files they wrote are gone. Returns (filesBefore, filesAfter).
    */
  def compactIndex(s: org.apache.spark.sql.SparkSession, indexDir: String): (Int, Int) = {
    val root = new java.io.File(indexDir)
    def dataFiles(): Seq[java.io.File] =
      Option(root.listFiles()).getOrElse(Array.empty).toSeq
        .filter(d => d.isDirectory && d.getName.startsWith("cell="))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet")))
    // sweep orphans of UNCOMMITTED batches first: an orphan folded into
    // the compacted generation would become permanent, and the restarted
    // stream's replay of that batch id would then append it AGAIN —
    // duplicates. Orphan = a b<id>- file whose id is not in the ledger.
    val committed = committedBatches(indexDir)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("cell="))
      .foreach { d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter { f =>
            f.getName.startsWith("b") && f.getName.contains("-") &&
              f.getName.substring(1, f.getName.indexOf('-')).toLongOption
                .exists(id => !committed.contains(id))
          }
          .foreach(_.delete())
      }
    val before = dataFiles()
    if (before.isEmpty) return (0, 0)
    val gen = System.currentTimeMillis()
    val stage = indexDir + s"_compact_$gen"
    readIndex(s, indexDir)
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(stage)
    // swap: move compacted files in under the c<gen>- prefix, THEN delete
    // the folded originals — a crash between the two leaves duplicates
    // (visible, detectable by the c<gen>- prefix), never data loss; the
    // maintenance re-run folds them away.
    Option(new java.io.File(stage).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("cell="))
      .foreach { d =>
        val dest = new java.io.File(root, d.getName)
        dest.mkdirs()
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .foreach { f =>
            java.nio.file.Files.move(f.toPath,
              new java.io.File(dest, s"c$gen-" + f.getName).toPath)
          }
      }
    rm(new java.io.File(stage))
    before.foreach(_.delete())
    // watermark: committed ids stay recorded so their replays remain
    // no-ops (their rows now live in the c<gen>- generation)
    recordBatch(indexDir, -1L * gen) // negative marker line, ledger keeps ids
    (before.size, dataFiles().size)
  }
}
