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
  * Exactly-once replay handling, orphan recovery and compaction are the
  * generic [[BatchLedgerIndex]] contract (this was its first instance;
  * [[StreamingPostings]] is the inverted-index sibling) — see that file
  * for the ledger/commit-point/orphan rules and the 100 TB shape.
  */
object StreamingAnn {

  private val Ledger = "_graft_ann_batches"
  private val Cells = BatchLedgerIndex.Layout("", Some("cell"))

  /** Assign one embedding micro-batch (`vec_id`, `embedding`) to the
    * frozen `centroids` and append it to the index at `indexDir`,
    * idempotently under batch-id replay. The foreachBatch sink body.
    */
  def indexBatch(centroids: DataFrame, indexDir: String)
      (batch: DataFrame, batchId: Long): Unit =
    BatchLedgerIndex.appendBatch(indexDir, Ledger,
      Seq(Cells -> Similarity.ivfAssign(batch, centroids)), batchId)

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
    BatchLedgerIndex.read(s, indexDir, Cells)
      .withColumn("cell", col("cell").cast("long"))

  /** Compact the index (maintenance, stream STOPPED): fold all committed
    * batches into a `c<gen>-` generation per cell. Returns
    * (filesBefore, filesAfter).
    */
  def compactIndex(s: org.apache.spark.sql.SparkSession, indexDir: String): (Int, Int) =
    BatchLedgerIndex.compact(s, indexDir, Ledger, Seq(Cells))

  /** [[compactIndex]] that also PURGES deleted vectors: the fold
    * anti-joins the cells rows against the churn-sized deleted-id set
    * (the lake change feed's deletes — the same feed
    * `similarity_ivf_tombstoned` corrects with at probe time), so the
    * folded generation holds only live codes and probes stop paying the
    * per-query exclusion. Assignment is a pure function of (row, frozen
    * centroids), so purge ≡ rebuild-over-live, certified in
    * StreamingAnnSpec against a fresh assignment of the live set. The
    * anti-join is a distributed plan re-clustered by cell — nothing
    * corpus-sized crosses one task.
    */
  def compactIndexPurging(s: org.apache.spark.sql.SparkSession,
      indexDir: String, deletedIds: DataFrame): (Int, Int) =
    BatchLedgerIndex.compactWith(s, indexDir, Ledger, Seq(Cells), { live =>
      live.get(Cells.sub) match {
        case None => Map.empty
        case Some(cells) => Map(Cells.sub -> Some(
          cells.join(deletedIds.select(col("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")))
      }
    })
}
