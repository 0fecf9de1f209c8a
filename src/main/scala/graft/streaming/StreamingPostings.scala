package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RetrievalOps

/** STREAMING inverted-index maintenance — [[StreamingAnn]]'s sibling for
  * sparse retrieval: document micro-batches arrive on a stream, each
  * batch's postings (term, doc_id, tf, dl, bucket — pure per-document
  * functions) append into the bucket-partitioned postings layout and one
  * corpus-stats row appends per batch, so at every micro-batch boundary
  * `bm25TopKFromIndex` over the streamed index answers EXACTLY what an
  * index rebuilt over everything ingested so far answers
  * (StreamingPostingsSpec pins it against [[RetrievalOps.writeIndex]]).
  *
  * Both layouts commit under ONE [[BatchLedgerIndex]] ledger entry:
  * a crash between the postings move and the stats move leaves visible
  * orphans that the batch's replay sweeps before re-staging — the
  * ledger line is the single commit point for the whole batch.
  */
object StreamingPostings {

  private val Ledger = "_graft_postings_batches"
  private val Postings = BatchLedgerIndex.Layout("postings", Some("bucket"))
  private val Stats = BatchLedgerIndex.Layout("stats", None)

  /** Append one document micro-batch (`doc_id`, `text`) to the index at
    * `indexDir`, idempotently under batch-id replay.
    */
  def indexBatch(indexDir: String)(batch: DataFrame, batchId: Long): Unit =
    BatchLedgerIndex.appendBatch(indexDir, Ledger,
      Seq(Postings -> RetrievalOps.batchPostings(batch),
        Stats -> RetrievalOps.batchStats(batch)), batchId)

  /** Run the maintenance stream over a streaming (doc_id, text) frame. */
  def start(stream: DataFrame, indexDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        indexBatch(indexDir)(batch, id)
      }
      .start()

  /** The live (postings, stats) pair, drop-in for
    * [[RetrievalOps.bm25TopKFromIndex]] / `bm25BulkFromIndex`.
    */
  def readIndex(s: SparkSession, indexDir: String): (DataFrame, DataFrame) =
    (BatchLedgerIndex.read(s, indexDir, Postings)
       .withColumn("bucket", col("bucket").cast("int")),
     BatchLedgerIndex.read(s, indexDir, Stats))

  /** Compact both layouts (maintenance, stream STOPPED). */
  def compactIndex(s: SparkSession, indexDir: String): (Int, Int) =
    BatchLedgerIndex.compact(s, indexDir, Ledger, Seq(Postings, Stats))
}
