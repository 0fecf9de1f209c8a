package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RetrievalOps
import graft.syntax._

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
    * `indexDir`, idempotently under batch-id replay. Layout order is
    * STATS FIRST: a reader racing the stream then at worst sees totals
    * for postings not yet visible (matches understate), never matched
    * postings scored against last-batch totals.
    */
  def indexBatch(indexDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val p = RetrievalOps.batchPostings(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try BatchLedgerIndex.appendBatch(indexDir, Ledger,
      Seq(Stats -> RetrievalOps.batchStatsFrom(batch, p),
        Postings -> p), batchId)
    finally { p.unpersist(); () }
  }

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

  /** Compact all layouts (maintenance, stream STOPPED). Tombstone rows
    * survive compaction — they are only retired by an explicit index
    * rebuild over the live corpus (the generation-reset event).
    */
  def compactIndex(s: SparkSession, indexDir: String): (Int, Int) =
    BatchLedgerIndex.compact(s, indexDir, Ledger,
      Seq(Postings, Stats, Tombstones))

  private val Tombstones = BatchLedgerIndex.Layout("tombstones", None)

  /** The index FOLLOWS THE LAKE: one maintenance stream over the lake's
    * change feed (`readStream.format("graft-lake-cdf")`) keeps the index
    * consistent with every kind of table mutation —
    *   - net in-batch insert/delete pairs FIRST (a catch-up micro-batch
    *    unions several commits' diffs; a doc inserted and deleted inside
    *    the window must touch nothing — the StreamingMv netting rule);
    *   - surviving inserts append postings (stamped with the batch id as
    *     their GENERATION) + a stats row;
    *   - surviving deletes append churn-sized TOMBSTONE rows (doc_id +
    *     text + generation — the text carries the token mass the
    *     serving-side stats correction needs);
    * all three layouts under ONE ledger line (exactly-once per batch),
    * stats and tombstones moving in BEFORE postings so a racing reader
    * at worst understates matches. Serving ([[bm25TopK]]) applies
    * tombstones GENERATION-AWARE (a tombstone kills only earlier-gen
    * postings, so UPDATEs — CDF delete(old)+insert(new) — and
    * re-inserts keep their newest postings) — row-identical to an index
    * rebuilt over the live table at every batch boundary
    * (StreamingPostingsSpec pins append, MoR delete AND MoR update).
    * Tombstones accrue O(churn); the periodic rebuild resets them.
    *
    * CONTRACT: `doc_id` is a key of the followed table's live state
    * (every retrieval op assumes it — tie-breaks, dedup). Bag
    * multiplicities beyond the in-batch insert/delete netting are not
    * reconstructed.
    */
  def followLake(changes: DataFrame, indexDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val docCols = batch.columns
          .filterNot(Set("change", "_commit_version")).map(col).toSeq
        val net = batch
          .withColumn("__w", when($"change" === "insert", 1L).otherwise(-1L))
          .groupBy(docCols: _*).agg(sum($"__w").as("__net"))
        val ins = net.where($"__net" > 0L).select($"doc_id", $"text")
        val del = net.where($"__net" < 0L)
          .select($"doc_id", $"text", lit(id).as("gen"))
        val p = RetrievalOps.batchPostings(ins)
          .withColumn("gen", lit(id))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try BatchLedgerIndex.appendBatch(indexDir, Ledger, Seq(
          Stats -> RetrievalOps.batchStatsFrom(ins, p),
          Tombstones -> del,
          Postings -> p), id)
        finally { p.unpersist(); () }
      }
      .start()

  /** Live tombstone rows (empty-schema-safe before any delete). */
  def readTombstones(s: SparkSession, indexDir: String): DataFrame = {
    val base = new java.io.File(indexDir, "tombstones")
    if (!base.isDirectory ||
        !base.listFiles().exists(_.getName.endsWith(".parquet"))) {
      import org.apache.spark.sql.types._
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType), StructField("gen", LongType))))
    } else BatchLedgerIndex.read(s, indexDir, Tombstones)
  }

  /** Serve BM25 top-10 from the lake-following index: frozen postings,
    * summed stats, generation-aware tombstones applied at probe time.
    * (An [[indexBatch]]-maintained dir has no gen column and no
    * tombstones — it serves through the plain probe.)
    */
  def bm25TopK(s: SparkSession, indexDir: String): DataFrame = {
    val (p, st) = readIndex(s, indexDir)
    if (p.columns.contains("gen"))
      RetrievalOps.bm25TopKTombstonedGen(p, st, readTombstones(s, indexDir))
    else RetrievalOps.bm25TopKFromIndex(p, st)
  }
}
