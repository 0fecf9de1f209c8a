package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}
import graft.operators.RetrievalOps
import graft.sources.Tables

/** Streaming inverted-index maintenance: document micro-batches append
  * postings + a stats row exactly once; at every batch boundary the
  * served BM25 top-10 equals a full index rebuild over everything
  * ingested so far; replays are no-ops; compaction folds BOTH layouts
  * and preserves the answer.
  */
class StreamingPostingsSpec extends AnyFunSuite {
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  private def served(dir: String): Seq[String] = {
    val (p, st) = StreamingPostings.readIndex(spark, dir)
    RetrievalOps.bm25TopKFromIndex(p, st).collect().toSeq.map(_.toString)
  }

  private def rebuiltOver(docs: org.apache.spark.sql.DataFrame): Seq[String] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pidx").toString
    RetrievalOps.writeIndex(dir, docs, "overwrite")
    RetrievalOps.bm25TopKFromIndex(
      spark.read.parquet(dir + "/postings"),
      spark.read.parquet(dir + "/stats")).collect().toSeq.map(_.toString)
  }

  test("stream == rebuild at every batch boundary; replay no-op; compaction folds") {
    val base = "/tmp/graft_lake_test/stream_postings"
    val dir = s"$base/index"
    rm(new java.io.File(base))

    val all = Tables.documents(spark, sf).select($"doc_id", $"text")
    val rows = all.as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = rows.splitAt(rows.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingPostings.start(
      ms.toDF().toDF("doc_id", "text"), dir, s"$base/ckpt")
    try {
      ms.addData(first.toSeq)
      q.processAllAvailable()
      // mid-stream: the index serves exactly the ingested prefix
      assert(served(dir) == rebuiltOver(all.where($"doc_id" < first.last._1 + 1)))
      ms.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val full = rebuiltOver(all)
    assert(served(dir) == full)

    // stats rows: one per batch, summing to corpus totals
    val st = StreamingPostings.readIndex(spark, dir)._2
    assert(st.count() == 2L)
    assert(st.agg(sum($"n_docs")).head.getLong(0) == rows.length.toLong)

    // a replayed, already-ledgered batch id is a pure no-op
    StreamingPostings.indexBatch(dir)(all.limit(5), batchId = 0L)
    assert(served(dir) == full)

    // compaction folds both layouts; the answer is unchanged
    val (bef, aft) = StreamingPostings.compactIndex(spark, dir)
    assert(aft < bef, s"compaction must shrink files ($bef -> $aft)")
    assert(served(dir) == full)
    // committed replays stay no-ops after their files were folded
    StreamingPostings.indexBatch(dir)(all.limit(3), batchId = 1L)
    assert(served(dir) == full)
  }

  test("followLake: the index tracks lake inserts AND MoR deletes via the CDF") {
    val base = "/tmp/graft_lake_test/stream_postings_follow"
    val lake = s"$base/lake"
    val dir = s"$base/index"
    rm(new java.io.File(base))

    val all = Tables.documents(spark, sf)
      .withColumn("ts", ($"doc_id" + lit(1705017600L)).cast("timestamp"))
    graft.sources.LakeIO.writeLake(all.where($"doc_id" < 400), lake)

    val q = StreamingPostings.followLake(
      spark.readStream.format("graft-lake-cdf").load(lake), dir, s"$base/ckpt")
    try {
      q.processAllAvailable()
      // boundary 1: index == rebuild over the lake's current rows
      assert(StreamingPostings.bm25TopK(spark, dir).collect().toSeq.map(_.toString)
        == rebuiltOver(Tables.documents(spark, sf).where($"doc_id" < 400)))

      // append more docs + MoR-delete some indexed ones
      graft.sources.LakeIO.evolveAppend(all.where($"doc_id" >= 400), lake)
      graft.sources.LakeIO.deleteWhereMoR(spark, lake, $"doc_id" % 7 === 3)
      q.processAllAvailable()

      val live = Tables.documents(spark, sf).where($"doc_id" % 7 =!= 3)
      assert(StreamingPostings.bm25TopK(spark, dir).collect().toSeq.map(_.toString)
        == rebuiltOver(live),
        "served answer must equal a rebuild over the live table")
      // deletes landed as churn-sized tombstones, not a rewrite
      val tombs = StreamingPostings.readTombstones(spark, dir)
      assert(tombs.count() > 0)
      assert(!tombs.collect().exists(_.getLong(0) % 7 != 3))
    } finally q.stop()
  }
}
