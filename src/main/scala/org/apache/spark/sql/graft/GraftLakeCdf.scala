package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** The lake's CHANGE DATA FEED as a streaming source (Delta
  * `readChangeFeed` parity) — where the append-only stream
  * ([[GraftLakeMicroBatchStream]]) must refuse CoW commits, this source
  * EMBRACES them: each micro-batch delivers the exact row-level changes
  * of the snapshots since the last offset — `change` = insert|delete
  * (an update is its delete + its insert), `_commit_version` = the
  * commit that produced it. Downstream keyed consumers replay mutations
  * (MERGE/DELETE/UPDATE included) without ever rereading the table.
  *
  * Offsets are snapshot versions; batch (v₁, v₂] is the UNION of the
  * per-commit diffs `readChanges(v-1, v)` — per commit, not endpoint-
  * collapsed, so `_commit_version` attribution survives catch-up ranges
  * and a row updated twice shows both updates. Each diff plans its file
  * list from two manifest reads (the V2 change scan) and nets
  * carried-over CoW rows in ONE shuffle, so per-batch cost is bounded by
  * the touched partitions of the streamed commits — never the table.
  * A compaction/z-order commit diffs to ZERO rows (physical rewrite,
  * logical no-op) and streams as an empty batch, not phantom churn.
  *
  * `.option("startingVersion", n)` (default 0) sets the first streamed
  * commit to n+1: the default backfills the whole table as version-1
  * inserts; `startingVersion = <current head>` streams only future
  * changes. `.option("maxVersionsPerTrigger", k)` chunks backfill and
  * catch-up to at most k commits per micro-batch (restart-safe via
  * SupportsAdmissionControl — the engine hands back the committed
  * offset, no source-side state). This is a V1 `Source` deliberately: `getBatch` may return an
  * arbitrary DataFrame (the diff computation), which the V2 file-list
  * scan contract cannot express — the plan is a real query, not a file
  * scan. Exactly-once delivery comes from checkpointed offsets, same as
  * every file source; expired (vacuumed) snapshots inside a restart
  * range fail loudly rather than silently dropping changes.
  */
class GraftLakeCdfProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake-cdf"

  private def path(parameters: Map[String, String]): String =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(sys.error("graft-lake-cdf: .load(<lake table path>) is required"))

  private def cdfSchema(sqlContext: SQLContext, p: String): StructType =
    // a batch read's schema IS what readChanges emits (table columns +
    // partition column, exactly as the V2 change scan produces them)
    sqlContext.sparkSession.read.format("graft-lake").load(p).schema
      .add("change", StringType, nullable = true)
      .add("_commit_version", LongType, nullable = false)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    refuseRowSetOptions(parameters) // fail at .load(), not first trigger
    (shortName(), cdfSchema(sqlContext, path(parameters)))
  }

  /** Row-set-selecting reader options (the MetadataOnlyCount decline-
    * guard invariant applied to this source): the change feed streams
    * MAIN's commit log from `startingVersion` forward, so a `branch` /
    * travel / change-range option would be silently ignored — the
    * stream would deliver main-head changes while claiming to read the
    * branch or a pinned version. Refuse loudly; `startingVersion` is
    * this source's one legitimate positioning knob.
    */
  private def refuseRowSetOptions(parameters: Map[String, String]): Unit =
    Seq("branch", "stagedAsOf", "versionAsOf", "timestampAsOf",
        "changesFrom", "changesTo").foreach { o =>
      require(!parameters.keys.exists(_.equalsIgnoreCase(o)),
        s"graft-lake-cdf: reader option '$o' selects a fixed row set and " +
          "cannot drive the change-feed stream; use startingVersion to " +
          "position the feed, or publish the branch first")
    }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    refuseRowSetOptions(parameters)
    val p = path(parameters)
    // numeric version or a named tag ("resume the feed from the corpus
    // release") — the same spec seam as versionAsOf
    val startV = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("startingVersion") =>
        ManifestFileIndex.resolveVersionSpec(p, v) }
      .getOrElse(0)
    val maxV = parameters
      .collectFirst { case (k, v) if k.equalsIgnoreCase("maxVersionsPerTrigger") => v.trim.toInt }
    new GraftLakeCdfSource(sqlContext, p, cdfSchema(sqlContext, p), startV, maxV)
  }
}

class GraftLakeCdfSource(sqlContext: SQLContext, root: String,
    override val schema: StructType, startingVersion: Int,
    maxVersionsPerTrigger: Option[Int] = None)
  extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, ReadMaxFiles}

  private def head: Int = ManifestFileIndex.headVersion(root).getOrElse(0)

  // ADMISSION CONTROL the restart-safe way (FileStreamSource's own
  // pattern): implementing SupportsAdmissionControl makes the engine pass
  // the COMMITTED start offset into latestOffset(start, limit), so
  // `maxVersionsPerTrigger` can cap each micro-batch's commit span with
  // no internal high-water state to corrupt across restarts.
  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(k => ReadLimit.maxFiles(k))
      .getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): OffsetV2 = LongOffset(startingVersion.toLong)

  override def reportLatestOffset(): OffsetV2 = LongOffset(head.toLong)

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val startV = Option(start).map(_.json().trim.toInt).getOrElse(startingVersion)
    val h = head
    val capped = limit match {
      case mf: ReadMaxFiles => math.min(h, startV + math.max(1, mf.maxFiles()))
      case _                => h
    }
    if (capped <= startV) null else LongOffset(capped.toLong)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = sqlContext.sparkSession
    val fromV = start.map(_.json().trim.toInt).getOrElse(startingVersion)
    val toV = end.json().trim.toInt
    val ordered = schema.fieldNames.toIndexedSeq.map(col)
    val perCommit = ((fromV + 1) to toV).map { v =>
      graft.sources.LakeIO.readChanges(spark, root, v - 1, v)
        .withColumn("_commit_version", lit(v.toLong))
        .select(ordered: _*)
    }
    val df =
      if (perCommit.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else perCommit.reduce(_ unionByName _)
    // V1 sources must hand the runtime a streaming-tagged plan; wrapping
    // the (lazy) diff RDD keeps the whole computation deferred to the
    // micro-batch's own execution
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftLakeCdfSource[$root]"
}
