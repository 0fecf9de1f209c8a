package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.syntax._

/** S6/S7 — the batch-lake layer: hour-partitioned ZSTD parquet write +
  * partition-pruned read (reference: trino/sql/init-tables.sql:1-12
  * `partitioning = ARRAY['hour(ts)']`, format PARQUET + ZSTD;
  * kafka-connect/register-connector.sh:40 `hours(ts)` transform).
  *
  * Iceberg's *hidden* hour(ts) partitioning becomes an explicit
  * `ts_hour=yyyy-MM-dd-HH` directory partition column; `prunedScan`
  * rewrites a `ts` range predicate into the aligned `ts_hour` range so
  * Catalyst prunes directories instead of listing every partition — at
  * 100 TB this is the difference between touching 24 directories and
  * touching 8760.
  */
object LakeIO {

  def hourPartitioned(df: DataFrame): DataFrame =
    df.withColumn("ts_hour", date_format($"ts", "yyyy-MM-dd-HH"))

  /** Write `df` (with a `ts` timestamp column) hour-partitioned.
    *
    * `repartition(ts_hour)` clusters each hour into one task before the
    * write: without it every task opens a writer per hour it touches —
    * up to tasks×hours tiny files (the classic small-files explosion at
    * scale); with it, one file per hour partition.
    */
  def writeLake(df: DataFrame, path: String): Unit = {
    val withHour = hourPartitioned(df)
    withHour
      .repartition(col("ts_hour"))
      .write.mode("overwrite")
      .partitionBy("ts_hour")
      .option("compression", "zstd")
      .parquet(path)
    commitMetadata(path, withHour.schema)
  }

  /** Commit-time metadata: union schema + file manifest, so graft-lake V2
    * reads plan with ZERO filesystem listing and zero footer reads (the
    * walk below runs once per commit, on the single writer — not per
    * query, not per reader).
    */
  private def commitMetadata(path: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    writeSchemaFile(path, schema)
    org.apache.spark.sql.graft.ManifestFileIndex.commit(path, "ts_hour")
  }

  /** Metadata commit after an external append (streaming foreachBatch):
    * keeps any already-evolved union schema, else records the batch's.
    */
  def commitAfterAppend(path: String,
      batchSchema: org.apache.spark.sql.types.StructType): Unit = {
    if (tableSchema(path).isEmpty) writeSchemaFile(path, batchSchema)
    org.apache.spark.sql.graft.ManifestFileIndex.commit(path, "ts_hour")
  }

  /** Read back with a [start, end) `ts` range, pruned via `ts_hour`. The
    * extra ts_hour bounds are the hour-truncations of the range endpoints,
    * so the rewrite is exactly Iceberg's hidden-partition pruning.
    */
  def prunedScan(s: SparkSession, path: String, startTs: String, endTs: String): DataFrame = {
    val startHour = startTs.take(13).replace(' ', '-')
    val endHour   = endTs.take(13).replace(' ', '-')
    s.read.parquet(path)
      .where($"ts_hour" >= startHour && $"ts_hour" <= endHour)
      .where($"ts" >= to_timestamp(lit(startTs)) && $"ts" < to_timestamp(lit(endTs)))
  }

  /** Compact a fragmented lake partition-by-partition: rewrite each
    * `ts_hour` directory's many small files into ~`targetBytes` files —
    * the maintenance job every streaming-ingested lake needs (micro-batch
    * commits at 10 s cadence fragment badly; reference:
    * register-connector.sh:30). Clustering by ts_hour keeps the rewrite
    * one-file-per-partition-per-task, same as [[writeLake]].
    */
  def compact(s: SparkSession, path: String, targetBytes: Long = 256L << 20): Unit = {
    val df = s.read.parquet(path)
    val tmp = path + "_compacting"
    df.repartition(col("ts_hour"))
      .write.mode("overwrite").partitionBy("ts_hour")
      .option("compression", "zstd").parquet(tmp)
    val dir = new java.io.File(path)
    val bak = new java.io.File(path + "_old")
    dir.renameTo(bak)
    new java.io.File(tmp).renameTo(dir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(bak)
    org.apache.spark.sql.graft.ManifestFileIndex.commit(path, "ts_hour")
  }

  /** Write-side schema evolution (S6 parity with the reference's
    * `evolve-schema-enabled`, register-connector.sh:29): the table's
    * evolved schema lives in a `_graft_schema.json` metadata file, updated
    * transactionally-enough for a single-writer lake (write-new + rename).
    * Appends may ADD nullable columns; type changes are rejected loudly.
    *
    * Readers ([[readEvolved]], and the graft-lake V2 source's schema
    * inference) take the union schema from metadata — one tiny file read —
    * instead of a `mergeSchema` footer sweep over every data file, which
    * at 100 TB is a driver-side listing+footer job over ~10^5 files.
    * Parquet scans null-fill columns absent from old files natively.
    */
  def evolveAppend(df: DataFrame, path: String): Unit = {
    val withHour = hourPartitioned(df)
    tableSchema(path) match {
      case Some(current) =>
        val curByName = current.fields.map(f => f.name -> f).toMap
        withHour.schema.fields.foreach { f =>
          curByName.get(f.name).foreach { old =>
            require(old.dataType == f.dataType,
              s"schema evolution cannot change ${f.name}: ${old.dataType} -> ${f.dataType}")
          }
        }
        val added = withHour.schema.fields.filterNot(f => curByName.contains(f.name))
        writeSchemaFile(path,
          org.apache.spark.sql.types.StructType(current.fields ++ added.map(_.copy(nullable = true))))
      case None =>
        writeSchemaFile(path, withHour.schema)
    }
    withHour
      .repartition(col("ts_hour"))
      .write.mode("append")
      .partitionBy("ts_hour")
      .option("compression", "zstd")
      .parquet(path)
    org.apache.spark.sql.graft.ManifestFileIndex.commit(path, "ts_hour")
  }

  /** Read with the evolved union schema from table metadata (no
    * mergeSchema sweep); falls back to plain inference for pre-evolution
    * lakes.
    */
  def readEvolved(s: SparkSession, path: String): DataFrame =
    tableSchema(path) match {
      case Some(schema) => s.read.schema(schema).parquet(path)
      case None         => s.read.parquet(path)
    }

  def tableSchema(path: String): Option[org.apache.spark.sql.types.StructType] = {
    val f = new java.io.File(path, "_graft_schema.json")
    if (!f.exists()) None
    else Some(org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  private def writeSchemaFile(path: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val dir = new java.io.File(path)
    if (!dir.exists()) dir.mkdirs()
    val tmp = new java.io.File(path, "._graft_schema.json.tmp")
    java.nio.file.Files.write(tmp.toPath, schema.json.getBytes("UTF-8"))
    tmp.renameTo(new java.io.File(path, "_graft_schema.json"))
    ()
  }

  /** v2 = ts_hour layout + commit metadata (schema file + manifest);
    * bump on layout change to invalidate.
    */
  def lakePath(sfDir: String): String =
    "/tmp/graft_lake/v2_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_") + "/events"

  /** Write once, scan many: skip the write when the committed marker is
    * already present (a lake table is immutable-once-committed; rebuilding
    * it per query would dominate any benchmark of the *scan*).
    */
  def ensureLake(s: SparkSession, sfDir: String): String = {
    val path = lakePath(sfDir)
    if (!new java.io.File(path + "/_SUCCESS").exists())
      writeLake(Tables.events(s, sfDir), path)
    path
  }

  def ops: Seq[Op] = Seq(
    Op("scan_partitioned",
      (s, d) => {
        val path = ensureLake(s, d)
        prunedScan(s, path, "2024-01-05 00:00:00", "2024-01-06 00:00:00")
          .select($"event_id", $"ts", $"event_type", $"value")
          .orderBy($"event_id")
      },
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-06 00:00:00'
        |ORDER BY event_id""".stripMargin),

    // Same scan but with ONLY raw-ts predicates — hidden-partition pruning
    // at the SOURCE: the graft-lake DataSourceV2 scan builder rewrites the
    // ts bounds into ts_hour partition filters before file listing
    // (org.apache.spark.sql.graft.GraftLakeSource; LakeIOSpec proves the
    // V2 scan plans fewer files and carries PartitionFilters).
    Op("scan_partitioned_hidden",
      (s, d) => {
        val path = ensureLake(s, d)
        s.read.format("graft-lake").load(path)
          .where($"ts" >= to_timestamp(lit("2024-01-12 00:00:00"))
            && $"ts" < to_timestamp(lit("2024-01-13 00:00:00")))
          .select($"event_id", $"ts", $"event_type", $"value")
          .orderBy($"event_id")
      },
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-12 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-13 00:00:00'
        |ORDER BY event_id""".stripMargin),

    // Session-rule variant of hidden pruning (HourPartitionPruning
    // optimizer Rule over a plain V1 parquet scan) — the path for lakes
    // read WITHOUT the graft-lake source, e.g. through an existing
    // catalog. Same semantics, pruning proved separately in LakeIOSpec.
    Op("scan_partitioned_rule",
      (s, d) => {
        val path = ensureLake(s, d)
        graft.plans.HourPartitionPruning.install(s)
        s.read.parquet(path)
          .where($"ts" >= to_timestamp(lit("2024-01-12 00:00:00"))
            && $"ts" < to_timestamp(lit("2024-01-13 00:00:00")))
          .select($"event_id", $"ts", $"event_type", $"value")
          .orderBy($"event_id")
      },
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-12 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-13 00:00:00'
        |ORDER BY event_id""".stripMargin),

    // Source-format breadth: CSV sink → source roundtrip (identity vs the
    // parquet truth, proving both directions). Timestamps travel as
    // formatted strings — the reference's own wire convention (P3).
    Op("csv_roundtrip",
      (s, d) => {
        val path = "/tmp/graft_fmt/" + d.replaceAll("[^A-Za-z0-9.]", "_") + "/events_csv"
        Tables.events(s, d)
          .select($"event_id", date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_str"),
            $"event_type", $"value")
          .write.mode("overwrite").option("header", "true").csv(path)
        s.read.option("header", "true")
          .schema("event_id LONG, ts_str STRING, event_type STRING, value DOUBLE")
          .csv(path)
          .orderBy($"event_id")
      },
      """SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       event_type, value
        |FROM events ORDER BY event_id""".stripMargin),

    // JSON-lines sink → source roundtrip (the reference's wire format,
    // server.py:70 json.dumps).
    Op("jsonl_roundtrip",
      (s, d) => {
        val path = "/tmp/graft_fmt/" + d.replaceAll("[^A-Za-z0-9.]", "_") + "/events_jsonl"
        Tables.events(s, d)
          .select($"event_id", $"event_type", $"value", $"user_id")
          .write.mode("overwrite").json(path)
        s.read
          .schema("event_id LONG, event_type STRING, value DOUBLE, user_id LONG")
          .json(path)
          .select($"event_id", $"event_type", $"value", $"user_id")
          .orderBy($"event_id")
      },
      """SELECT event_id, event_type, value, user_id
        |FROM events ORDER BY event_id""".stripMargin),

    // S9 catalog introspection: register the testdata tables and list them
    // (reference: README.md:462-465 SHOW CATALOGS / SHOW TABLES).
    Op("catalog_tables",
      (s, d) => {
        Tables.names.foreach { n =>
          val df = if (n == "events") Tables.events(s, d) else Tables.load(s, d, n)
          df.createOrReplaceTempView(n)
        }
        s.sql("SHOW TABLES").select($"tableName").orderBy($"tableName")
      }, None)
  )
}
