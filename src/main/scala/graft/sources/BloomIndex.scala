package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ManifestFileIndex

import graft.Op
import graft.functions.BloomSketch
import graft.syntax._

/** FILE-LEVEL BLOOM INDEX — point-lookup skipping on columns where the
  * manifest's min/max bounds never prune (a high-cardinality id spread
  * across every partition: min≈global-min, max≈global-max in every file,
  * so `scan_stats_skip`-style range pruning keeps everything). One
  * aggregate pass builds a per-data-file Bloom sketch of the column
  * (`_graft_idx/bloom-<col>` sidecar parquet); a point lookup then probes
  * the sketches and scans only the files that might contain the value —
  * Iceberg puffin blooms / Delta file-skipping indexes re-expressed as a
  * groupBy over the positioned scan.
  *
  * 100 TB shape: the index build is one full pass (a maintenance job,
  * like OPTIMIZE); the sketches are ~1.2 bytes/row at 1% fpp (a 256 MB
  * file of 5M ids → ~6 MB sketch) and the PROBE is distributed — the
  * sidecar is itself a parquet table, verdicts semi-join against the
  * live-file list as DataFrames, and the driver collects only the
  * CANDIDATE names (≈ fpp·files + post-build unseen — the names the
  * scan plan materializes anyway), never the sketch bytes and never a
  * per-file verdict map. A point lookup on a 400k-file table reads the
  * sidecar + ~fpp·files data files instead of all of them.
  *
  * Safety is absence-based: files committed AFTER the build (appends, CoW
  * rewrites — new files get new names) have no sidecar row and are always
  * scanned; merge-on-read deletion vectors are applied on the read side.
  * A stale index can therefore only LOSE skipping, never a row.
  */
object BloomIndex {

  private def idxDir(path: String, column: String) = s"$path/_graft_idx/bloom-$column"

  /** Build (or rebuild) the index for `column`: per live data file, one
    * Bloom sketch of the column's values. Returns the number of files
    * indexed.
    */
  def attach(s: SparkSession, path: String, column: String,
      fpp: Double = 0.01): Long = {
    val cur = ManifestFileIndex.read(path)
    require(cur.isDefined, s"bloom attach: $path has no committed manifest")
    val (_, entries) = cur.get
    if (entries.isEmpty) return 0L
    // sketch sized for the largest file (one create-param for all groups);
    // legacy manifests without row counts fall back to a bytes/8 estimate
    val expected = math.max(1024L, entries.map(e =>
      if (e.rowCount >= 0) e.rowCount else e.size / 8L).max)
    val scan = LakeIO.positionedScan(s, path, entries.map(_.relPath),
      LakeIO.tableSchema(path))
    scan.groupBy($"_dv_file")
      .agg(BloomSketch.bloomAgg(col(column), expected, fpp).as("bloom"))
      .repartition(1) // sidecar is metadata-scale; one file reads fastest
      .write.mode("overwrite").parquet(idxDir(path, column))
    entries.size.toLong
  }

  /** The live entries a lookup of `value` must scan: files whose sketch
    * admits the value, plus files the index has never seen (post-build
    * commits — conservative by construction). `value` is a Long or a
    * String (matching [[graft.functions.BloomAgg]]'s input domains).
    * Exposed for tests.
    */
  private[graft] def candidates(s: SparkSession, path: String, column: String,
      value: Any): (Seq[ManifestFileIndex.Entry], Seq[ManifestFileIndex.Entry]) = {
    val (_, entries) = ManifestFileIndex.read(path).get
    if (!new java.io.File(idxDir(path, column)).exists()) return (entries, Nil)
    import s.implicits.{newProductEncoder, newStringEncoder,
      localSeqToDatasetHolder}
    val probe: Array[Byte] => Boolean = value match {
      case l: Long   => BloomSketch.mightContainLong(_, l)
      case i: Int    => BloomSketch.mightContainLong(_, i.toLong)
      case t: String => BloomSketch.mightContainString(_, t)
      case other => sys.error(s"bloom probe: unsupported value type $other")
    }
    // FULLY-DISTRIBUTED candidate selection: the probe filters the
    // sidecar to ADMITTED file names, the live-file list joins against
    // it as a DataFrame (semi: admitted ∧ live; anti: live files the
    // index has never seen — post-build commits, conservatively
    // scanned), and only the resulting CANDIDATE names are collected —
    // ≈ fpp·files + unseen, the same names planning materializes
    // anyway. No per-file verdict map ever lands on the driver: at
    // 400k files the old shape collected 400k (name, verdict) pairs,
    // this collects the ~4k admitted names.
    val sidecar = s.read.parquet(idxDir(path, column))
      .select(col("_dv_file"), col("bloom"))
    val live = entries.map(_.relPath).toDF("relPath")
    val admitted = sidecar.as[(String, Array[Byte])]
      .flatMap { case (f, b) => if (probe(b)) Some(f) else None }
      .toDF("relPath")
    val unseen = live.join(
      sidecar.select(col("_dv_file").as("relPath")), Seq("relPath"), "left_anti")
    val candNames: Set[String] =
      admitted.join(live, Seq("relPath"), "left_semi")
        .union(unseen).distinct()
        .as[String].collect().toSet
    entries.partition(e => candNames.contains(e.relPath))
  }

  /** Point lookup through the index: `WHERE column = value` scanning only
    * candidate files, deletion vectors applied. Long and String values.
    */
  def pointScan(s: SparkSession, path: String, column: String,
      value: Any): DataFrame = {
    val (cands, _) = candidates(s, path, column, value)
    val dvs = ManifestFileIndex.readDvs(path)
    val schema = LakeIO.tableSchema(path)
    val cols = schema.map(_.fieldNames.toSeq)
      .getOrElse(s.read.format("graft-lake").load(path).columns.toSeq)
    LakeIO.dvAppliedScan(s, path, cands, dvs, schema, cols)
      .where(col(column) === lit(value))
  }

  /** Demo lake + index shared by the keyed op (marker-guarded build-once,
    * same amortization as [[LakeIO.ensureLake]]).
    */
  def bloomLake(s: SparkSession, d: String): String = {
    val path = LakeIO.ensureLake(s, d)
    val marker = new java.io.File(path, "_graft_bloom_user_done")
    if (!marker.exists()) {
      attach(s, path, "user_id")
      java.nio.file.Files.write(marker.toPath, Array.empty[Byte])
    }
    path
  }

  val ops: Seq[Op] = Seq(
    // Bloom-skipped point lookup, oracle-checked: user_id is uniform
    // across every hour partition (min/max bounds prune nothing), so this
    // is exactly the query shape the index exists for. BloomIndexSpec
    // asserts the scan plans strictly fewer files than the table holds.
    Op("scan_bloom_point",
      (s, d) => {
        val path = bloomLake(s, d)
        pointScan(s, path, "user_id", 7L)
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
          .orderBy($"event_id")
      },
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events WHERE user_id = 7
        |ORDER BY event_id""".stripMargin))
}
