package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Lenient cast/division semantics (malformed → null), matching the
      // reference's tolerant pipeline and DuckDB TRY_CAST-style oracles.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      // local harness: list partition directories on the driver — the
      // job-based parallel discovery pays ~2 s of task scheduling for
      // 720 sub-millisecond local-FS listing calls per V1 scan (on a
      // real cluster against object storage the default threshold is
      // correct; this is a local-mode setting, not engine behavior)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Spark TimestampType writes parquet as isAdjustedToUTC=true which
    // DuckDB reads as TIMESTAMPTZ; cast to TIMESTAMP_NTZ (session TZ is
    // UTC, wall clock preserved) so the oracle compares naive-to-naive.
    def ntz(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
      df.schema.fields.foldLeft(df) { (d, f) =>
        if (f.dataType == TimestampType)
          d.withColumn(f.name, col(f.name).cast(TimestampNTZType))
        else d
      }
    }
    // SPARK_GRAFT_VERIFY_ONLY=k1,k2 dumps a named subset (local fast
    // iteration, mirrors Bench's SPARK_GRAFT_BENCH_ONLY); the driver
    // never sets it.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // Build the write-once fixtures concurrently up front (full runs
    // only): serialized cold fixture builds inside the dump loop are
    // the same wall-clock sink that timed out the r12 driver bench.
    if (only.isEmpty) Fixtures.prebuildAll(spark, sfDir)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
        try ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
