package graft

import org.apache.spark.sql.SparkSession

/** One session for the whole forked test JVM. */
object SharedSpark {
  // Installed via `withExtensions` — NOT the `spark.sql.extensions` conf —
  // deliberately: this is the install path that leaves the conf unset, so
  // the whole suite exercises the scan guard's `ranIn`/probe detection
  // (GraftLakeSource.newScanBuilder) instead of the trivial conf sniff.
  // It also keeps the SparkContext conf clean, which is what lets
  // BareSessionGuardSpec build a genuinely extension-less session on the
  // shared context.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
