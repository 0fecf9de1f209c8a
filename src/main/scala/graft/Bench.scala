package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Standalone discriminator (CLAUDE.md bench-noise note): run ONLY the
    // named queries under the identical session/fork — a query that is
    // sustained-slow in the full suite but fast here is suite-environment
    // noise (JIT/GC pressure from 150 other codegen'd queries), not a
    // plan change.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      // local-FS listing on the driver (see Verify.scala — job-based
      // discovery costs ~2 s of scheduling per V1 partitioned scan here)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      // the whole suite's generated classes must FIT the plan cache:
      // the default 100 entries < 153 queries means interleaved passes
      // evict every plan between samples, so each sample re-pays
      // whole-stage codegen compilation (measured r6: document-op
      // medians 2-4× inflated) — the same class of artifact the
      // ReservedCodeCacheSize=1g pin (build.sbt) fixes one level down
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-listing paths so the first timed query
    // doesn't absorb ~5 s of one-time startup cost.
    graft.sources.Tables.events(spark, sfDir).groupBy("event_type").count().count()
    // Build EVERY write-once fixture before the first timed pass, and
    // build them CONCURRENTLY: a fixture is written once and queried
    // many times, so the timed samples must measure the query, never
    // the ingest. r12's driver bench died (rc=124) on ~930 s of these
    // builds running serialized inside timed pass 1 — Fixtures owns the
    // full root inventory now, one task per root (see Fixtures.scala).
    val t0w = System.nanoTime()
    Fixtures.prebuildAll(spark, sfDir,
      sys.env.getOrElse("SPARK_GRAFT_PREBUILD_PAR", "8").toInt)
    System.err.println(
      f"[bench] fixture prebuild ${(System.nanoTime() - t0w) / 1e9}%.1f s")
    // Fixed (sorted) execution order so per-query timings are comparable
    // across rounds — Map iteration order is hash-dependent.
    // INTERLEAVED median-of-R (default 3): each pass runs the whole suite
    // once, so a query's R samples are separated by a full suite pass
    // (~60 s) instead of back-to-back. Temporally-local environment noise
    // (GC phase, JIT recompilation storm, host hiccup) then lands on ONE
    // sample and the median rejects it — back-to-back sampling let a bad
    // minute flag a healthy query as "sustained" slow (r5 closed on 3
    // such phantoms; the standalone re-runs matched r4).
    // Min alongside median: a median >> min on the same query flags
    // allocation/GC noise rather than a plan change.
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    (1 to rounds).foreach { _ =>
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        samples(name) = dt :: samples.getOrElse(name, Nil)
        // Dedup/similarity ops persist() intermediates (shingle sets etc.)
        // that only the returned plan's execution needs — each run creates
        // a NEW cache entry and nothing unpersists, so 300+ dead caches
        // would accumulate across the registry and GC-starve later
        // (alphabetically: lake_*) queries. Every query benches
        // cold-cache instead: stable AND comparable.
        spark.catalog.clearCache()
      }
    }
    val results = queries.map { case (name, _) =>
      val ts = samples(name).sorted
      (name, ts(ts.length / 2), ts.head)
    }
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // per-sample arrays make bench.json SELF-DIAGNOSING: a flagged query
    // whose samples are bimodal (one clean sample under the bar) is a
    // host hiccup recurring at the same suite position, not a plan
    // change — bench_compare labels it noise-suspect instead of burning
    // a session on a standalone re-run (r11 adjudication cost)
    def jsamples: String = queries.map { case (name, _) =>
      s"\"" + name + "\":" + samples(name).reverse.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalMin = results.map(_._3).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","value_min":$totalMin,""" +
      s""""queries":${jmap(results.map(r => (r._1, r._2)))},""" +
      s""""queries_min":${jmap(results.map(r => (r._1, r._3)))},""" +
      s""""samples":$jsamples,"sf":"$sfDir"}"""
    // Persist too: sbt prefixes logger-routed stdout with "[info] ", which
    // broke the driver's JSON parse in round 1 — bench.json is the backup.
    // BENCH_ONLY runs go to a side file: a 3-query subset must never
    // overwrite the full-suite bench.json the gate compares.
    val outName = if (only.isDefined) "bench_only.json" else "bench.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outName), line)
    spark.stop()
    // The bare JSON metric line goes LAST on stdout, un-prefixed (forked
    // run uses OutputStrategy.StdoutOutput; Spark logs go to stderr).
    println(line)
  }
}
