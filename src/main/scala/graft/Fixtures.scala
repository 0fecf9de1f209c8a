package graft

import org.apache.spark.sql.SparkSession

/** Concurrent PREBUILD of every write-once demo fixture.
  *
  * Why this exists: the r12 driver bench was killed at timeout (rc=124)
  * because ~930 s of one-time marker-guarded fixture builds ran
  * SERIALIZED inside timed pass 1 — the first sample of each lake_* key
  * measured a fixture INGEST, not the query (VERDICT r12, "What's wrong"
  * #1). Every fixture root is an independent directory tree, the host
  * has 32 cores, and most builds are scheduling/IO-latency-bound rather
  * than CPU-bound, so building them concurrently collapses the cold wall.
  *
  * Safety rules the task list encodes:
  *  - ONE task per fixture root — no two concurrent tasks ever touch the
  *    same directory tree (the marker guards are not concurrency-safe).
  *  - Builders that nest a SHARED builder are handled by stages:
  *    stage 0 builds the two shared bases (the queried events lake and
  *    the clone-source base-4 lake; [[graft.sources.LakeIO.base4Lake]]
  *    is additionally synchronized), stage 1 fans out everything else.
  *  - Each task runs on its OWN `spark.newSession()`: session conf
  *    mutation inside a builder (catalog registrations,
  *    `spark.graft.update.strategy`) stays invisible to sibling tasks.
  *  - Intra-module artifact chains with real data dependencies (the ANN
  *    centroids → cells → codes family) run sequentially INSIDE one task.
  */
object Fixtures {

  private def runOp(name: String)(s: SparkSession, d: String): Unit = {
    SparkEntry.queries(name)(s, d).count(); ()
  }

  /** Stage-0: shared bases that stage-1 tasks clone from / attach to. */
  private def stage0: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "base4_lake" -> ((s, d) => { graft.sources.LakeIO.base4Lake(s, d); () }),
    "events_lake" -> ((s, d) => { graft.sources.LakeIO.ensureLake(s, d); () }))

  /** Stage-1: one task per independent fixture root. */
  private def stage1: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "incr_lake" -> ((s, d) => { graft.sources.LakeIO.incrLake(s, d); () }),
    "merged_lake" -> ((s, d) => { graft.sources.LakeIO.mergedLake(s, d); () }),
    "merged_lake_mor" -> ((s, d) => { graft.sources.LakeIO.mergedLakeMoR(s, d); () }),
    "updated_lake" -> ((s, d) => { graft.sources.LakeIO.updatedLake(s, d); () }),
    "updated_lake_mor" -> ((s, d) => { graft.sources.LakeIO.updatedLakeMoR(s, d); () }),
    "renamed_lake" -> ((s, d) => { graft.sources.LakeIO.renamedLake(s, d); () }),
    "evolved_lake" -> ((s, d) => { graft.sources.LakeIO.evolvedLake(s, d); () }),
    "sharded_lake" -> ((s, d) => { graft.sources.LakeIO.shardedLake(s, d); () }),
    "restored_lake" -> ((s, d) => { graft.sources.LakeIO.restoredLake(s, d); () }),
    "cloned_lake" -> ((s, d) => { graft.sources.LakeIO.clonedLake(s, d); () }),
    "branched_lake" -> ((s, d) => { graft.sources.LakeIO.branchedLake(s, d); () }),
    "constrained_lake" -> ((s, d) => { graft.sources.LakeIO.constrainedLake(s, d); () }),
    "overwritten_lake" -> ((s, d) => { graft.sources.LakeIO.overwrittenLake(s, d); () }),
    "mor_delete_lake" -> runOp("lake_delete_mor") _,
    "catalog_lake" -> runOp("catalog_sql_agg") _,
    "bloom_sidecar" -> ((s, d) => { graft.sources.BloomIndex.bloomLake(s, d); () }),
    "bucketed_tables" -> ((s, d) => { graft.sources.Bucketed.ensure(s, d); () }),
    "bm25_full_index" -> ((s, d) => { graft.operators.RetrievalOps.ensureIndex(s, d); () }),
    "bm25_incr_index" -> ((s, d) => { graft.operators.RetrievalOps.invertedIndexIncremental(s, d); () }),
    "bm25_tombstone_lake" -> ((s, d) => { graft.operators.RetrievalOps.tombstoneLake(s, d); () }),
    "bm25_rebucketed_index" -> runOp("bm25_index_rebucketed") _,
    "ann_artifacts" -> ((s, d) => {
      val S = graft.operators.Similarity
      S.annCentroids(s, d); S.annCodebook(s, d); S.annCells(s, d)
      S.annCodes(s, d); S.incrementalCells(s, d); S.incrementalCodes(s, d)
      S.annTombstoneLake(s, d); S.annFollowIndex(s, d); S.annSqlIndex(s, d)
      S.annPqFollowIndex(s, d); ()
    }),
    "bpe_vocab" -> ((s, d) => { graft.operators.CorpusOps.frozenVocab(s, d); () }),
    "mv_state" -> ((s, d) => {
      runOp("mv_rewrite_hourly")(s, d); runOp("mv_rewrite_rollup_day")(s, d)
    }))

  private def runPar(spark: SparkSession, sfDir: String,
      tasks: Seq[(String, (SparkSession, String) => Unit)],
      parallelism: Int): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      val futs = tasks.map { case (name, fn) =>
        name -> pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            val t0 = System.nanoTime()
            fn(spark.newSession(), sfDir)
            val dt = (System.nanoTime() - t0) / 1e9
            // per-task walls on stderr: a cold prebuild self-profiles, so
            // "which fixture dominates the cold gate" is answered from
            // the log instead of a dedicated instrumented re-run
            if (dt > 1.0) System.err.println(f"[fixtures] $name%-22s $dt%7.1f s")
          }
        })
      }
      // fail LOUDLY with the task name: a silently-missing fixture makes
      // pass 1 time the ingest again — the exact failure mode this
      // object removes
      val errs = futs.flatMap { case (name, f) =>
        try { f.get(); None }
        catch { case e: java.util.concurrent.ExecutionException =>
          Some(s"$name: ${e.getCause}")
        }
      }
      require(errs.isEmpty, "fixture prebuild failed:\n" + errs.mkString("\n"))
    } finally { pool.shutdown(); () }
  }

  /** Build every write-once fixture for `sfDir`, concurrently. Idempotent
    * and cheap when fixtures already exist (each task re-checks its
    * marker and returns immediately).
    */
  def prebuildAll(spark: SparkSession, sfDir: String,
      parallelism: Int = 8): Unit = {
    runPar(spark, sfDir, stage0, parallelism)
    runPar(spark, sfDir, stage1, parallelism)
  }
}
