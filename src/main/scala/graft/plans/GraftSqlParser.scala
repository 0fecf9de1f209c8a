package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.ManifestFileIndex
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType, TimestampType}

/** SQL surface for lake MAINTENANCE — the statements Spark's grammar
  * doesn't have but every lakehouse operator runs on a cron
  * (Delta/Iceberg parity; reference admin scripts run the Trino
  * equivalents out of band):
  *
  *   OPTIMIZE <table>                       -- compact fragmented partitions
  *   OPTIMIZE <table> ZORDER BY (a, b)      -- Morton-clustered rewrite
  *   VACUUM <table>                         -- drop crashed-write debris
  *   VACUUM <table> RETAIN <n> SNAPSHOTS    -- + expire old time travel
  *   DESCRIBE HISTORY <table>               -- the snapshot log
  *   ALTER TABLE t CREATE TAG name [AS OF VERSION v]  -- pin a release
  *   ALTER TABLE t DROP TAG name
  *   SHOW TAGS IN t
  *   DESCRIBE DETAIL <table>                -- table-level metadata
  *   RESTORE [TABLE] t TO VERSION AS OF n   -- roll back as a new commit
  *
  * Injected ahead of the delegate parser ([[GraftExtensions]]); anything
  * that doesn't FULLY match one of the statement shapes above falls
  * through untouched, so the whole Spark SQL dialect keeps working.
  * Tables are addressed as `<catalog>.<ns>.<table>` (resolved through the
  * catalog's configured warehouse directory) or as a quoted `'/path'`.
  *
  * These are commands, not queries: each runs eagerly through the same
  * snapshot-committing maintenance APIs the Scala surface exposes
  * (`LakeIO.compactSnapshots` / `optimizeZOrder`,
  * `ManifestFileIndex.expireSnapshots` / `removeOrphanFiles`,
  * `LakeIO.history`) and returns its accounting as rows. Old snapshots
  * stay readable (`VERSION AS OF`) until a VACUUM RETAIN expires them —
  * OPTIMIZE alone never destroys time travel.
  */
case class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  // anchored full-match patterns — `Regex.unapplySeq` on a String matches
  // the WHOLE statement, so partial hits can't shadow real SQL
  private val Vacuum =
    """(?is)\s*VACUUM\s+([\w.`'/-]+?)(?:\s+RETAIN\s+(\d+)\s+(SNAPSHOTS|HOURS))?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+([\w.`'/-]+?)(?:\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\))?\s*;?\s*""".r
  private val History =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+([\w.`'/-]+?)\s*;?\s*""".r
  private val Detail =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+([\w.`'/-]+?)\s*;?\s*""".r
  private val CreateTag =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`'/-]+?)\s+CREATE\s+TAG\s+['"]?([\w.-]+)['"]?(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""".r
  private val DropTag =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`'/-]+?)\s+DROP\s+TAG\s+['"]?([\w.-]+)['"]?\s*;?\s*""".r
  private val AddConstraint =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`'/-]+?)\s+ADD\s+CONSTRAINT\s+([\w.-]+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`'/-]+?)\s+DROP\s+CONSTRAINT\s+([\w.-]+)\s*;?\s*""".r
  private val ShowConstraints =
    """(?is)\s*SHOW\s+CONSTRAINTS\s+(?:IN|FOR|ON)\s+([\w.`'/-]+?)\s*;?\s*""".r
  private val ShowPartitions =
    """(?is)\s*SHOW\s+PARTITIONS\s+([\w.`'/-]+?)\s*;?\s*""".r
  private val ShowTags =
    """(?is)\s*SHOW\s+TAGS\s+(?:IN|FOR)\s+([\w.`'/-]+?)\s*;?\s*""".r
  private val ShowBranches =
    """(?is)\s*SHOW\s+BRANCHES\s+(?:IN|FOR)\s+([\w.`'/-]+?)\s*;?\s*""".r
  private val PublishBranch =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`'/-]+?)\s+PUBLISH\s+BRANCH\s+['"]?([\w.-]+)['"]?\s*;?\s*""".r
  private val DropBranch =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`'/-]+?)\s+DROP\s+BRANCH\s+['"]?([\w.-]+)['"]?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([\w.`'/-]+?)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val Clone =
    """(?is)\s*CREATE\s+TABLE\s+([\w.`'/-]+?)\s+(?:SHALLOW\s+)?CLONE\s+([\w.`'/-]+?)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val Bm25 =
    """(?is)\s*BM25\s+INDEX\s+'([^']+)'\s+QUERY\s+'([^']+)'(?:\s+TOP\s+(\d+))?\s*;?\s*""".r
  private val CreateBm25 =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?BM25\s+INDEX\s+'([^']+)'\s+FROM\s+([\w.`'/-]+?)\s*;?\s*""".r
  private val OptimizeBm25 =
    """(?is)\s*OPTIMIZE\s+BM25\s+INDEX\s+'([^']+)'\s*;?\s*""".r
  private val RebucketBm25 =
    """(?is)\s*ALTER\s+BM25\s+INDEX\s+'([^']+)'\s+REBUCKET\s+(\d+)\s*;?\s*""".r
  private val DescribeBm25 =
    """(?is)\s*DESC(?:RIBE)?\s+BM25\s+INDEX\s+'([^']+)'\s*;?\s*""".r
  private val Ann =
    """(?is)\s*ANN\s+INDEX\s+'([^']+)'\s+QUERY\s+(?:FIRST\s+(\d+)|ID\s+(\d+)|VEC\s+'([^']+)')(?:\s+TOP\s+(\d+))?(?:\s+NPROBE\s+(\d+))?\s*;?\s*""".r
  private val CreateAnn =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?ANN\s+INDEX\s+'([^']+)'\s+FROM\s+([\w.`'/-]+?)\s*;?\s*""".r
  private val OptimizeAnn =
    """(?is)\s*OPTIMIZE\s+ANN\s+INDEX\s+'([^']+)'\s*;?\s*""".r
  private val Hybrid =
    """(?is)\s*HYBRID\s+QUERY\s+'([^']+)'\s+BM25\s+INDEX\s+'([^']+)'\s+ANN\s+INDEX\s+'([^']+)'\s+(?:ID\s+(\d+)|VEC\s+'([^']+)')(?:\s+TOP\s+(\d+))?(?:\s+NPROBE\s+(\d+))?\s*;?\s*""".r
  private val DescribeAnn =
    """(?is)\s*DESC(?:RIBE)?\s+ANN\s+INDEX\s+'([^']+)'\s*;?\s*""".r

  /** `<catalog>.<ns...>.<table>` → `<warehouse>/<ns...>/<table>` via the
    * catalog's registered warehouse, or a quoted filesystem path verbatim.
    */
  private def lakeRoot(raw: String): String = {
    val clean = raw.replace("`", "").trim
    if (clean.startsWith("'") || clean.startsWith("/"))
      clean.stripPrefix("'").stripSuffix("'")
    else {
      val parts = clean.split('.')
      val wh = session.conf.getOption(s"spark.sql.catalog.${parts.head}.warehouse")
      require(parts.length >= 2 && wh.isDefined,
        s"cannot resolve '$clean' to a lake table: use <catalog>.<ns>.<table> " +
          "with a registered graft catalog, or a quoted '/path'")
      (wh.get +: parts.tail.toSeq).mkString("/")
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(ident, retain, unit) =>
      GraftVacuumCommand(lakeRoot(ident), Option(retain).map(_.toInt),
        Option(unit).map(_.toUpperCase(java.util.Locale.ROOT)))
    case Optimize(ident, null, null) =>
      GraftOptimizeCommand(lakeRoot(ident), None)
    case Optimize(ident, colA, colB) =>
      GraftOptimizeCommand(lakeRoot(ident), Some((colA, colB)))
    case History(ident) =>
      GraftHistoryCommand(lakeRoot(ident))
    case Detail(ident) =>
      GraftDetailCommand(lakeRoot(ident))
    case CreateTag(ident, name, version) =>
      GraftTagCommand(lakeRoot(ident), name, Option(version).map(_.toInt),
        drop = false)
    case DropTag(ident, name) =>
      GraftTagCommand(lakeRoot(ident), name, None, drop = true)
    case AddConstraint(ident, name, check) =>
      GraftConstraintCommand(lakeRoot(ident), name, Some(check.trim))
    case DropConstraint(ident, name) =>
      GraftConstraintCommand(lakeRoot(ident), name, None)
    case ShowConstraints(ident) =>
      GraftShowConstraintsCommand(lakeRoot(ident))
    // SHOW PARTITIONS is real Spark SQL — intercept ONLY when the target
    // resolves to a committed graft-lake table; every other table keeps
    // Spark's own command
    case ShowPartitions(ident) if scala.util.Try(lakeRoot(ident)).toOption
        .exists(r => ManifestFileIndex.read(r, None).isDefined) =>
      GraftShowPartitionsCommand(lakeRoot(ident))
    case ShowTags(ident) =>
      GraftShowTagsCommand(lakeRoot(ident))
    case ShowBranches(ident) =>
      GraftShowBranchesCommand(lakeRoot(ident))
    case PublishBranch(ident, name) =>
      GraftBranchCommand(lakeRoot(ident), name, publish = true)
    case DropBranch(ident, name) =>
      GraftBranchCommand(lakeRoot(ident), name, publish = false)
    case Restore(ident, version) =>
      GraftRestoreCommand(lakeRoot(ident), version.toInt)
    case Clone(target, source, travel) =>
      GraftCloneCommand(lakeRoot(source), lakeRoot(target),
        Option(travel).map(_.toInt))
    case Bm25(dir, query, k) =>
      val kk = Option(k).map(_.toInt).getOrElse(10)
      // the command's eager collect is contractually the k RESULT rows,
      // never the corpus — an unbounded TOP turns it into a driver-sized
      // collect of every matching doc; refuse at parse time
      require(kk >= 1 && kk <= 10000,
        s"BM25 INDEX … TOP $kk: k must be in [1, 10000]")
      GraftBm25Command(dir,
        query.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          .filter(_.nonEmpty).toSeq,
        kk)
    case CreateBm25(replace, dir, table) =>
      GraftBm25BuildCommand(dir, lakeRoot(table), replace != null)
    case OptimizeBm25(dir) =>
      GraftBm25MaintainCommand(dir, rebucket = None)
    case RebucketBm25(dir, n) =>
      GraftBm25MaintainCommand(dir, rebucket = Some(n.toInt))
    case DescribeBm25(dir) =>
      GraftBm25DescribeCommand(dir)
    case Ann(dir, firstN, id, vec, k, nprobe) =>
      val kk = Option(k).map(_.toInt).getOrElse(10)
      require(kk >= 1 && kk <= 10000,
        s"ANN INDEX … TOP $kk: k must be in [1, 10000]")
      val n = Option(firstN).map(_.toInt)
      // FIRST n collects n×k rows on the driver — bound it the way TOP
      // is bounded
      require(n.forall(v => v >= 1 && v <= 1000),
        s"ANN INDEX … QUERY FIRST ${n.get}: n must be in [1, 1000]")
      GraftAnnCommand(dir, n, Option(id).map(_.toLong), kk,
        Option(nprobe).map(_.toInt).getOrElse(2),
        Option(vec).map(_.split(",").map(_.trim.toFloat).toSeq))
    case CreateAnn(replace, dir, table) =>
      GraftAnnBuildCommand(dir, lakeRoot(table), replace != null)
    case OptimizeAnn(dir) =>
      GraftAnnMaintainCommand(dir)
    case Hybrid(terms, bm25Dir, annDir, id, vec, k, nprobe) =>
      val kk = Option(k).map(_.toInt).getOrElse(10)
      require(kk >= 1 && kk <= 10000,
        s"HYBRID QUERY … TOP $kk: k must be in [1, 10000]")
      GraftHybridCommand(
        terms.toLowerCase(java.util.Locale.ROOT).split("\\s+")
          .filter(_.nonEmpty).toSeq,
        bm25Dir, annDir, Option(id).map(_.toLong),
        Option(vec).map(_.split(",").map(_.trim.toFloat).toSeq),
        kk, Option(nprobe).map(_.toInt).getOrElse(2))
    case DescribeAnn(dir) =>
      GraftAnnDescribeCommand(dir)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** `BM25 INDEX '<dir>' QUERY '<terms>' [TOP k]` — the SQL entry point
  * for inverted-index serving (the reference's serving path is
  * SQL-first; this is its probe reached without Scala): scores the
  * whitespace-split query terms against the frozen postings index at
  * `<dir>` and returns the top-k (doc_id, score, rk). Dispatch matches
  * the Scala surface ([[graft.streaming.StreamingPostings.bm25TopK]]):
  * a lake-following index (generation-stamped postings) serves
  * tombstone-corrected; a plain frozen index serves the direct probe;
  * the bucket fan-out comes from the index's `_graft_buckets`
  * descriptor. Cost is O(matched postings) — bucket-pruned scan,
  * broadcast stats, bounded-heap ranking — and the eager collect is the
  * k result rows, never the corpus.
  */
case class GraftBm25Command(indexDir: String, terms: Seq[String], k: Int)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.types.DoubleType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("doc_id", LongType, nullable = true)(),
    AttributeReference("score", DoubleType, nullable = true)(),
    AttributeReference("rk", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] =
    graft.streaming.StreamingPostings.bm25TopK(session, indexDir, terms, k)
      .collect().toIndexedSeq
}

/** `CREATE [OR REPLACE] BM25 INDEX '<dir>' FROM <table>` — build the
  * frozen inverted index of a lake table's (doc_id, text) through SQL:
  * one DV-applied snapshot read, one tokenize shuffle, bucketed postings
  * + a stats row (the [[graft.operators.RetrievalOps.writeIndex]] layout
  * the probe statement serves). With CREATE/query/OPTIMIZE/REBUCKET the
  * whole sparse-retrieval lifecycle is SQL-reachable — the reference's
  * SQL-first serving story extended to index administration.
  *
  * CREATE recursively replaces `<dir>` (a leftover ledger/descriptor/
  * tombstone layout from a prior streaming life must not leak into the
  * fresh build) — so a mistyped path in SQL text must NOT be able to
  * destroy arbitrary data: plain CREATE refuses any target that is not
  * absent, empty, or recognizably a BM25 index (postings/stats layout,
  * descriptor, or batch ledger present). `OR REPLACE` is the explicit
  * opt-in for clobbering anything else.
  */
case class GraftBm25BuildCommand(indexDir: String, tableRoot: String,
    replace: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("n_docs", LongType, nullable = true)(),
    AttributeReference("total_len", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = {
    val dirF = new java.io.File(indexDir)
    val isIndexShaped =
      new java.io.File(dirF, "postings").isDirectory ||
        new java.io.File(dirF, "stats").isDirectory ||
        new java.io.File(dirF, "_graft_buckets").exists() ||
        new java.io.File(dirF, "_graft_postings_batches").exists()
    // A regular FILE at the path must refuse too: listFiles() is null on
    // files, and None.forall is vacuously true — a mistyped file target
    // would silently pass the guard and be rmDir'd (the exact failure
    // class this guard exists to stop). Only absent paths, EMPTY
    // directories, or index-shaped dirs pass without OR REPLACE.
    val isEmptyOrAbsent = !dirF.exists() ||
      (dirF.isDirectory && Option(dirF.listFiles()).forall(_.isEmpty))
    require(replace || isEmptyOrAbsent || isIndexShaped,
      s"CREATE BM25 INDEX: '$indexDir' exists and is not a BM25 index — " +
        "refusing to delete it (a lake table or other data would be " +
        "destroyed). Point at an absent/empty path, or use " +
        "CREATE OR REPLACE BM25 INDEX to overwrite explicitly.")
    val docs = graft.sources.LakeIO.readMoR(session, tableRoot)
      .select("doc_id", "text")
    graft.sources.LakeIO.rmDir(indexDir)
    graft.operators.RetrievalOps.writeIndex(indexDir, docs, "overwrite")
    session.read.parquet(indexDir + "/stats").collect().toIndexedSeq
  }
}

/** `OPTIMIZE BM25 INDEX '<dir>'` (purging compaction: fold per-batch
  * files, apply tombstones, clear them) and
  * `ALTER BM25 INDEX '<dir>' REBUCKET <n>` (fan-out evolution) — the
  * index maintenance cadence as SQL, mirroring the table-level
  * OPTIMIZE/VACUUM statements. Maintenance contract (stream STOPPED)
  * is the caller's, same as the Scala surface.
  */
case class GraftBm25MaintainCommand(indexDir: String, rebucket: Option[Int])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)(),
    AttributeReference("buckets", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (b, a) = rebucket match {
      case Some(n) => graft.streaming.StreamingPostings.rebucket(session, indexDir, n)
      case None    => graft.streaming.StreamingPostings.compactIndex(session, indexDir)
    }
    Seq(Row(b.toLong, a.toLong,
      graft.streaming.StreamingPostings.indexBuckets(indexDir).toLong))
  }
}

/** `DESCRIBE BM25 INDEX '<dir>'` — operator introspection for the
  * serving index (DESCRIBE DETAIL's sibling): bucket fan-out, live file
  * counts per layout, committed-batch count, corpus totals (stats rows
  * summed MINUS tombstone token mass — what a probe would serve), and
  * the live tombstone-row count, i.e. the number that tells an operator
  * when to run `OPTIMIZE BM25 INDEX`. Metadata + stats/tombstone reads
  * only — postings are never scanned (file counts come from listings).
  */
case class GraftBm25DescribeCommand(indexDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("buckets", LongType, nullable = false)(),
    AttributeReference("posting_files", LongType, nullable = false)(),
    AttributeReference("stats_files", LongType, nullable = false)(),
    AttributeReference("committed_batches", LongType, nullable = false)(),
    AttributeReference("n_docs", LongType, nullable = true)(),
    AttributeReference("total_len", LongType, nullable = true)(),
    AttributeReference("tombstone_rows", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    def parquetsUnder(sub: String): Long = {
      val base = new java.io.File(indexDir, sub)
      Option(base.listFiles()).getOrElse(Array.empty).iterator.flatMap { d =>
        if (d.isDirectory) Option(d.listFiles()).getOrElse(Array.empty).iterator
        else Iterator(d)
      }.count(f => f.isFile && f.getName.endsWith(".parquet")).toLong
    }
    val tombs = graft.streaming.StreamingPostings.readTombstones(session, indexDir)
    val nTombs = tombs.count()
    // corpus totals through the SAME correction serving applies
    // (RetrievalOps.correctedStatsGen — the function every tombstoned
    // probe routes through), so DESCRIBE reports exactly what a probe
    // would serve; a hand-rolled subtraction here drifted from serving
    // on delete-then-reinsert histories
    val st = graft.operators.RetrievalOps.correctedStatsGen(
      session.read.parquet(indexDir + "/stats"), tombs).head
    // the ledger counts committed BATCH lines (compaction watermarks are
    // negative ids — maintenance events, not ingest batches)
    val batches = graft.streaming.BatchLedgerIndex
      .committedBatches(indexDir, "_graft_postings_batches").count(_ >= 0L)
    Seq(Row(
      graft.streaming.StreamingPostings.indexBuckets(indexDir).toLong,
      parquetsUnder("postings"), parquetsUnder("stats"), batches.toLong,
      if (st.isNullAt(0)) null else st.getLong(0),
      if (st.isNullAt(1)) null else st.getLong(1),
      nTombs))
  }
}

/** `HYBRID QUERY '<terms>' BM25 INDEX '<dir>' ANN INDEX '<dir>'
  * (ID id | VEC '<f,f,…>') [TOP k] [NPROBE p]` — reciprocal-rank fusion
  * served ENTIRELY from the two indexes through one SQL statement: the
  * text side is the inverted-index probe at k=100
  * ([[graft.streaming.StreamingPostings.bm25TopK]] — tombstone-corrected
  * when the index is lake-following), the dense side is the IVF probe at
  * k=100 ([[graft.streaming.StreamingAnn.annTopK]] — same frozen/follow
  * dispatch, ID or raw-VEC query), and the fusion is the hybrid_rrf
  * contract (1/(60+r) decimals, absent side contributes 0, bounded-heap
  * top-k). Zero corpus scans, zero re-tokenizes — the production
  * retrieval stack's serving path as one statement. The eager collect is
  * the k fused result rows.
  */
case class GraftHybridCommand(terms: Seq[String], bm25Dir: String,
    annDir: String, queryId: Option[Long], queryVec: Option[Seq[Float]],
    k: Int, nprobe: Int) extends LeafRunnableCommand {
  import org.apache.spark.sql.types.DoubleType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("id", LongType, nullable = true)(),
    AttributeReference("r_text", LongType, nullable = true)(),
    AttributeReference("r_vec", LongType, nullable = true)(),
    AttributeReference("rrf", DoubleType, nullable = true)(),
    AttributeReference("rk", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val rt = graft.streaming.StreamingPostings
      .bm25TopK(session, bm25Dir, terms, k = 100)
      .select(col("doc_id"), col("rk").as("r_text"))
    val rv = graft.streaming.StreamingAnn
      .annTopK(session, annDir, None, queryId, k = 100, nprobe, queryVec)
      .select(col("vec_id"), col("rn").as("r_vec"))
    graft.operators.RetrievalOps.fuseRrfRanks(rt, rv, k)
      .collect().toIndexedSeq
  }
}

/** `CREATE TABLE <target> [SHALLOW] CLONE <source> [VERSION AS OF n]` —
  * clone a lake table (or one of its historical snapshots) into a new
  * INDEPENDENT table: metadata-only cost (manifest entries, stats, row
  * counts and deletion vectors carried verbatim; data files hard-linked,
  * byte-copy fallback), independent lifecycle (writes on either side
  * never affect the other; a source VACUUM can never break the clone).
  * Semantics and carried metadata in
  * [[org.apache.spark.sql.graft.ManifestFileIndex.cloneTo]]. Returns
  * (src_version, files, bytes) — `bytes` is the LOGICAL size shared via
  * links, not bytes copied.
  */
case class GraftCloneCommand(srcRoot: String, dstRoot: String,
    travel: Option[Int]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("src_version", LongType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, files, bytes) =
      ManifestFileIndex.cloneTo(srcRoot, dstRoot, travel)
    Seq(Row(v.toLong, files, bytes))
  }
}

/** `ANN INDEX '<dir>' QUERY (FIRST n | ID id | VEC '<f,f,…>') [TOP k]
  * [NPROBE p]` — the SQL entry point for dense-index serving (the
  * reference's serving path is SQL-first; GraftBm25Command's dense
  * sibling): probes the self-contained IVF index at `<dir>` — frozen
  * (`CREATE ANN INDEX`) or lake-following
  * ([[graft.streaming.StreamingAnn.followLake]]), dispatch in
  * [[graft.streaming.StreamingAnn.annTopK]] — and returns
  * (q_id, cell, vec_id, cos, rn) top-k per query. FIRST/ID take query
  * vectors from the live index rows; VEC is the embed-the-query shape
  * (a raw probe vector, q_id = -1), so the statement needs no table at
  * all. The eager collect is ≤ n×k result rows (both
  * parse-time-clamped), never the corpus.
  */
case class GraftAnnCommand(indexDir: String, firstN: Option[Int],
    queryId: Option[Long], k: Int, nprobe: Int,
    queryVec: Option[Seq[Float]] = None)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.types.DoubleType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("q_id", LongType, nullable = true)(),
    AttributeReference("cell", LongType, nullable = true)(),
    AttributeReference("vec_id", LongType, nullable = true)(),
    AttributeReference("cos", DoubleType, nullable = true)(),
    AttributeReference("rn", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] =
    graft.streaming.StreamingAnn
      .annTopK(session, indexDir, firstN, queryId, k, nprobe, queryVec)
      .collect().toIndexedSeq
}

/** `CREATE [OR REPLACE] ANN INDEX '<dir>' FROM <table>` — build the
  * frozen self-contained IVF index of a lake table's
  * (vec_id, embedding) through SQL: one DV-applied snapshot read,
  * k-means training (deterministic — the trained-IVF oracle certifies
  * the build), cell assignment, and the
  * [[graft.operators.Similarity.writeFrozenIvf]] layout (broadcast-sized
  * centroids + cell-partitioned vector rows). Same clobber guard as
  * CREATE BM25 INDEX: plain CREATE refuses any target that is not
  * absent, empty, or recognizably an ANN index; `OR REPLACE` is the
  * explicit opt-in.
  */
case class GraftAnnBuildCommand(indexDir: String, tableRoot: String,
    replace: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("n_vectors", LongType, nullable = false)(),
    AttributeReference("k_centroids", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val dirF = new java.io.File(indexDir)
    val isIndexShaped =
      new java.io.File(dirF, "cells").isDirectory ||
        new java.io.File(dirF, "centroids").isDirectory ||
        new java.io.File(dirF, "_graft_ann_batches").exists()
    // same file-target refusal as the BM25 guard: listFiles() is null on
    // a regular file and None.forall is vacuously true
    val isEmptyOrAbsent = !dirF.exists() ||
      (dirF.isDirectory && Option(dirF.listFiles()).forall(_.isEmpty))
    require(replace || isEmptyOrAbsent || isIndexShaped,
      s"CREATE ANN INDEX: '$indexDir' exists and is not an ANN index — " +
        "refusing to delete it (a lake table or other data would be " +
        "destroyed). Point at an absent/empty path, or use " +
        "CREATE OR REPLACE ANN INDEX to overwrite explicitly.")
    val vecs = graft.sources.LakeIO.readMoR(session, tableRoot)
      .select("vec_id", "embedding")
    graft.sources.LakeIO.rmDir(indexDir)
    graft.operators.Similarity.writeFrozenIvf(indexDir, vecs)
    val cents = session.read.parquet(indexDir + "/centroids")
    Seq(Row(session.read.parquet(indexDir + "/cells").count(),
      cents.select("cluster").distinct().count()))
  }
}

/** `OPTIMIZE ANN INDEX '<dir>'` — purging compaction of a
  * lake-following index (fold per-batch cell files, apply the
  * generation-aware tombstones, clear them —
  * [[graft.streaming.StreamingAnn.compactFollow]]); on a frozen
  * `CREATE ANN INDEX` layout there is nothing to fold (one generation,
  * no tombstones), so the command reports the unchanged file count
  * rather than failing — idempotent maintenance, like OPTIMIZE on an
  * already-compacted table. Maintenance contract (stream STOPPED) is
  * the caller's, same as the Scala surface.
  */
case class GraftAnnMaintainCommand(indexDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (b, a) =
      if (new java.io.File(indexDir, "_graft_ann_batches").exists())
        graft.streaming.StreamingAnn.compactFollow(session, indexDir)
      else {
        val n = GraftAnnDescribeCommand.parquetsUnder(indexDir, "cells")
        (n.toInt, n.toInt)
      }
    Seq(Row(b.toLong, a.toLong))
  }
}

/** `DESCRIBE ANN INDEX '<dir>'` — operator introspection for the dense
  * serving index (DESCRIBE BM25 INDEX's sibling): centroid count, live
  * cell-file count, committed-batch count, the LIVE vector count
  * (through the SAME generation-kill predicate serving applies — never
  * a raw row count minus tombstones), and the live tombstone-row count,
  * i.e. the number that tells an operator when to run
  * `OPTIMIZE ANN INDEX`.
  */
case class GraftAnnDescribeCommand(indexDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("k_centroids", LongType, nullable = false)(),
    AttributeReference("cell_files", LongType, nullable = false)(),
    AttributeReference("committed_batches", LongType, nullable = false)(),
    AttributeReference("live_vectors", LongType, nullable = false)(),
    AttributeReference("tombstone_rows", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val S = graft.streaming.StreamingAnn
    val cents = session.read.parquet(indexDir + "/centroids")
    val ledgered = new java.io.File(indexDir, "_graft_ann_batches").exists()
    val (cells, tombs) =
      if (ledgered) S.readFollowIndex(session, indexDir)
      else (session.read.parquet(indexDir + "/cells"),
        S.emptyTombstones(session))
    val t = tombs.select(col("vec_id").as("t_id"), col("gen").as("t_gen"))
    val live = cells.join(broadcast(t),
      cells("vec_id") === t("t_id") && cells("gen") < t("t_gen"),
      "left_anti").count()
    val batches =
      if (ledgered)
        graft.streaming.BatchLedgerIndex
          .committedBatches(indexDir, "_graft_ann_batches").count(_ >= 0L)
      else 0
    Seq(Row(cents.select("cluster").distinct().count(),
      GraftAnnDescribeCommand.parquetsUnder(indexDir, "cells"),
      batches.toLong, live, tombs.count()))
  }
}

object GraftAnnDescribeCommand {
  /** Parquet-file count one partition level under `dir/sub` (listing
    * only — data is never scanned).
    */
  private[plans] def parquetsUnder(dir: String, sub: String): Long = {
    val base = new java.io.File(dir, sub)
    Option(base.listFiles()).getOrElse(Array.empty).iterator.flatMap { d =>
      if (d.isDirectory) Option(d.listFiles()).getOrElse(Array.empty).iterator
      else Iterator(d)
    }.count(f => f.isFile && f.getName.endsWith(".parquet")).toLong
  }
}

/** `VACUUM`: delete crashed-write debris (files no snapshot references,
  * past the in-flight grace period); with `RETAIN n SNAPSHOTS`, first
  * expire all but the last n snapshots and delete data files only they
  * referenced. Returns the file accounting. Metadata-scan only — never
  * reads table data.
  */
case class GraftVacuumCommand(root: String, retain: Option[Int],
    unit: Option[String] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("expired_data_files", LongType, nullable = false)(),
    AttributeReference("orphan_files_removed", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val expired = (retain, unit) match {
      case (Some(n), Some("HOURS")) =>
        // Delta-shaped retention: age-based, head + tags always survive
        ManifestFileIndex.expireSnapshotsOlderThan(root,
          System.currentTimeMillis() - n * 3600L * 1000L)
      case (Some(k), _) => ManifestFileIndex.expireSnapshots(root, k)
      case _            => 0
    }
    val orphans = ManifestFileIndex.removeOrphanFiles(root)
    Seq(Row(expired.toLong, orphans.toLong))
  }
}

/** `RESTORE [TABLE] t TO VERSION AS OF n` (Delta syntax): roll the table
  * back to snapshot n's state as a NEW commit — [[ManifestFileIndex
  * .restoreTo]] carries n's files, deletion vectors, partition spec and
  * frozen schema; history stays append-only so the undone snapshots
  * remain travelable and a second RESTORE undoes the first.
  */
case class GraftRestoreCommand(root: String, version: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    ManifestFileIndex.restoreTo(root, version)
    Seq(Row(version.toLong,
      ManifestFileIndex.headVersion(root).getOrElse(0).toLong))
  }
}

/** `OPTIMIZE [ZORDER BY (a, b)]`: copy-on-write maintenance rewrite —
  * plain form compacts fragmented partitions to one file each, ZORDER
  * form re-clusters every partition along the Morton curve so the
  * manifest's per-file bounds turn predicates on either column into
  * planning-time file skips. Commits a new snapshot; earlier versions
  * stay readable until vacuumed.
  */
case class GraftOptimizeCommand(root: String, zorder: Option[(String, String)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    def liveFiles: Int =
      ManifestFileIndex.read(root, None).map(_._2.size).getOrElse(0)
    val before = liveFiles
    zorder match {
      case Some((a, b)) => graft.sources.LakeIO.optimizeZOrder(session, root, a, b)
      case None         => graft.sources.LakeIO.compactSnapshots(session, root)
    }
    Seq(Row(before.toLong, liveFiles.toLong,
      ManifestFileIndex.headVersion(root).getOrElse(0).toLong))
  }
}

/** `DESCRIBE DETAIL`: one row of table-level metadata (Delta parity) —
  * location, current version, live file/partition/byte accounting and
  * the partition column, read from the head manifest alone.
  */
case class GraftDetailCommand(root: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("partition_column", StringType, nullable = true)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("num_partitions", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("num_deletion_vectors", LongType, nullable = false)(),
    AttributeReference("num_tags", LongType, nullable = false)(),
    AttributeReference("num_constraints", LongType, nullable = false)(),
    AttributeReference("num_staged", LongType, nullable = false)(),
    // schema-evolution surfaces: renamed fields' name histories
    // ("old -> new; …", null when never renamed) and the partition ERAS
    // live files were written under (>1 entry = evolution mid-convergence)
    AttributeReference("column_mapping", StringType, nullable = true)(),
    AttributeReference("partition_eras", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (partCol, entries) = ManifestFileIndex.read(root, None)
      .getOrElse(sys.error(s"DESCRIBE DETAIL: no committed manifest under $root"))
    val staged = Option(
      new java.io.File(root, ManifestFileIndex.SnapshotDir).listFiles())
      .getOrElse(Array.empty)
      .count(f => f.getName.startsWith("staged-") && f.getName.endsWith(".tsv"))
    val mapping = graft.sources.LakeIO.columnHistories(root) match {
      case Seq() => null
      case hs    => hs.map(_.mkString(" -> ")).mkString("; ")
    }
    val eras = entries.iterator.map(_.relPath.takeWhile(_ != '='))
      .toSeq.distinct.sorted match {
      case Seq() => partCol
      case es    => es.mkString(",")
    }
    Seq(Row("graft-lake", root,
      ManifestFileIndex.headVersion(root).getOrElse(0).toLong,
      partCol, entries.size.toLong,
      entries.iterator.map(_.partValue).toSet.size.toLong,
      entries.iterator.map(_.size).sum,
      ManifestFileIndex.readDvs(root).size.toLong,
      ManifestFileIndex.listRefs(root).size.toLong,
      ManifestFileIndex.listConstraints(root).size.toLong,
      staged.toLong, mapping, eras))
  }
}

/** `SHOW PARTITIONS`: the live partition inventory with per-partition
  * file/row/byte accounting, straight from the head manifest — zero data
  * files opened (rows come from the manifest's per-file footer counts;
  * -1 when a pre-rowcount manifest doesn't know). The SQL twin of the
  * MetadataOnlyCount partition-inventory rewrite.
  */
case class GraftShowPartitionsCommand(root: String) extends LeafRunnableCommand {
  import org.apache.spark.sql.types.StringType
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (partCol, entries) = ManifestFileIndex.read(root, None)
      .getOrElse(sys.error(s"SHOW PARTITIONS: no committed manifest under $root"))
    entries.groupBy(_.partValue).toSeq.sortBy(_._1).map { case (pv, es) =>
      val rows = if (es.forall(_.rowCount >= 0L)) es.iterator.map(_.rowCount).sum
                 else -1L
      Row(s"$partCol=$pv", es.size.toLong, rows, es.iterator.map(_.size).sum)
    }
  }
}

/** `DESCRIBE HISTORY`: the snapshot log as rows — version, commit time,
  * live-file accounting (see `LakeIO.history`). O(versions) metadata
  * reads, zero data-file opens.
  */
case class GraftHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("committed_at", TimestampType, nullable = true)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_partitions", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    graft.sources.LakeIO.history(session, root).collect().toIndexedSeq
}

/** `ALTER TABLE … CREATE/DROP TAG`: named immutable snapshot refs
  * (Iceberg tag semantics) — `CREATE TAG name` pins the head (or an
  * explicit `AS OF VERSION v`), after which `VERSION AS OF 'name'` reads
  * it forever and VACUUM RETAIN never expires it.
  */
case class GraftTagCommand(root: String, name: String,
    version: Option[Int], drop: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("tag", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    if (drop) {
      val v = ManifestFileIndex.resolveRef(root, name).getOrElse(
        sys.error(s"no tag '$name' under $root"))
      ManifestFileIndex.dropTag(root, name)
      Seq(Row(name, v.toLong))
    } else {
      val v = graft.sources.LakeIO.tagSnapshot(root, name, version)
      Seq(Row(name, v.toLong))
    }
}

/** `ALTER TABLE … ADD CONSTRAINT name CHECK (expr)` / `DROP CONSTRAINT`
  * (Delta parity): named SQL predicates stored in table metadata and
  * enforced on every row-introducing write. ADD scans the head first —
  * a constraint that existing rows violate is refused, so a committed
  * constraint is a whole-table invariant. SQL-standard NULL semantics:
  * only rows where the predicate is FALSE violate.
  */
case class GraftConstraintCommand(root: String, name: String,
    check: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("constraint", StringType, nullable = false)(),
    AttributeReference("expr", StringType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] = check match {
    case Some(expr) =>
      graft.sources.LakeIO.addConstraint(session, root, name, expr)
      Seq(Row(name, expr))
    case None =>
      val prev = ManifestFileIndex.listConstraints(root)
        .collectFirst { case (n, e) if n == name => e }
      graft.sources.LakeIO.dropConstraint(root, name)
      Seq(Row(name, prev.orNull))
  }
}

/** `SHOW CONSTRAINTS IN t`: every table constraint and its predicate. */
case class GraftShowConstraintsCommand(root: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("constraint", StringType, nullable = false)(),
    AttributeReference("expr", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    ManifestFileIndex.listConstraints(root).map { case (n, e) => Row(n, e) }
}

/** `SHOW BRANCHES IN t`: every open branch, its staged-append count and
  * the main snapshot it is based on.
  */
case class GraftShowBranchesCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("branch", StringType, nullable = false)(),
    AttributeReference("n_appends", LongType, nullable = false)(),
    AttributeReference("base_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    graft.sources.LakeIO.listBranches(root).map {
      case (n, k, base) => Row(n, k.toLong, base.toLong)
    }
}

/** `ALTER TABLE t PUBLISH BRANCH b` — one squashed OCC delta commit of
  * every branch append, rebased over anything committed on main since the
  * branch base; `DROP BRANCH b` abandons the branch's never-live files.
  */
case class GraftBranchCommand(root: String, name: String, publish: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("branch", StringType, nullable = false)(),
    AttributeReference("published_version", LongType, nullable = true)())
  override def run(session: SparkSession): Seq[Row] =
    if (publish) {
      val v = graft.sources.LakeIO.publishBranch(root, name)
      Seq(Row(name, v.toLong))
    } else {
      graft.sources.LakeIO.dropBranch(root, name)
      Seq(Row(name, null))
    }
}

/** `SHOW TAGS IN t`: every named ref and the version it pins. */
case class GraftShowTagsCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("tag", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    ManifestFileIndex.listRefs(root).toSeq.sortBy(_._1)
      .map { case (n, v) => Row(n, v.toLong) }
}
