package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Op
import graft.sources.Tables
import graft.syntax._

/** Retrieval surface a training-data pipeline runs next to curation:
  * sparse lexical ranking (BM25) and sparse+dense hybrid fusion (RRF) —
  * the standard pair behind "find documents like/for this query" jobs
  * (dedup auditing, eval-set mining, topic filtering).
  *
  * Exactness strategy (same as TextOps/Similarity): every per-term score
  * is a rational of exact integers under IEEE double ops written in the
  * SAME evaluation order as the oracle SQL, rounded at 6 dp into
  * DECIMAL(18,6) BEFORE summation — so the per-doc totals are
  * order-independent and bit-identical across engines, and the ranking
  * layer (the thing under test) compares decimals, never raw doubles.
  *
  * BM25 uses the log-free idf (N-df+0.5)/(df+0.5) for the same reason
  * tfidf_top_terms drops the log: libm results differ at the ulp across
  * engines and would poison rank comparison; the saturation/ranking
  * behavior under test is unchanged (idf stays monotone in df).
  *
  * 100 TB shape: tf/dl are one fact shuffle each (map-side combined);
  * df is dictionary-sized and BROADCAST; the corpus totals are 1-row
  * broadcast crossJoins (the lazy form — no eager count() job at plan
  * time). RANKING never funnels a corpus-sized set through one task:
  * every top-k is the bounded-heap [[graft.functions.TopKByScore]]
  * aggregate (partial per-partition top-k before the shuffle, one
  * k×partitions-row final merge, rank = posexplode position) — a
  * posting list for a frequent term IS corpus-sized, so a global
  * `row_number` window over the scored candidates would be the
  * scale-killer even though the candidate set is "bounded".
  */
object RetrievalOps {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** Fixed benchmark query — terms present in the synthetic vocabulary. */
  val QueryTerms: Seq[String] = Seq("vector", "join", "slow")

  /** k1 = 1.2, b = 0.75 folded to the three constants the formula needs. */
  private val K1p1 = 2.2   // k1 + 1
  private val K1nb = 0.3   // k1 * (1 - b)
  private val K1b  = 0.9   // k1 * b

  private val sqlDot =
    "list_sum(list_transform(list_zip(%s, %s), z -> z[1] * z[2]))"

  /** Shared BM25 CTE prefix for the oracle SQL (terms → tf/dl/df/totals →
    * per-doc decimal score `sd`). Ends with the `sc` relation.
    */
  private val bm25Cte =
    s"""WITH t0 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
       |            FROM documents),
       |t AS (SELECT doc_id, term FROM t0 WHERE length(term) > 0),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t
       |       WHERE term IN ('vector', 'join', 'slow') GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM t GROUP BY doc_id),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |       FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY term),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |tl AS (SELECT CAST(count(*) AS BIGINT) AS total_len FROM t),
       |c AS (SELECT tf.doc_id,
       |        CAST(round(
       |          ((CAST(n_docs - df AS DOUBLE) * 2.0 + 1.0) / (CAST(df AS DOUBLE) * 2.0 + 1.0))
       |          * (CAST(tf AS DOUBLE) * $K1p1
       |             / (CAST(tf AS DOUBLE) + ($K1nb + $K1b * ((dl * n_docs) / total_len))))
       |        , 6) AS DECIMAL(18,6)) AS contrib
       |      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), n, tl),
       |sc AS (SELECT doc_id, sum(contrib) AS sd FROM c GROUP BY doc_id)""".stripMargin

  /** Per-doc BM25 decimal score `sd` for [[QueryTerms]] (docs with no
    * query term are absent — their score is 0 and they never rank).
    */
  def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val terms = docs(s, d)
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .where(length($"term") > 0)
    val tf = terms.where($"term".isin(QueryTerms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val df = terms.select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
      .where($"term".isin(QueryTerms: _*))
    val n  = docs(s, d).agg(count(lit(1)).as("n_docs"))
    val tl = terms.agg(count(lit(1)).as("total_len"))

    val idf = (($"n_docs" - $"df").cast("double") * 2.0 + 1.0) /
      ($"df".cast("double") * 2.0 + 1.0)
    val tfn = $"tf".cast("double") * K1p1 /
      ($"tf".cast("double") + (lit(K1nb) + lit(K1b) * (($"dl" * $"n_docs") / $"total_len")))
    val contrib = round(idf * tfn, 6).cast(DecimalType(18, 6))

    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(tl))
      .select($"doc_id", contrib.as("contrib"))
      .groupBy($"doc_id").agg(sum($"contrib").as("sd"))
  }

  /** RRF contribution of one rank column: 1/(60+rank) at 6 dp, 0 if the
    * doc is absent from that ranking.
    */
  private def rrfPart(rank: Column): Column =
    coalesce(round(lit(1.0) / (lit(60) + rank), 6).cast(DecimalType(18, 6)),
      lit(BigDecimal(0)).cast(DecimalType(18, 6)))

  /** Exact top-k of (score, id) via the bounded-heap aggregate, emitted
    * as (id, rank). `score` must already be the SCALED-LONG image of the
    * decimal ordering key (see [[graft.functions.TopKByScore]]); rank is
    * the posexplode position — identical to the global
    * `row_number() OVER (ORDER BY score DESC, id)` restricted to the
    * true top-k, with no corpus-sized sort task anywhere in the plan.
    */
  private def topKRanked(scored: DataFrame, k: Int,
      idOut: String, rankOut: String): DataFrame = {
    val topk = udaf(graft.functions.TopKByScore.agg(k))
    scored.agg(topk($"score", $"id").as("top"))
      .select(posexplode($"top").as(Seq("pos", "r")))
      .select($"r.id".as(idOut), $"r.score".as("score"),
        ($"pos" + 1).cast("long").as(rankOut))
  }

  def ops: Seq[Op] = Seq(

    // BM25 top-10 for a fixed 3-term query. Rank compares DECIMAL
    // totals (exact, carried as scaled longs through the bounded-heap
    // top-k — DECIMAL(18,6) × 1e6 is the unscaled long), tie-broken by
    // doc_id. No ranking window: posting lists of frequent terms are
    // corpus-sized, so rank comes from TopKByScore's partial-aggregated
    // heap (≤ 10 rows per partition reach the shuffle).
    Op("bm25_topk",
      (s, d) => {
        val scored = bm25Scored(s, d)
          .select(($"sd" * 1000000).cast("long").as("score"), $"doc_id".as("id"))
        topKRanked(scored, 10, "doc_id", "rk")
          .select($"doc_id", ($"score".cast("double") / 1e6).as("score"), $"rk")
          .orderBy($"rk")
      },
      s"""$bm25Cte
         |SELECT doc_id, CAST(sd AS DOUBLE) AS score, rk FROM (
         |  SELECT doc_id, sd,
         |         CAST(row_number() OVER (ORDER BY sd DESC, doc_id) AS BIGINT) AS rk
         |  FROM sc)
         |WHERE rk <= 10 ORDER BY rk""".stripMargin),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 ranking and a
    // dense cosine ranking against one query vector (vec_id 0, the
    // "embed the query" stand-in; doc_id and vec_id share the id space).
    // Each side contributes its exact TOP-100 CANDIDATE LIST (the
    // standard RRF contract — retrievers return k candidates, not a
    // corpus permutation): ranks within a side's top-100 equal that
    // side's global ranks, and a FULL OUTER join fuses
    // 1/(60+r) + 1/(60+r) with an absent side contributing 0. Top 10 by
    // fused decimal score. 100 TB: BOTH side rankings and the final
    // fused rank run through the bounded-heap TopKByScore aggregate —
    // cosine scoring stays map-only (broadcast query vector), the text
    // side is posting-list work, and no plan node ever sorts more than
    // k×partitions rows in one task. The fused set (≤ 200 rows) is
    // persisted so the rank→attribute join-back replays 200 cached
    // rows, not the scoring lineage. Swapping the dense scan for a
    // frozen-ANN probe (the similarity_ivf_trained recipe) is the
    // recall-for-cost variant; the exact scan is kept here so the
    // oracle stays hash-exact without replicating IVF assignment in SQL.
    Op("hybrid_rrf",
      (s, d) => {
        val rt = topKRanked(
          bm25Scored(s, d)
            .select(($"sd" * 1000000).cast("long").as("score"), $"doc_id".as("id")),
          100, "doc_id", "r_text").drop("score")

        val v = Tables.embeddings(s, d)
          .select($"vec_id", transform($"embedding", _.cast("double")).as("e"))
          .withColumn("nrm", sqrt(Similarity.dot($"e", $"e")))
        val q = broadcast(v.where($"vec_id" === 0)
          .select($"e".as("qe"), $"nrm".as("qn")))
        // round(·,6) then ×1e6 + round: the scaled long is recovered
        // exactly (the double sits within ~1e-10 of its 6-dp integer
        // image), so long order == the oracle's (cos DESC, vec_id) order.
        val cs = v.where($"vec_id" =!= 0).crossJoin(q)
          .select(
            round(round(Similarity.dot($"qe", $"e") / ($"qn" * $"nrm"), 6) * 1e6)
              .cast("long").as("score"),
            $"vec_id".as("id"))
        val rv = topKRanked(cs, 100, "vec_id", "r_vec").drop("score")

        // CACHE LIFETIME: the returned DataFrame is lazy, so this op
        // cannot unpersist before the caller evaluates it — the ≤200-row
        // entry lives until `spark.catalog.clearCache()` (Bench runs it
        // per query; Verify is one-shot). Same documented contract as the
        // Dedup/Similarity persists; interactive users reusing a session
        // for many ad-hoc hybrid_rrf calls should clearCache periodically.
        val fused = rt.join(rv, $"doc_id" === $"vec_id", "full_outer")
          .select(coalesce($"doc_id", $"vec_id").as("id"), $"r_text", $"r_vec",
            (rrfPart($"r_text") + rrfPart($"r_vec")).as("rrf_dec"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

        val top = topKRanked(
          fused.select(($"rrf_dec" * 1000000).cast("long").as("score"), $"id"),
          10, "id", "rk").drop("score")

        top.join(fused, "id")
          .select($"id", $"r_text", $"r_vec", $"rrf_dec".cast("double").as("rrf"), $"rk")
          .orderBy($"rk")
      },
      s"""$bm25Cte,
         |rt AS (SELECT t_id, r_text FROM (
         |       SELECT doc_id AS t_id,
         |              CAST(row_number() OVER (ORDER BY sd DESC, doc_id) AS BIGINT) AS r_text
         |       FROM sc) WHERE r_text <= 100),
         |v0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |       FROM embeddings),
         |nv AS (SELECT vec_id, e, sqrt(${sqlDot.format("e", "e")}) AS nrm FROM v0),
         |qv AS (SELECT e AS qe, nrm AS qn FROM nv WHERE vec_id = 0),
         |cs AS (SELECT vec_id, round(${sqlDot.format("qe", "e")} / (qn * nrm), 6) AS cos
         |       FROM nv, qv WHERE vec_id <> 0),
         |rv AS (SELECT v_id, r_vec FROM (
         |       SELECT vec_id AS v_id,
         |              CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS r_vec
         |       FROM cs) WHERE r_vec <= 100),
         |f AS (SELECT COALESCE(t_id, v_id) AS id, r_text, r_vec,
         |        COALESCE(CAST(round(CAST(1.0 AS DOUBLE) / (60 + r_text), 6) AS DECIMAL(18,6)),
         |                 CAST(0 AS DECIMAL(18,6)))
         |      + COALESCE(CAST(round(CAST(1.0 AS DOUBLE) / (60 + r_vec), 6) AS DECIMAL(18,6)),
         |                 CAST(0 AS DECIMAL(18,6))) AS rrf_dec
         |      FROM rt FULL OUTER JOIN rv ON t_id = v_id)
         |SELECT id, r_text, r_vec, CAST(rrf_dec AS DOUBLE) AS rrf, rk FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY rrf_dec DESC, id) AS BIGINT) AS rk
         |  FROM f)
         |WHERE rk <= 10 ORDER BY rk""".stripMargin)
  )
}
