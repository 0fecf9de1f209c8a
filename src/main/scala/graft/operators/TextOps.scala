package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables
import graft.syntax._

/** Text-analysis operators over `documents` — the training-data-pipeline
  * surface (north star, BASELINE.json): tokenization, token counting,
  * language-ID heuristics, quality scoring, fingerprinting.
  *
  * All built-in codegen'd functions (`split`/`filter`/`regexp_*`/`md5`) —
  * no UDFs, so every op stays inside whole-stage codegen and scales as a
  * pure map over document partitions (zero shuffles except final agg/sort).
  */
object TextOps {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** English stopword list for the language-ID heuristic. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

  private def toks(c: Column): Column = split(lower(c), " ")

  /** Winnowing sketch: per-16-window-block minimum of rolling 8-char
    * window hashes over the normalized text.
    */
  def winnowSketch(text: Column, window: Int = 8, block: Int = 16): Column = {
    val t = lower(trim(text))
    val hashes = transform(
      sequence(lit(1), greatest(length(t) - (window - 1), lit(1))),
      i => xxhash64(t.substr(i, lit(window))))
    transform(sequence(lit(0), floor((size(hashes) - 1) / lit(block)).cast("int")),
      b => array_min(slice(hashes, b * block + 1, lit(block))))
  }

  /** [[winnowSketch]] in the portable hash family: window hashes are md5
    * hex strings, block minima are lexicographic string minima — both
    * reproduce identically in any SQL engine, so the winnowing op is
    * hash-exact against the oracle instead of rows-only (same move as
    * Dedup.PortableMinHash). xxhash64 stays the hot-path form.
    */
  def winnowSketchPortable(text: Column, window: Int = 8, block: Int = 16): Column = {
    val t = lower(trim(text))
    val hashes = transform(
      sequence(lit(1), greatest(length(t) - (window - 1), lit(1))),
      i => md5(t.substr(i, lit(window)).cast("binary")))
    transform(sequence(lit(0), floor((size(hashes) - 1) / lit(block)).cast("int")),
      b => array_min(slice(hashes, b * block + 1, lit(block))))
  }

  def ops: Seq[Op] = Seq(

    // Tokenize + length stats.
    Op("text_stats",
      (s, d) => docs(s, d)
        .select($"doc_id", $"lang", $"n_chars",
          length($"text").cast("long").as("text_len"),
          size(toks($"text")).cast("long").as("n_words"))
        .withColumn("chars_per_word",
          round($"text_len".cast("double") / $"n_words", 4))
        .orderBy($"doc_id"),
      """SELECT doc_id, lang, n_chars,
        |  CAST(length(text) AS BIGINT) AS text_len,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
        |  round(CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')), 4) AS chars_per_word
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Token counting: whitespace tokens + a BPE-ish regex token count.
    Op("token_count",
      (s, d) => docs(s, d)
        .select($"doc_id",
          size(toks($"text")).cast("long").as("ws_tokens"),
          regexp_count(lower($"text"), lit("[a-z0-9]+")).cast("long").as("re_tokens"))
        .orderBy($"doc_id"),
      """SELECT doc_id,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Language-ID heuristic: stopword ratio over tokens (n-gram-free
    // variant of the classic stopword profile method).
    Op("lang_id",
      (s, d) => {
        val stops = array(Stopwords.map(lit): _*)
        docs(s, d)
          .select($"doc_id", $"lang",
            size(toks($"text")).cast("long").as("n_tokens"),
            size(filter(toks($"text"), t => array_contains(stops, t)))
              .cast("long").as("n_stop"))
          .withColumn("stop_ratio", round($"n_stop".cast("double") / $"n_tokens", 4))
          .withColumn("pred_en", $"stop_ratio" >= 0.05)
          .orderBy($"doc_id")
      },
      s"""SELECT doc_id, lang,
         |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(string_split(lower(text), ' '),
         |       t -> list_contains([${Stopwords.map("'" + _ + "'").mkString(",")}], t))) AS BIGINT) AS n_stop,
         |  round(CAST(len(list_filter(string_split(lower(text), ' '),
         |       t -> list_contains([${Stopwords.map("'" + _ + "'").mkString(",")}], t))) AS DOUBLE)
         |     / len(string_split(lower(text), ' ')), 4) AS stop_ratio,
         |  (round(CAST(len(list_filter(string_split(lower(text), ' '),
         |       t -> list_contains([${Stopwords.map("'" + _ + "'").mkString(",")}], t))) AS DOUBLE)
         |     / len(string_split(lower(text), ' ')), 4) >= 0.05) AS pred_en
         |FROM documents ORDER BY doc_id""".stripMargin),

    // Quality scoring: length + punctuation-ratio components.
    Op("quality_score",
      (s, d) => docs(s, d)
        .select($"doc_id",
          length($"text").cast("long").as("text_len"),
          size(toks($"text")).cast("long").as("n_words"),
          length(regexp_replace(lower($"text"), "[a-z0-9 ]", "")).cast("long")
            .as("n_punct"))
        .withColumn("punct_ratio", round($"n_punct".cast("double") / $"text_len", 4))
        .withColumn("score",
          round(least(lit(1.0), $"n_words".cast("double") / 100.0)
            * (lit(1.0) - $"punct_ratio"), 4))
        .orderBy($"doc_id"),
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS text_len,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
        |  round(CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4) AS punct_ratio,
        |  round(least(1.0, CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 100.0)
        |    * (1.0 - round(CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 4)), 4) AS score
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Document fingerprinting: content hash + normalized-content hash
    // (md5 is identical across engines, unlike xxhash64/duckdb-hash).
    Op("doc_fingerprint",
      (s, d) => docs(s, d)
        .select($"doc_id", md5($"text".cast("binary")).as("fp"),
          md5(lower(trim($"text")).cast("binary")).as("fp_norm"))
        .orderBy($"doc_id"),
      """SELECT doc_id, md5(text) AS fp, md5(lower(trim(text))) AS fp_norm
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Rolling-hash winnowing sketch (MOSS-style): hash every 8-char
    // window of the normalized text, keep the minimum per 16-window
    // block. Docs are compared by sketch overlap — a one-char edit
    // perturbs at most 1-2 block minima, so near-identical docs share
    // most sketch entries. Keyed form uses the portable md5 family →
    // hash-exact against the oracle; TextOpsSpec keeps the
    // overlap/edit-tolerance properties on the xxhash64 hot path.
    // The sketch is emitted CSV-serialized (array → joined string): the
    // driver's pandas harness can't sort top-level array columns, and
    // the joined form carries identical information.
    Op("doc_winnow_fingerprint",
      (s, d) => docs(s, d)
        .select($"doc_id",
          array_join(winnowSketchPortable($"text"), ",").as("sketch"))
        .orderBy($"doc_id"),
      """WITH t0 AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
        |h0 AS (SELECT doc_id,
        |         [md5(substr(t, i, 8))
        |          for i in range(1, greatest(length(t) - 7, 1) + 1)] AS hs
        |       FROM t0),
        |h AS (SELECT doc_id, generate_subscripts(hs, 1) AS i, unnest(hs) AS h
        |      FROM h0),
        |b AS (SELECT doc_id, (i - 1) // 16 AS blk, min(h) AS mn
        |      FROM h GROUP BY doc_id, (i - 1) // 16)
        |SELECT doc_id, string_agg(mn, ',' ORDER BY blk) AS sketch
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // TF-IDF-lite top terms per document: score = tf × (N/df) — the log
    // damping is dropped so scores are exact integer ratios (log() libm
    // results differ across engines at the ulp level and would poison
    // rank comparisons; the ranking layer is what's under test).
    Op("tfidf_top_terms",
      (s, d) => {
        val terms = docs(s, d)
          .select($"doc_id", explode(toks($"text")).as("term"))
          .where(length($"term") > 0)
        val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        val df = terms.select($"doc_id", $"term").distinct()
          .groupBy($"term").agg(count(lit(1)).as("df"))
        // Corpus size joined in lazily (1-row broadcast) rather than an
        // eager docs.count() job fired during query construction.
        val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
        import org.apache.spark.sql.expressions.Window
        tf.join(df, "term")
          .crossJoin(broadcast(n))
          .withColumn("score", $"tf".cast("double") * $"n_docs" / $"df")
          .withColumn("rk", row_number().over(
            Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")).cast("long"))
          .where($"rk" <= 3)
          .select($"doc_id", $"term", $"tf", $"df", $"score", $"rk")
          .orderBy($"doc_id", $"rk")
      },
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |t2 AS (SELECT doc_id, term FROM terms WHERE length(term) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM t2) GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
        |         CAST(df.df AS BIGINT) AS df,
        |         CAST(tf.tf AS DOUBLE) * (SELECT n FROM n) / df.df AS score
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, df, score, rk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |            ORDER BY score DESC, term) AS BIGINT) AS rk
        |  FROM scored)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin),

    // Token-rarity quality score (the KenLM-perplexity stand-in): mean
    // IDF of a doc's tokens, repetition included — common-word soup
    // scores low, rare-token docs high. 100 TB shape: the document-
    // frequency table is vocabulary-sized (≪ corpus), so it broadcasts;
    // the token stream is probed map-side and only the per-doc partial
    // sums shuffle. Float determinism per the engine invariant: each
    // ln(idf) rounds at 6 dp into DECIMAL sums (order-independent),
    // one final double division.
    Op("rarity_score",
      (s, d) => {
        val terms = docs(s, d)
          .select($"doc_id", explode(toks($"text")).as("term"))
          .where(length($"term") > 0)
        val dfT = terms.select($"doc_id", $"term").distinct()
          .groupBy($"term").agg(count(lit(1)).as("df"))
        val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
        terms.join(broadcast(dfT), "term")
          .crossJoin(broadcast(n))
          .select($"doc_id",
            round(log($"n_docs".cast("double") / $"df"), 6)
              .cast("decimal(18,6)").as("idf"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum($"idf").as("sidf"))
          .select($"doc_id", $"n_tokens",
            ($"sidf".cast("double") / $"n_tokens").as("rarity"))
          .orderBy($"doc_id")
      },
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |t2 AS (SELECT doc_id, term FROM terms WHERE length(term) > 0),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM t2) GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CAST(round(ln(CAST((SELECT n FROM n) AS DOUBLE) / df), 6)
        |                     AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS rarity
        |FROM t2 JOIN df USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // Per-language corpus rollup.
    Op("lang_stats",
      (s, d) => docs(s, d)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          round(sum($"n_chars").cast("double") / count(lit(1)), 4).as("avg_chars"))
        .orderBy($"lang"),
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),

    // Top terms across the corpus: tokenize → explode → count → top 20
    // (tf-idf-lite; the shuffle is by term with map-side partial counts).
    Op("top_terms",
      (s, d) => docs(s, d)
        .select(explode(toks($"text")).as("term"))
        .where(length($"term") > 0)
        .groupBy($"term")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"term")
        .limit(20),
      """SELECT term, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
        |WHERE length(term) > 0
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin),

    // Bigram-LM quality score — the CCNet/Gopher-style LM filter, self-
    // trained on the corpus: MLE bigram model P(w2|w1) = C(w1,w2)/C(w1·),
    // each doc scored by its mean log conditional probability (docs full
    // of corpus-typical word transitions score high; noise scores low).
    // Shape at 100 TB (r14 rework, guide §1.2/§2.3): bigram extraction
    // is map-only (array transform, no shuffle); the corpus explode runs
    // TWICE (model pass + scoring pass) and never three times — the
    // unigram table derives from the bigram table (C(w1·) = Σ_w2
    // C(w1,w2), a vocabulary-sized re-aggregate) instead of a third
    // corpus pass, and the per-pair log probability is pre-joined on the
    // vocabulary-sized side so the corpus joins ONCE on (w1,w2) instead
    // of once on the pair and again on w1. Vocabulary-sized keys, never
    // an unbounded broadcast. Per-term logs round at 6 dp into
    // DECIMAL(18,6) (the rarity_score recipe) so the distributed sum is
    // order-independent and hash-exact against the oracle.
    Op("lm_score_bigram",
      (s, d) => {
        val arr = filter(toks($"text"), t => length(t) > 0)
        val docsT = docs(s, d)
          .select($"doc_id", arr.as("a"))
          .where(size($"a") >= 2)
        val bg = docsT.select($"doc_id", explode(
            expr("transform(sequence(0, size(a)-2), i -> struct(a[i] AS w1, a[i+1] AS w2))"))
            .as("b"))
          .select($"doc_id", $"b.w1", $"b.w2")
        val c12 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
        // C(w1·) from the bigram counts: Σ_w2 C(w1,w2) ≡ count of bigram
        // instances led by w1 — identical to aggregating the corpus again
        val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
        val lp = c12.join(c1, Seq("w1"))
          .select($"w1", $"w2",
            round(log($"c12".cast("double") / $"c1".cast("double")), 6)
              .cast("decimal(18,6)").as("lp"))
        bg.join(lp, Seq("w1", "w2"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum($"lp").as("slp"))
          .select($"doc_id", $"n_bigrams",
            ($"slp".cast("double") / $"n_bigrams").as("avg_logp"))
          .orderBy($"doc_id")
      },
      """WITH toked AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS a
        |  FROM documents),
        |long_docs AS (SELECT doc_id, a FROM toked WHERE len(a) >= 2),
        |bg AS (
        |  SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
        |  FROM (SELECT doc_id, a, unnest(range(1, len(a))) AS i FROM long_docs)),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1)
        |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(CAST(round(ln(CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)), 6)
        |               AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_logp
        |FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY bg.doc_id ORDER BY doc_id""".stripMargin)
  )
}
