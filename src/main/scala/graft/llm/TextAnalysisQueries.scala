package graft.llm

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import LlmQueries._

/** Text-analysis registry: token/quality/repetition stats, chunking,
  * packing, LM scoring, PMI, CMS heavy hitters, profiling, language id,
  * vocabulary encode, fingerprints. Shared DuckDB replay fragments live
  * in [[LlmQueries]]. */
object TextAnalysisQueries {

  val all: Seq[Q] = Seq(
    // token statistics
    Q("q_token_stats",
      (s, d) => TextAnalysis.tokenStats(Tables.documents(s, d), "text", "doc_id"),
      Some("""SELECT doc_id,
                     CAST(len(list_filter(string_split_regex(text, '\s+'),
                       w -> length(w) > 0)) AS BIGINT) AS n_ws_tokens,
                     CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                       AS n_bpe_tokens,
                     CAST(length(text) AS BIGINT) AS n_chars
              FROM documents""")),

    // document chunking: fixed 240-char windows every 180 chars (60-char
    // overlap) — the retrieval/embedding prep step; pure generator
    // projection, zero shuffle at any corpus size
    Q("q_chunk_docs",
      (s, d) => Chunking.chunkDocs(Tables.documents(s, d), "text", "doc_id",
        width = 240, stride = 180),
      Some("""SELECT doc_id, CAST(t.i // 180 AS BIGINT) AS chunk_id,
                     substring(text, CAST(t.i + 1 AS INT), 240) AS chunk
              FROM documents, UNNEST(range(0, length(text), 180)) AS t(i)
              WHERE length(text) > 0""")),

    // sequence packing: fill 256-token context windows greedily in doc_id
    // order within each source shard — the pretraining batch prep step;
    // one partitioned window + one aggregation
    Q("q_pack_sequences",
      (s, d) => Chunking.packSequences(Tables.documents(s, d), "text",
        "doc_id", "source", capacity = 256),
      Some("""WITH tok AS (
                SELECT source, doc_id,
                       CAST(len(list_filter(string_split_regex(text, '\s+'),
                         w -> length(w) > 0)) AS BIGINT) AS tokens
                FROM documents),
              cum AS (
                SELECT source, doc_id, tokens,
                       CAST(coalesce(sum(tokens) OVER (PARTITION BY source
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) // 256 AS BIGINT) AS pack_id
                FROM tok)
              SELECT source, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(tokens) AS BIGINT) AS tokens
              FROM cum GROUP BY 1, 2""")),

    // quality signals
    // repetition quality filters (boilerplate/spam signals): fraction of
    // the document that is its most frequent word / bigram + distinct-
    // word fraction. Spark computes the counts in one native scan
    // (functions.RepetitionStats, zero shuffle); the oracle replays them
    // relationally over the identical tokenization. Ratios are IEEE
    // divisions of exact integer counts, 6dp display rounding.
    Q("q_repetition",
      (s, d) => TextAnalysis.repetitionStats(Tables.documents(s, d),
        "text", "doc_id"),
      Some("""WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'),
                         x -> length(x) > 0) AS ws
                FROM documents),
              base AS (SELECT doc_id, len(ws) AS nw FROM w),
              words AS (SELECT doc_id, unnest(ws) AS word FROM w),
              wc AS (SELECT doc_id, word, count(*) AS c
                     FROM words GROUP BY 1, 2),
              ws2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nd,
                             max(c) AS topw
                      FROM wc GROUP BY 1),
              bg AS (SELECT doc_id,
                            unnest(list_transform(range(1, len(ws)),
                              i -> ws[i] || ' ' || ws[i+1])) AS b
                     FROM w WHERE len(ws) >= 2),
              bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
              bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
                            max(c) AS topb
                     FROM bc GROUP BY 1)
              SELECT base.doc_id,
                     CAST(base.nw AS BIGINT) AS n_words,
                     CASE WHEN base.nw = 0 THEN 0.0
                          ELSE round(CAST(ws2.nd AS DOUBLE) / base.nw, 6)
                     END AS distinct_word_frac,
                     CASE WHEN base.nw = 0 THEN 0.0
                          ELSE round(CAST(ws2.topw AS DOUBLE) / base.nw, 6)
                     END AS top_word_frac,
                     CASE WHEN coalesce(bs.nb, 0) = 0 THEN 0.0
                          ELSE round(CAST(bs.topb AS DOUBLE) / bs.nb, 6)
                     END AS top_bigram_frac
              FROM base
              LEFT JOIN ws2 USING (doc_id)
              LEFT JOIN bs USING (doc_id)""")),

    // corpus bigram-LM fluency score (perplexity-style, self-contained):
    // mean ln(c(w1,w2)/c(w1)) over each doc's bigrams, corpus counts
    Q("q_lm_score",
      (s, d) => TextAnalysis.lmScore(Tables.documents(s, d), "text", "doc_id"),
      Some("""WITH w AS (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                       x -> length(x) > 0) AS ws
                   FROM documents),
              bg AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                         i -> ws[i] || ' ' || ws[i+1])) AS bigram,
                       unnest(list_transform(range(1, len(ws)),
                         i -> ws[i])) AS w1
                     FROM w WHERE len(ws) >= 2),
              un AS (SELECT unnest(ws) AS w1 FROM w),
              bc AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
              wc AS (SELECT w1, count(*) AS cw FROM un GROUP BY 1),
              sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                       round(avg(ln(CAST(cb AS DOUBLE) / cw)), 6) AS avg_logp
                     FROM bg JOIN bc USING (bigram) JOIN wc USING (w1)
                     GROUP BY doc_id)
              SELECT d.doc_id,
                     CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
                     coalesce(avg_logp, 0.0) AS avg_logp
              FROM documents d LEFT JOIN sc USING (doc_id)""")),

    // PMI collocations: top-20 adjacent pairs by pointwise mutual
    // information (min count 5) — one double expression shape mirrored
    // operand-for-operand so 6dp rounding agrees; unigram table
    // broadcasts, top-k is a TakeOrdered
    Q("q_pmi_pairs",
      (s, d) => TextAnalysis.pmiPairs(Tables.documents(s, d), "text",
        topK = 20, minCount = 5L),
      Some("""WITH w AS (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                       x -> length(x) > 0) AS ws
                   FROM documents),
              bg AS (SELECT unnest(list_transform(range(1, len(ws)),
                       i -> ws[i] || ' ' || ws[i+1])) AS bigram
                     FROM w WHERE len(ws) >= 2),
              un AS (SELECT unnest(ws) AS wd FROM w),
              bc AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1
                     HAVING count(*) >= 5),
              wc AS (SELECT wd, count(*) AS cw FROM un GROUP BY 1),
              n1 AS (SELECT count(*) AS n1 FROM un),
              n2 AS (SELECT count(*) AS n2 FROM bg),
              sc AS (SELECT bigram, CAST(cb AS BIGINT) AS n_pair,
                       round(ln((CAST(cb AS DOUBLE) * n1 * n1) /
                                (CAST(n2 AS DOUBLE) * c1.cw * c2.cw)), 6)
                         AS pmi
                     FROM bc
                     JOIN wc c1 ON c1.wd = string_split(bigram, ' ')[1]
                     JOIN wc c2 ON c2.wd = string_split(bigram, ' ')[2]
                     CROSS JOIN n1 CROSS JOIN n2)
              SELECT bigram, n_pair, pmi FROM sc
              ORDER BY pmi DESC, bigram LIMIT 20""")),

    // count-min sketch heavy hitters: frequency estimation in bounded
    // depth×width state (KmvDistinct's frequency sibling) probed with
    // the exact top-20 tokens; the portable word hash makes every
    // estimate — collisions included — replayable, and est ≥ exact
    // always (overcount-only bound, pinned in CountMinSpec)
    Q("q_cms_heavy_hitters",
      (s, d) => graft.operators.CountMin.heavyHitters(
        Tables.documents(s, d), "text", topK = 20, depth = 4, width = 1024,
        seed = 11L),
      Some(s"""WITH words AS (
                 SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> length(x) > 0)) AS w
                 FROM documents),
               wh AS MATERIALIZED (
                 SELECT w, ${duckWordHash("w")} AS h FROM words),
               dd AS (SELECT unnest(range(0, 4)) AS i),
               sk AS (SELECT i,
                             ((h * 2654435761 + (11 + i) * 40503) % 1000000007)
                               % 1024 AS bucket,
                             count(*) AS c
                      FROM wh CROSS JOIN dd GROUP BY 1, 2),
               exact AS (SELECT w, n_exact FROM (
                      SELECT w, CAST(count(*) AS BIGINT) AS n_exact,
                             row_number() OVER (ORDER BY count(*) DESC, w) AS rn
                      FROM words GROUP BY w) WHERE rn <= 20),
               whd AS (SELECT DISTINCT w, h FROM wh),
               probes AS (SELECT e.w, e.n_exact, dd.i,
                                 ((whd.h * 2654435761 + (11 + dd.i) * 40503)
                                   % 1000000007) % 1024 AS bucket
                          FROM exact e JOIN whd ON e.w = whd.w CROSS JOIN dd)
               SELECT p.w AS word, p.n_exact,
                      CAST(min(sk.c) AS BIGINT) AS n_est
               FROM probes p JOIN sk ON sk.i = p.i AND sk.bucket = p.bucket
               GROUP BY 1, 2""")),

    Q("q_quality_score",
      (s, d) => TextAnalysis.qualityScore(Tables.documents(s, d), "text", "doc_id"),
      Some(s"""WITH t AS (
                 SELECT doc_id, text,
                        list_filter(string_split_regex(text, '\\s+'),
                          w -> length(w) > 0) AS w
                 FROM documents),
               m AS (
                 SELECT doc_id,
                        len(w) AS n_words,
                        list_sum(list_transform(w, x -> length(x))) * 1.0 / len(w)
                          AS mean_len,
                        len(list_filter(w, x -> list_contains(
                          ${TextAnalysis.stopwords.mkString("['", "','", "']")}, x)))
                          * 1.0 / len(w) AS stop_ratio,
                        len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / length(text)
                          AS punct_ratio
                 FROM t)
               SELECT doc_id,
                      CAST(n_words AS BIGINT) AS n_words,
                      round(mean_len, 4) AS mean_word_len,
                      round(stop_ratio, 4) AS stopword_ratio,
                      round(punct_ratio, 4) AS punct_ratio,
                      round(least(n_words / 100.0, 1.0) * 0.4 +
                            least(stop_ratio * 5.0, 1.0) * 0.4 +
                            (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 4)
                        AS quality
               FROM m""")),

    // table profiling: per-column row/null/distinct/min/max in ONE
    // aggregate pass (Expand + map-side partials — no joins, no
    // windows); the pre-training corpus audit
    Q("q_profile_docs",
      (s, d) => graft.operators.Profile.profile(Tables.documents(s, d),
        Seq("doc_id", "lang", "source", "n_chars")),
      Some(Seq("doc_id", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS col_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count($c) AS BIGINT) AS n_nonnull,
                   CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
                   CAST(min($c) AS VARCHAR) AS min_s,
                   CAST(max($c) AS VARCHAR) AS max_s
            FROM documents"""
      }.mkString("\nUNION ALL\n"))),

    // per-source RELATIVE quality filter: drop the worst 20% of each
    // source by quantized-score histogram CDF — never a per-group
    // window sort over the data; whole-bucket drop rule makes the kept
    // set exactly replayable (no within-bucket tie-breaking)
    Q("q_relative_quality",
      (s, d) => TextAnalysis.relativeQualityFilter(Tables.documents(s, d),
          "text", "doc_id", "source", dropFrac = 0.2)
        .select(col("doc_id"), col("source"), col("q_bucket")),
      Some(s"""WITH t AS (
                 SELECT doc_id, source, text,
                        list_filter(string_split_regex(text, '\\s+'),
                          w -> length(w) > 0) AS w
                 FROM documents),
               q AS (
                 SELECT doc_id, source,
                        CAST(round(round(
                          least(len(w) / 100.0, 1.0) * 0.4 +
                          least((len(list_filter(w, x -> list_contains(
                            ${TextAnalysis.stopwords.mkString("['", "','", "']")}, x)))
                            * 1.0 / len(w)) * 5.0, 1.0) * 0.4 +
                          (1.0 - least((len(regexp_extract_all(text, '[^\\w\\s]'))
                            * 1.0 / length(text)) * 10.0, 1.0)) * 0.2, 4)
                          * 10000) AS BIGINT) AS q_bucket
                 FROM t),
               hist AS (SELECT source, q_bucket, count(*) AS c
                        FROM q GROUP BY 1, 2),
               cum AS (SELECT source, q_bucket,
                              sum(c) OVER (PARTITION BY source
                                ORDER BY q_bucket) AS cum,
                              sum(c) OVER (PARTITION BY source) AS n
                       FROM hist),
               thr AS (SELECT source, max(q_bucket) AS t FROM cum
                       WHERE cum <= floor(0.2 * n) GROUP BY source)
               SELECT q.doc_id, q.source, q.q_bucket
               FROM q LEFT JOIN thr USING (source)
               WHERE t IS NULL OR q.q_bucket > t""")),

    // heuristic language id
    Q("q_langid",
      (s, d) => TextAnalysis.langId(Tables.documents(s, d), "text", "doc_id"),
      Some("""SELECT doc_id,
                CASE
                  WHEN contains(' ' || lower(text) || ' ', ' the ')
                    OR contains(' ' || lower(text) || ' ', ' is ') THEN 'en'
                  WHEN contains(' ' || lower(text) || ' ', ' le ')
                    OR contains(' ' || lower(text) || ' ', ' et ') THEN 'fr'
                  WHEN contains(' ' || lower(text) || ' ', ' der ')
                    OR contains(' ' || lower(text) || ' ', ' und ') THEN 'de'
                  WHEN contains(' ' || lower(text) || ' ', ' el ')
                    OR contains(' ' || lower(text) || ' ', ' y ') THEN 'es'
                  ELSE 'und'
                END AS lang_pred
              FROM documents""")),

    // corpus report: language × source → doc counts, token mass, mean
    // quality — the composed analysis rollup a curation run prints
    Q("q_corpus_stats",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val lang = TextAnalysis.langId(docs, "text", "doc_id")
        val tok = TextAnalysis.tokenStats(docs, "text", "doc_id")
          .select(col("doc_id"), col("n_ws_tokens"))
        val q = TextAnalysis.qualityScore(docs, "text", "doc_id")
          .select(col("doc_id"), col("quality"))
        docs.select(col("doc_id"), col("source"))
          .join(lang, "doc_id").join(tok, "doc_id").join(q, "doc_id")
          .groupBy(col("lang_pred"), col("source"))
          // sum, not mean: per-doc quality is 4dp-rounded, so the sum sits
          // ON the 4dp grid and cross-engine rounding can't flip (a mean
          // lands BETWEEN grid points and 1e-16 noise once flipped a
          // half-way case at sf0.001); the mean is n_docs-derivable
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_ws_tokens")).as("n_tokens"),
            round(sum(col("quality")), 4).as("sum_quality"))
      },
      Some(s"""WITH lang AS (
                 SELECT doc_id,
                   CASE
                     WHEN contains(' ' || lower(text) || ' ', ' the ')
                       OR contains(' ' || lower(text) || ' ', ' is ') THEN 'en'
                     WHEN contains(' ' || lower(text) || ' ', ' le ')
                       OR contains(' ' || lower(text) || ' ', ' et ') THEN 'fr'
                     WHEN contains(' ' || lower(text) || ' ', ' der ')
                       OR contains(' ' || lower(text) || ' ', ' und ') THEN 'de'
                     WHEN contains(' ' || lower(text) || ' ', ' el ')
                       OR contains(' ' || lower(text) || ' ', ' y ') THEN 'es'
                     ELSE 'und'
                   END AS lang_pred
                 FROM documents),
               tok AS (
                 SELECT doc_id,
                        CAST(len(list_filter(string_split_regex(text, '\\s+'),
                          x -> length(x) > 0)) AS BIGINT) AS n_ws_tokens
                 FROM documents),
               q AS (
                 SELECT doc_id,
                        round(least(len(w) / 100.0, 1.0) * 0.4 +
                              least(len(list_filter(w, x -> list_contains(
                                ${TextAnalysis.stopwords.mkString("['", "','", "']")}, x)))
                                * 1.0 / len(w) * 5.0, 1.0) * 0.4 +
                              (1.0 - least(len(regexp_extract_all(text, '[^\\w\\s]'))
                                * 1.0 / length(text) * 10.0, 1.0)) * 0.2, 4) AS quality
                 FROM (SELECT doc_id, text,
                         list_filter(string_split_regex(text, '\\s+'),
                           x -> length(x) > 0) AS w
                       FROM documents))
               SELECT lang_pred, source,
                      count(*) AS n_docs,
                      CAST(sum(n_ws_tokens) AS BIGINT) AS n_tokens,
                      round(sum(quality), 4) AS sum_quality
               FROM documents d
               JOIN lang USING (doc_id) JOIN tok USING (doc_id) JOIN q USING (doc_id)
               GROUP BY lang_pred, source""")),

    // token-length distribution per language: exact interpolated
    // percentiles (Spark `percentile` and DuckDB `quantile_cont` share the
    // (1-g)·v[floor] + g·v[ceil] definition at pos = p·(n-1), and the
    // computation is order-insensitive — sorted values — so 4dp rounding
    // only guards the interpolation arithmetic)
    Q("q_token_quantiles",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val lang = TextAnalysis.langId(docs, "text", "doc_id")
        val tok = TextAnalysis.tokenStats(docs, "text", "doc_id")
          .select(col("doc_id"), col("n_ws_tokens"))
        lang.join(tok, "doc_id")
          .groupBy(col("lang_pred"))
          .agg(count(lit(1)).as("n_docs"),
            round(percentile(col("n_ws_tokens"), lit(0.25)), 4).as("p25"),
            round(percentile(col("n_ws_tokens"), lit(0.5)), 4).as("p50"),
            round(percentile(col("n_ws_tokens"), lit(0.75)), 4).as("p75"),
            round(percentile(col("n_ws_tokens"), lit(0.95)), 4).as("p95"))
      },
      Some("""WITH lang AS (
                 SELECT doc_id,
                   CASE
                     WHEN contains(' ' || lower(text) || ' ', ' the ')
                       OR contains(' ' || lower(text) || ' ', ' is ') THEN 'en'
                     WHEN contains(' ' || lower(text) || ' ', ' le ')
                       OR contains(' ' || lower(text) || ' ', ' et ') THEN 'fr'
                     WHEN contains(' ' || lower(text) || ' ', ' der ')
                       OR contains(' ' || lower(text) || ' ', ' und ') THEN 'de'
                     WHEN contains(' ' || lower(text) || ' ', ' el ')
                       OR contains(' ' || lower(text) || ' ', ' y ') THEN 'es'
                     ELSE 'und'
                   END AS lang_pred
                 FROM documents),
               tok AS (
                 SELECT doc_id,
                        CAST(len(list_filter(string_split_regex(text, '\s+'),
                          x -> length(x) > 0)) AS BIGINT) AS n_ws_tokens
                 FROM documents)
               SELECT lang_pred, count(*) AS n_docs,
                      round(quantile_cont(n_ws_tokens, 0.25), 4) AS p25,
                      round(quantile_cont(n_ws_tokens, 0.5), 4) AS p50,
                      round(quantile_cont(n_ws_tokens, 0.75), 4) AS p75,
                      round(quantile_cont(n_ws_tokens, 0.95), 4) AS p95
               FROM lang JOIN tok USING (doc_id)
               GROUP BY lang_pred""")),

    // frequency-ranked vocabulary (top-50 by count desc, token asc;
    // id 1..V, OOV = 0) + per-doc encode summary with an
    // order-sensitive mod-1e9+7 checksum of the encoded id sequence —
    // the tokenizer-adjacent step; vocab broadcasts into the token
    // scan (PlanShapeSpec-pinned)
    Q("q_vocab_encode",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.text.Vocab.encodeSummary(docs, "text", "doc_id",
          graft.text.Vocab.build(docs, "text", size = 50))
      },
      Some("""WITH words AS (
                SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                  x -> length(x) > 0)) AS w
                FROM documents),
              vocab AS (
                SELECT w, rn AS id FROM (
                  SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rn
                  FROM words GROUP BY w)
                WHERE rn <= 50),
              toks AS (
                SELECT doc_id, unnest(range(1, len(lst) + 1)) AS pos1, lst
                FROM (SELECT doc_id,
                        list_filter(string_split_regex(text, '\s+'),
                          x -> length(x) > 0) AS lst
                      FROM documents)),
              enc AS (
                SELECT t.doc_id, t.pos1, v.id
                FROM (SELECT doc_id, pos1,
                        lst[CAST(pos1 AS BIGINT)] AS w FROM toks) t
                LEFT JOIN vocab v USING (w))
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_oov,
                     CAST(sum((pos1 * (coalesce(id, 0) + 7)) % 1000000007)
                       % 1000000007 AS BIGINT) AS ids_checksum
              FROM enc GROUP BY doc_id""")),

    // winnowing fingerprint: rolling k-gram hashes → sliding-window
    // minima, computed by the native WinnowFingerprint expression in one
    // O(n) pass. Pure integer arithmetic (B=257, M=1e9+7, bytes from the
    // encoded payload), so DuckDB replays every hash and window-min
    // bit-for-bit — no engine hash builtin on either side.
    Q("q_winnow_fingerprint",
      (s, d) => TextAnalysis.winnowFingerprint(Tables.documents(s, d),
        "text", "doc_id", k = 8, w = 4),
      Some(winnowSql(k = 8, w = 4))),

    // content fingerprint
    Q("q_fingerprint",
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d), "text", "doc_id"),
      Some("""SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
              FROM documents""")),

    // DSIR importance weights: every pool doc scored by the smoothed
    // bigram log-likelihood ratio of the lang='en' target slice vs the
    // pool (arXiv:2302.03169's selection signal); the single-ln operand
    // shape is mirrored exactly so 6dp rounding agrees
    Q("q_dsir_weights",
      (s, d) => TextAnalysis.dsirWeights(Tables.documents(s, d),
        col("lang") === "en", "text", "doc_id"),
      Some("WITH " + dsirCtes("documents") + """
              SELECT d.doc_id,
                     CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
                     coalesce(weight, 0.0) AS weight
              FROM documents d LEFT JOIN sc USING (doc_id)""")),

    // the resampling step: top-100 pool docs by target-likeness, the
    // deterministic selection a pipeline feeds back into the corpus mix;
    // same full weight replay + (weight desc, doc_id) cut on both sides
    Q("q_dsir_sample",
      (s, d) => TextAnalysis.dsirWeights(Tables.documents(s, d),
          col("lang") === "en", "text", "doc_id")
        .orderBy(col("weight").desc, col("doc_id").asc)
        .limit(100),
      Some("WITH " + dsirCtes("documents") + """
              SELECT d.doc_id,
                     CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
                     coalesce(weight, 0.0) AS weight
              FROM documents d LEFT JOIN sc USING (doc_id)
              ORDER BY weight DESC, d.doc_id ASC
              LIMIT 100""")),

    // hashed-linear-model scoring: feature-hash each word into a
    // 64-bucket weight vector (portable WordHash mod 64) and score the
    // mean bucket weight — the fastText/CCNet model-based-filter
    // inference shape as a zero-shuffle projection; the mixer-generated
    // stand-in weights are built by the same formula on both engines
    // multi-class domain classification for mixture bucketing (r11):
    // 4 mixer-seeded hashed-linear heads in ONE scan, argmax domain
    // with (score desc, domain asc) tiebreak — head weights computed
    // inline from the mixer on both engines, per-head sums ordered
    // folds, zero shuffles
    Q("q_domain_classify",
      (s, d) => TextAnalysis.domainClassify(Tables.documents(s, d),
        "text", "doc_id", numDomains = 4, dim = 64),
      Some(s"""WITH $domainCtes
               SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                      CAST(c AS BIGINT) AS domain, score
               FROM dm""")),

    // per-source domain-mixture drift (r11): P(domain | source) vs the
    // corpus distribution as a KL divergence — the mixture-monitoring
    // readout a curation pipeline alarms on when a crawl source's
    // content shifts. Counts are exact integers; the 4 KL terms sum in
    // a FIXED expression order (pivoted columns, not a float groupBy
    // sum), so both engines fold identical doubles; ln parity is the
    // established BM25/DSIR contract.
    Q("q_domain_mix_kl",
      (s, d) => TextAnalysis.domainMixKl(Tables.documents(s, d),
        "text", "doc_id", "source", numDomains = 4, dim = 64),
      Some {
        def term(d: Int): String =
          s"""CASE WHEN n$d > 0 THEN (n$d * 1.0 / n_docs) *
                ln((n$d * 1.0 / n_docs) / (t$d * 1.0 / nt))
              ELSE 0.0 END"""
        def sums(p: String): String =
          (0 until 4).map(d =>
            s"sum(CASE WHEN domain = $d THEN 1 ELSE 0 END) AS $p$d")
            .mkString(", ")
        s"""WITH $domainCtes,
            j AS (SELECT dm.c AS domain, doc.source
                  FROM dm JOIN documents doc USING (doc_id)),
            s AS (SELECT source, count(*) AS n_docs, ${sums("n")}
                  FROM j GROUP BY 1),
            t AS (SELECT count(*) AS nt, ${sums("t")} FROM j)
            SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                   round(${(0 until 4).map(term).mkString(" + ")}, 6) AS kl
            FROM s CROSS JOIN t"""
      }),

    Q("q_linear_score",
      (s, d) => TextAnalysis.hashedLinearScore(Tables.documents(s, d),
        "text", "doc_id", TextAnalysis.mixerWeights(64)),
      Some(s"""WITH w AS (SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                       x -> length(x) > 0) AS ws
                   FROM documents),
               wt AS (SELECT list_transform(range(0, 64), i ->
                        CAST((i * 2654435761 + 40503) % 9973 AS DOUBLE)
                          / 9973.0 - 0.5) AS wv),
               pw AS (SELECT doc_id, len(ws) AS n_words,
                        list_sum(list_transform(ws, x ->
                          wv[CAST(${duckWordHash("x")} % 64 AS BIGINT) + 1]))
                          AS s
                      FROM w CROSS JOIN wt)
               SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                      round(0.0 + CASE WHEN n_words > 0
                                       THEN s / n_words
                                       ELSE 0.0 END, 6) AS score
               FROM pw""")),

    // the round-9 capstone composition — a full curation pass a
    // pretraining pipeline runs end to end: phrase-blocklist gate →
    // model-based quality gate (hashed-linear score ≥ 0) → normalized
    // exact dedup (survivor = min id) → DSIR-ranked top-50 selection of
    // the survivors. Four operators, one registered plan; every stage's
    // replay is the fragment its standalone query already proves.
    Q("q_curation_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clean = Scrub.blocklistHits(docs, "text", "doc_id",
            Seq("slow join", "big table", "fast merge"))
          .where(col("clean")).select(col("doc_id"))
        val pass = TextAnalysis.hashedLinearScore(docs, "text", "doc_id",
            TextAnalysis.mixerWeights(64))
          .where(col("score") >= 0.0).select(col("doc_id"))
        val gated = docs.join(clean, Seq("doc_id"), "left_semi")
          .join(pass, Seq("doc_id"), "left_semi")
        val surv = Dedup.exactNormalized(gated, "text", "doc_id")
          .select(col("keep_id").as("doc_id"))
        val corpus = docs.join(surv, Seq("doc_id"), "left_semi")
        TextAnalysis.dsirWeights(corpus, col("lang") === "en", "text",
            "doc_id")
          .orderBy(col("weight").desc, col("doc_id").asc)
          .limit(50)
      },
      Some(s"""WITH blw AS (SELECT doc_id,
                      list_filter(string_split_regex(text, '\\s+'),
                        x -> length(x) > 0) AS ws
                    FROM documents),
               blh AS (SELECT DISTINCT doc_id FROM (
                         SELECT doc_id, unnest(ws) AS term FROM blw
                         UNION ALL
                         SELECT doc_id,
                                unnest(list_transform(range(1, len(ws)),
                                  i -> ws[i] || ' ' || ws[i+1])) AS term
                         FROM blw WHERE len(ws) >= 2)
                       WHERE term IN ('slow join', 'big table', 'fast merge')),
               wt AS (SELECT list_transform(range(0, 64), i ->
                        CAST((i * 2654435761 + 40503) % 9973 AS DOUBLE)
                          / 9973.0 - 0.5) AS wv),
               ls AS (SELECT doc_id FROM (
                        SELECT doc_id, len(ws) AS n_words,
                               list_sum(list_transform(ws, x ->
                                 wv[CAST(${duckWordHash("x")} % 64 AS BIGINT)
                                    + 1])) AS s
                        FROM blw CROSS JOIN wt)
                      WHERE round(0.0 + CASE WHEN n_words > 0
                                             THEN s / n_words
                                             ELSE 0.0 END, 6) >= 0.0),
               gated AS (SELECT * FROM documents
                         WHERE doc_id NOT IN (SELECT doc_id FROM blh)
                           AND doc_id IN (SELECT doc_id FROM ls)),
               fp AS (SELECT min(doc_id) AS doc_id FROM gated
                      GROUP BY md5(trim(regexp_replace(lower(text),
                        '\\s+', ' ', 'g')))),
               surv AS (SELECT d.* FROM documents d
                        WHERE doc_id IN (SELECT doc_id FROM fp)),
               ${dsirCtes("surv")}
               SELECT d.doc_id,
                      CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
                      coalesce(weight, 0.0) AS weight
               FROM surv d LEFT JOIN sc USING (doc_id)
               ORDER BY weight DESC, d.doc_id ASC
               LIMIT 50""")),

    // Gopher-style rule gate: five named 0/1 rules + failure count +
    // all-pass bit, zero-shuffle (one TextStats + one RepetitionStats
    // scan per row; each ratio is one IEEE division of exact counts)
    Q("q_gopher_rules",
      (s, d) => TextAnalysis.gopherRules(Tables.documents(s, d),
        "text", "doc_id"),
      Some(s"""WITH t AS (
                 SELECT doc_id, text,
                        list_filter(string_split_regex(text, '\\s+'),
                          w -> length(w) > 0) AS w
                 FROM documents),
               tw AS (SELECT doc_id, unnest(w) AS word FROM t),
               topw AS (SELECT doc_id, max(c) AS topc FROM (
                          SELECT doc_id, word, count(*) AS c
                          FROM tw GROUP BY 1, 2)
                        GROUP BY 1),
               m AS (
                 SELECT t.doc_id,
                        len(w) AS nw,
                        list_sum(list_transform(w, x -> length(x)))
                          AS sum_wlen,
                        len(list_filter(w, x -> list_contains(
                          ${TextAnalysis.stopwords.mkString("['", "','", "']")},
                          x))) AS n_stop,
                        len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                        length(text) AS n_chars,
                        coalesce(topc, 0) AS topc
                 FROM t LEFT JOIN topw ON t.doc_id = topw.doc_id),
               r AS (
                 SELECT doc_id,
                        CASE WHEN nw BETWEEN 20 AND 100000 THEN 1 ELSE 0 END
                          AS r_words,
                        CASE WHEN nw > 0
                              AND CAST(sum_wlen AS DOUBLE) / nw >= 3.0
                              AND CAST(sum_wlen AS DOUBLE) / nw <= 10.0
                          THEN 1 ELSE 0 END AS r_word_len,
                        CASE WHEN nw > 0
                              AND CAST(n_stop AS DOUBLE) / nw >= 0.05
                          THEN 1 ELSE 0 END AS r_stopwords,
                        CASE WHEN n_chars > 0
                              AND CAST(n_punct AS DOUBLE) / n_chars <= 0.2
                          THEN 1 ELSE 0 END AS r_symbols,
                        CASE WHEN nw > 0
                              AND CAST(topc AS DOUBLE) / nw <= 0.2
                          THEN 1 ELSE 0 END AS r_repetition
                 FROM m)
               SELECT doc_id,
                      CAST(r_words AS BIGINT) AS r_words,
                      CAST(r_word_len AS BIGINT) AS r_word_len,
                      CAST(r_stopwords AS BIGINT) AS r_stopwords,
                      CAST(r_symbols AS BIGINT) AS r_symbols,
                      CAST(r_repetition AS BIGINT) AS r_repetition,
                      CAST(5 - r_words - r_word_len - r_stopwords - r_symbols
                           - r_repetition AS BIGINT) AS n_failed,
                      CAST(CASE WHEN r_words + r_word_len + r_stopwords
                                     + r_symbols + r_repetition = 5
                                THEN 1 ELSE 0 END AS BIGINT) AS pass
               FROM r"""))
  )

  /** Shared DuckDB replay of [[TextAnalysis.dsirWeights]] (target =
    * lang='en') over pool `src`: bigram CTEs, target/pool counts, 1-row
    * totals, and the per-doc mean of the mirrored single-ln operand.
    * Ends with the `sc` CTE (doc_id, n_bigrams, weight); returns a CTE
    * LIST (no WITH) so callers can splice it mid-chain
    * (q_curation_pipeline runs it over the dedup survivors). */
  private[llm] def dsirCtes(src: String): String =
    s"""w AS (SELECT doc_id, lang = 'en' AS is_t,
              list_filter(string_split_regex(text, '\\s+'),
                x -> length(x) > 0) AS ws
            FROM $src),
       bg AS (SELECT doc_id, is_t,
                unnest(list_transform(range(1, len(ws)),
                  i -> ws[i] || ' ' || ws[i+1])) AS bigram
              FROM w WHERE len(ws) >= 2),
       ctt AS (SELECT bigram, count(*) AS ct FROM bg WHERE is_t GROUP BY 1),
       crr AS (SELECT bigram, count(*) AS cr FROM bg GROUP BY 1),
       tot AS (SELECT CAST(count(*) FILTER (WHERE is_t) AS BIGINT) AS nt,
                      CAST(count(*) AS BIGINT) AS nr,
                      CAST(count(DISTINCT bigram) AS BIGINT) AS v
               FROM bg),
       sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                round(avg(ln(
                  (CAST(coalesce(ct, 0) + 1 AS DOUBLE) * (nr + v)) /
                  (CAST(cr + 1 AS DOUBLE) * (nt + v)))), 6) AS weight
              FROM bg
              LEFT JOIN ctt USING (bigram)
              JOIN crr USING (bigram)
              CROSS JOIN tot
              GROUP BY doc_id)"""

  /** DuckDB replay of [[TextAnalysis.domainClassify]] (4 heads, 64
    * buckets) — shared by q_domain_classify, q_domain_mix_kl, and the
    * streaming twin so the replays cannot drift. Ends with CTE
    * `dm (doc_id, n_words, c, score)` — the argmax row per document. */
  private[graft] def domainCtes: String =
    s"""w AS (SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
               x -> length(x) > 0) AS ws
           FROM documents),
       h AS (SELECT doc_id, len(ws) AS n_words,
               list_transform(ws, x ->
                 CAST(${duckWordHash("x")} % 64 AS BIGINT)) AS hs
             FROM w),
       sc AS (SELECT doc_id, n_words, t.c,
                round(CASE WHEN n_words > 0 THEN
                  list_sum(list_transform(hs, hh ->
                    CAST(((t.c * 64 + hh) * 2654435761 + 40503)
                      % 9973 AS DOUBLE) / 9973.0 - 0.5)) / n_words
                  ELSE 0.0 END, 6) AS score
              FROM h, UNNEST([0, 1, 2, 3]) AS t(c)),
       dm AS (SELECT doc_id, n_words, c, score FROM (
         SELECT *, row_number() OVER (PARTITION BY doc_id
           ORDER BY score DESC, c) AS rn FROM sc)
         WHERE rn = 1)"""

}
