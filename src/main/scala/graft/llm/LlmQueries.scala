package graft.llm

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Oracle-checked LLM-pipeline capabilities over `documents` and
  * `embeddings`. Hash-based ops (MinHash/SimHash/LSH) use xxhash64, which
  * DuckDB can't replay — those register rows-only and are property-tested
  * against the exact quadratic baselines in LlmSpec. */
object LlmQueries {

  /** DuckDB word-shingle CTE fragment (3-word shingles, distinct). */
  private val shingleCte =
    """ws AS (SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0) AS w
             FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
              FROM ws WHERE len(w) >= 3)"""

  val all: Seq[Q] = Seq(

    // exact dedup: content-hash groups, survivor = min id
    Q("q_dedup_exact",
      (s, d) => Dedup.exact(Tables.documents(s, d), "text", "doc_id"),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
              FROM documents GROUP BY md5(text)""")),

    Q("q_dedup_normalized",
      (s, d) => Dedup.exactNormalized(Tables.documents(s, d), "text", "doc_id"),
      Some("""SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
                     min(doc_id) AS keep_id, count(*) AS n_copies
              FROM documents GROUP BY 1""")),

    // exact n-gram Jaccard near-dup pairs (quadratic truth baseline)
    Q("q_ngram_jaccard_pairs",
      (s, d) => Dedup.jaccardPairs(Tables.documents(s, d), "text", "doc_id",
        k = 3, tau = 0.8),
      Some(s"""WITH $shingleCte,
               sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               shared AS (
                 SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                 FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
               SELECT da, db,
                      round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
               FROM shared
               JOIN sizes sa ON da = sa.doc_id
               JOIN sizes sb ON db = sb.doc_id
               WHERE round(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.8""")),

    // MinHash LSH near-dup pairs — xxhash64-based, rows-only; recall vs
    // the exact baseline asserted in LlmSpec
    Q("q_minhash_lsh_pairs",
      (s, d) => Dedup.minHashLshPairs(Tables.documents(s, d), "text", "doc_id",
        k = 3, numHashes = 64, bands = 16, tau = 0.7),
      None),

    // SimHash fingerprints + near-dup pairs — rows-only
    Q("q_simhash_pairs",
      (s, d) => Dedup.simHashPairs(Tables.documents(s, d), "text", "doc_id",
        maxHamming = 3),
      None),

    // brute-force cosine top-5 for query vectors vec_id < 10
    Q("q_embed_knn",
      (s, d) => Similarity.bruteForceKnn(Tables.embeddings(s, d),
        "vec_id", "embedding", col("vec_id") < 10, k = 5),
      Some("""WITH q AS (
                SELECT vec_id AS qid,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                FROM embeddings WHERE vec_id < 10),
              c AS (
                SELECT vec_id AS nid,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS nv
                FROM embeddings),
              scored AS (
                SELECT qid, nid,
                       round(
                         list_sum(list_transform(range(1, len(qv) + 1),
                           i -> qv[i] * nv[i]))
                         / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                              i -> qv[i] * qv[i])))
                          * sqrt(list_sum(list_transform(range(1, len(nv) + 1),
                              i -> nv[i] * nv[i])))), 6) AS cos
                FROM q, c WHERE qid <> nid)
              SELECT qid, nid, cos, rn FROM (
                SELECT *, CAST(row_number() OVER (
                  PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rn
                FROM scored)
              WHERE rn <= 5""")),

    // exact embedding near-dup pairs (quadratic truth baseline)
    Q("q_embed_dup_pairs",
      (s, d) => Similarity.embeddingDupPairs(Tables.embeddings(s, d),
        "vec_id", "embedding", tau = 0.45),
      Some("""WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings)
              SELECT da, db, cos FROM (
                SELECT a.vec_id AS da, b.vec_id AS db,
                       round(
                         list_sum(list_transform(range(1, len(a.e) + 1),
                           i -> a.e[i] * b.e[i]))
                         / (sqrt(list_sum(list_transform(range(1, len(a.e) + 1),
                              i -> a.e[i] * a.e[i])))
                          * sqrt(list_sum(list_transform(range(1, len(b.e) + 1),
                              i -> b.e[i] * b.e[i])))), 6) AS cos
                FROM v a JOIN v b ON a.vec_id < b.vec_id)
              WHERE cos >= 0.45""")),

    // near-dup clusters: jaccard pairs → connected components → survivor;
    // DuckDB replays the closure recursively over the same pair edges
    Q("q_dedup_clusters",
      (s, d) => Dedup.dedupClusters(
        Dedup.jaccardPairs(Tables.documents(s, d), "text", "doc_id",
          k = 3, tau = 0.8)),
      Some(s"""WITH RECURSIVE $shingleCte,
               sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               shared AS (
                 SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
                 FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
               pairs AS (
                 SELECT da, db FROM shared
                 JOIN sizes sa ON da = sa.doc_id
                 JOIN sizes sb ON db = sb.doc_id
                 WHERE round(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.8),
               adj AS (SELECT da AS v, db AS nbr FROM pairs
                       UNION ALL SELECT db, da FROM pairs),
               reach(v, r) AS (
                 SELECT v, v FROM (SELECT DISTINCT v FROM adj)
                 UNION
                 SELECT adj.v, reach.r FROM adj JOIN reach ON adj.nbr = reach.v)
               SELECT v AS doc_id, min(r) AS cluster FROM reach GROUP BY v""")),

    // IVF ANN: coarse-quantizer cells + nProbe search — deterministic and
    // SQL-replayable in principle but register rows-only (recall in spec)
    Q("q_embed_ivf_knn",
      (s, d) => Similarity.ivfKnn(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") < 10, k = 5, centroidEvery = 50, nProbe = 2),
      None),

    // LSH-bucketed ANN — xxhash64 planes, rows-only; recall asserted in spec
    Q("q_embed_lsh_knn",
      (s, d) => Similarity.lshKnn(Tables.embeddings(s, d),
        "vec_id", "embedding", dim = 64, col("vec_id") < 10, k = 5, nPlanes = 4),
      None),

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

    // quality signals
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

    // composed training-data pipeline: language filter → quality filter →
    // normalized exact dedup (survivor = min id) → token budget per doc.
    // The "a user could run their whole pipeline" query: four engine
    // operators chained, still one scan + one shuffle.
    Q("q_pipeline_filter_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val lang = TextAnalysis.langId(docs, "text", "doc_id")
        val quality = TextAnalysis.qualityScore(docs, "text", "doc_id")
          .select(col("doc_id"), col("quality"))
        val kept = docs.join(lang, "doc_id").join(quality, "doc_id")
          .where(col("lang_pred") === "en" && col("quality") >= 0.5)
        Dedup.exactNormalized(kept, "text", "doc_id")
          .join(TextAnalysis.tokenStats(docs, "text", "doc_id")
            .select(col("doc_id").as("keep_id"), col("n_ws_tokens")), "keep_id")
          .select(col("keep_id"), col("n_copies"), col("n_ws_tokens"))
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
                       FROM documents)),
               kept AS (
                 SELECT d.doc_id, d.text FROM documents d
                 JOIN lang USING (doc_id) JOIN q USING (doc_id)
                 WHERE lang_pred = 'en' AND quality >= 0.5),
               surv AS (
                 SELECT min(doc_id) AS keep_id, count(*) AS n_copies
                 FROM kept
                 GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
               tok AS (
                 SELECT doc_id AS keep_id,
                        CAST(len(list_filter(string_split_regex(text, '\\s+'),
                          x -> length(x) > 0)) AS BIGINT) AS n_ws_tokens
                 FROM documents)
               SELECT keep_id, n_copies, n_ws_tokens
               FROM surv JOIN tok USING (keep_id)""")),

    // content fingerprint
    Q("q_fingerprint",
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d), "text", "doc_id"),
      Some("""SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
              FROM documents"""))
  )
}
