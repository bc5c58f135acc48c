package graft.llm

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import LlmQueries._

/** Scrub + sampling registry: PII scrub, pseudonymization,
  * k-anonymity, hash/mixture/stratified sampling, splits, shard
  * assignment, and the filter-dedup pipeline composition. Shared
  * DuckDB replay fragments live in [[LlmQueries]]. */
object ScrubSamplingQueries {

  val all: Seq[Q] = Seq(
    // PII scrub: the corpus has no natural PII, so the query plants a
    // deterministic email + phone on every doc (+ an ssn on every third)
    // from doc_id — replayable on both engines — then redacts. Counts
    // are taken before redaction; the oracle's regex chain is generated
    // from the SAME Scrub.piiPatterns the operator applies, in the same
    // order (single source of truth — a pattern edit can't desync them).
    // keyed pseudonymization: stable opaque tokens from the portable
    // mixer — the same id maps identically in every table under the
    // same seed, so joins survive; zero-shuffle projection
    Q("q_pseudonymize",
      (s, d) => Scrub.pseudonymize(
          Tables.events(s, d).select(col("event_id"), col("user_id")),
          Seq("user_id")),
      Some("""SELECT event_id,
                     'anon_' || CAST(((user_id % 1000000007) * 2654435761
                       + 283521) % 1000000007 AS VARCHAR) AS user_id
              FROM events""")),

    // k-anonymity audit: occupancy of every quasi-identifier
    // combination + violation flag; shuffle carries (combination,
    // count) cells, never rows
    Q("q_k_anonymity",
      (s, d) => Scrub.kAnonymityAudit(Tables.documents(s, d),
        Seq("lang", "source"), k = 10L),
      Some("""SELECT lang, source, CAST(count(*) AS BIGINT) AS group_n,
                     count(*) < 10 AS violates_k
              FROM documents GROUP BY lang, source""")),

    // l-diversity (r11): the sensitive-attribute companion audit — a
    // (lang, source) group can be k-anonymous yet unanimous in its
    // sensitive column; diversity = distinct sensitive values per
    // group. Sensitive stand-in: the LAST DIGIT of the doc length
    // (n_chars % 10 — NOT a decile, which would need the length
    // distribution via ntile; a derived attribute every fixture row
    // carries, with enough spread to exercise the audit).
    Q("q_l_diversity",
      (s, d) => Scrub.lDiversityAudit(
        Tables.documents(s, d)
          .withColumn("len_mod10", (col("n_chars") % 10).cast("long")),
        Seq("lang", "source"), "len_mod10", l = 3L),
      Some("""SELECT lang, source, CAST(count(*) AS BIGINT) AS group_n,
                     CAST(count(DISTINCT n_chars % 10) AS BIGINT)
                       AS diversity,
                     count(DISTINCT n_chars % 10) < 3 AS violates_l
              FROM documents GROUP BY lang, source""")),

    Q("q_pii_scrub",
      (s, d) => {
        val id4 = lpad((col("doc_id") % 10000).cast("string"), 4, "0")
        val aug = Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or call 415-555-"), id4,
            when(col("doc_id") % 3 === 0,
              concat(lit(" ssn 123-45-"), id4)).otherwise(lit("")))
            .as("text"))
        Scrub.piiScrub(aug, "text", "doc_id")
      },
      Some {
        val clean = Scrub.piiPatterns.foldLeft("text") {
          case (c, (_, pat, repl)) => s"regexp_replace($c, '$pat', '$repl', 'g')"
        }
        val counts = Scrub.piiPatterns.map { case (cat, pat, _) =>
          s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$cat"
        }.mkString(",\n                     ")
        s"""WITH aug AS (
              SELECT doc_id,
                     text || ' contact user' || doc_id ||
                     '@mail.example.com or call 415-555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                     CASE WHEN doc_id % 3 = 0
                          THEN ' ssn 123-45-' ||
                               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END AS text
              FROM documents)
            SELECT doc_id, $clean AS clean_text,
                     $counts
            FROM aug"""
      }),

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

    // deterministic hash sampling: ~20% of documents by stable id gate —
    // reproducible on any cluster layout, and the oracle replays the
    // integer mixer exactly (seed 7 → offset 7*40503 = 283521)
    Q("q_hash_sample",
      (s, d) => Sampling.hashSample(Tables.documents(s, d), "doc_id", 0.2)
        .select(col("doc_id")),
      Some("""SELECT doc_id FROM documents
              WHERE ((doc_id % 1000000007) * 2654435761 + 283521) % 9973 < 1994""")),

    // mixture sampling: per-source keep fractions (upsample curated,
    // downsample scraped, drop unlisted) — same replayable mixer
    Q("q_mixture_sample",
      (s, d) => Sampling.mixtureSample(Tables.documents(s, d), "doc_id",
          "source", Map("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.1))
        .select(col("doc_id"), col("source")),
      Some("""SELECT doc_id, source FROM documents
              WHERE ((doc_id % 1000000007) * 2654435761 + 283521) % 9973 <
                    CASE source WHEN 'src0' THEN 8975
                                WHEN 'src1' THEN 4986
                                WHEN 'src2' THEN 997
                                ELSE -1 END""")),

    // stratified quota: exactly 25 docs per language, the n smallest
    // mixer buckets per stratum (ties by id) — selection via the
    // bounded top-n aggregator, never a per-stratum window sort of the
    // data; DuckDB replays with the window formulation (same total
    // order, so identical rows)
    Q("q_stratified_sample",
      (s, d) => Sampling.stratifiedQuota(Tables.documents(s, d), "doc_id",
          "lang", n = 25)
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""SELECT doc_id, lang, source FROM (
                SELECT doc_id, lang, source,
                       row_number() OVER (PARTITION BY lang
                         ORDER BY ((doc_id % 1000000007) * 2654435761
                                   + 283521) % 9973, doc_id) AS rn
                FROM documents) WHERE rn <= 25""")),

    // temperature-flattened mixture (α = 1/2): sampled mass per language
    // ∝ √(corpus mass) — rare languages upweighted, the dominant one
    // thinned. √/×/÷ are correctly-rounded IEEE ops, so DuckDB replays
    // the per-group cut bit-for-bit; membership is the shared mixer gate
    Q("q_mixture_temperature",
      (s, d) => Sampling.temperatureMixture(Tables.documents(s, d),
          "doc_id", "lang", frac = 0.3)
        .select(col("doc_id"), col("lang")),
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                         FROM documents GROUP BY 1),
              t AS (SELECT CAST(sum(n) AS DOUBLE) AS nn,
                           sum(sqrt(CAST(n AS DOUBLE))) AS s
                    FROM c),
              cut AS (SELECT lang,
                             CAST(floor(least(1.0,
                               0.3 * t.nn / (t.s * sqrt(CAST(n AS DOUBLE))))
                               * 9973) AS BIGINT) AS cut
                      FROM c, t)
              SELECT d.doc_id, d.lang
              FROM documents d JOIN cut USING (lang)
              WHERE ((doc_id % 1000000007) * 2654435761 + 283521) % 9973
                    < cut.cut""")),

    // deterministic train/eval/test split assignment (80/10/10)
    Q("q_hash_split",
      (s, d) => Sampling.splits(Tables.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split")),
      Some("""SELECT doc_id,
                     CASE WHEN ((doc_id % 1000000007) * 2654435761 + 283521) % 9973 < 7978
                            THEN 'train'
                          WHEN ((doc_id % 1000000007) * 2654435761 + 283521) % 9973 < 8975
                            THEN 'eval'
                          ELSE 'test' END AS split
              FROM documents""")),

    // deterministic global shuffle + shard assignment: the serving end
    // of the pipeline — fixed pseudo-random order, numShards parallel
    // shard files, byte-identical on rebuild; one hash exchange + an
    // in-partition sort (window partitioned by shard — never a global
    // single-task window, pinned in PlanShapeSpec)
    Q("q_shard_assign",
      (s, d) => Sampling.shardAssign(Tables.documents(s, d), "doc_id",
          numShards = 16, seed = 7L)
        .select(col("doc_id"), col("shard"), col("pos")),
      Some("""WITH h AS (SELECT doc_id,
                     ((doc_id % 1000000007) * 2654435761 + 283521)
                       % 1000000007 AS h
                   FROM documents)
              SELECT doc_id, h % 16 AS shard,
                     CAST(row_number() OVER (PARTITION BY h % 16
                            ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
              FROM h""")),

    // phrase-blocklist audit: exact whitespace-token phrase matching
    // (1- and 2-word phrases → word shingles of each length join the
    // broadcast list); n_hits counts occurrences, terms lists the
    // sorted distinct phrases found, clean is the filter gate
    Q("q_blocklist",
      (s, d) => Scrub.blocklistHits(Tables.documents(s, d), "text",
        "doc_id", Seq("slow", "big table", "fast merge")),
      Some("""WITH w AS (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                       x -> length(x) > 0) AS ws
                   FROM documents),
              g1 AS (SELECT doc_id, unnest(ws) AS term FROM w),
              g2 AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                         i -> ws[i] || ' ' || ws[i+1])) AS term
                     FROM w WHERE len(ws) >= 2),
              hits AS (SELECT doc_id, term
                       FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
                       WHERE term IN ('slow', 'big table', 'fast merge')),
              agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
                        array_to_string(list_sort(list(DISTINCT term)), chr(10))
                          AS terms
                      FROM hits GROUP BY 1)
              SELECT d.doc_id,
                     CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
                     coalesce(terms, '') AS terms,
                     coalesce(n_hits, 0) = 0 AS clean
              FROM documents d LEFT JOIN agg USING (doc_id)""")),

    // one-pass Pearson correlation matrix over the lineitem measures —
    // the feature-redundancy audit next to q_profile_docs; explicit
    // moments so the expression structure matches the oracle's
    Q("q_corr_matrix",
      (s, d) => graft.operators.Profile.correlationMatrix(
        Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val pairs = for {
          i <- cols.indices; j <- cols.indices if i < j
        } yield (cols(i), cols(j))
        val moments =
          cols.flatMap(c => Seq(
            s"sum(CAST($c AS DOUBLE)) AS ${c}__s",
            s"sum(CAST($c AS DOUBLE) * CAST($c AS DOUBLE)) AS ${c}__ss")) ++
            pairs.map { case (a, b) =>
              s"sum(CAST($a AS DOUBLE) * CAST($b AS DOUBLE)) AS ${a}__${b}__sp"
            }
        def vt(c: String) = s"(n * ${c}__ss - ${c}__s * ${c}__s)"
        val rows = pairs.map { case (a, b) =>
          s"""SELECT '$a' AS col_a, '$b' AS col_b,
                CASE WHEN ${vt(a)} > 0 AND ${vt(b)} > 0
                  THEN round((n * ${a}__${b}__sp - ${a}__s * ${b}__s)
                         / (sqrt(${vt(a)}) * sqrt(${vt(b)})), 6)
                END AS corr
              FROM s"""
        }.mkString("\nUNION ALL\n")
        s"""WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
               ${moments.mkString(",\n")}
             FROM lineitem)
            $rows"""
      }),

    // token-budget mixture: fill a 4000-token budget at 4/2/1/1 source
    // weights (quotas 2000/1000/500/500), docs in hash-shuffled order,
    // kept while the source's running token total fits the quota
    Q("q_token_budget_mix",
      (s, d) => Sampling.tokenBudgetMix(Tables.documents(s, d), "doc_id",
        "source", "text", budget = 4000L,
        weights = Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0,
          "src3" -> 1.0)),
      Some("""WITH t AS (
                SELECT source, doc_id,
                       len(list_filter(string_split_regex(text, '\s+'),
                         x -> length(x) > 0)) AS n_tokens,
                       ((doc_id % 1000000007) * 2654435761 + 283521) % 9973
                         AS b
                FROM documents
                WHERE source IN ('src0', 'src1', 'src2', 'src3')),
              c AS (
                SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                       CAST(sum(n_tokens) OVER (PARTITION BY source
                         ORDER BY b, doc_id ROWS UNBOUNDED PRECEDING)
                         AS BIGINT) AS cum_tokens
                FROM t)
              SELECT source, doc_id, n_tokens, cum_tokens FROM c
              WHERE cum_tokens <= CASE source
                WHEN 'src0' THEN 2000 WHEN 'src1' THEN 1000
                WHEN 'src2' THEN 500 ELSE 500 END"""))
  )
}
