package graft.text

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Oracle-checked text capabilities over the `documents` table
  * (doc_id, text, lang, source, n_chars). */
object TextQueries {

  val all: Seq[Q] = Seq(

    // wordfreq (`oink/wordfreq.cpp:40-112`): word → count
    Q("q_wordfreq",
      (s, d) => TextOps.wordFreq(Tables.documents(s, d), "text"),
      Some("""SELECT word, count(*) AS n FROM (
                SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents
              ) WHERE length(word) > 0 GROUP BY word""")),

    // wordfreq routed through the two-phase salted aggregation — the
    // nthresh zone-splitting the reference hand-codes for its giant
    // component (`oink/cc_find.cpp:224-264`). Salting is answer-invariant
    // (counts re-merge identically), so the oracle is plain word→count;
    // PlanShapeSpec pins the (word, salt) → word two-phase plan.
    Q("q_wordfreq_salted",
      (s, d) => TextOps.wordFreqSalted(Tables.documents(s, d), "text",
        salts = 8),
      Some("""SELECT word, count(*) AS n FROM (
                SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents
              ) WHERE length(word) > 0 GROUP BY word""")),

    // bigram counts, global top-20: the n-gram generalization of wordfreq
    // (unigram case) via the native shingle expression — one generator
    // projection + one vocabulary-keyed aggregation, top-K lowered to
    // TakeOrderedAndProject
    Q("q_bigram_topn",
      (s, d) => Tables.documents(s, d)
        .select(explode(graft.functions.ShingleArray.shinglesAll(
          split(col("text"), "\\s+"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20),
      Some("""WITH ws AS (SELECT list_filter(string_split_regex(text, '\s+'),
                       w -> length(w) > 0) AS w
                     FROM documents),
              sh AS (SELECT unnest(list_transform(range(1, len(w)),
                       i -> w[i] || ' ' || w[i+1])) AS bigram
                     FROM ws WHERE len(w) >= 2)
              SELECT bigram, CAST(count(*) AS BIGINT) AS n
              FROM sh GROUP BY 1
              ORDER BY n DESC, bigram LIMIT 20""")),

    // tf-idf: top-3 distinguishing terms per document (retrieval prep)
    Q("q_tfidf",
      (s, d) => TextOps.tfIdfTopK(Tables.documents(s, d), "text", "doc_id",
        k = 3),
      Some("""WITH w AS (SELECT doc_id,
                     unnest(string_split_regex(text, '\s+')) AS word
                   FROM documents),
              ww AS (SELECT doc_id, word FROM w WHERE length(word) > 0),
              tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
                     FROM ww GROUP BY 1, 2),
              dfc AS (SELECT word, CAST(count(*) AS BIGINT) AS df
                      FROM tf GROUP BY 1),
              nd AS (SELECT count(*) AS n_docs FROM documents),
              sc AS (SELECT tf.doc_id, tf.word, tf.tf,
                            round(tf.tf * ln(nd.n_docs / dfc.df), 6) AS tfidf
                     FROM tf JOIN dfc USING (word) CROSS JOIN nd)
              SELECT doc_id, word, tf, tfidf FROM (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, word) AS rn FROM sc)
              WHERE rn <= 3""")),

    // Okapi BM25 top-5 retrieval for a fixed keyword-query set; the
    // formula is one double expression shape mirrored operand-for-
    // operand (ln-parity discipline); query-term df product broadcasts
    // into tf, 1-row totals broadcast, per-query window top-k
    Q("q_bm25_topk",
      (s, d) => TextOps.bm25TopK(Tables.documents(s, d), "text", "doc_id",
        bm25Queries, k = 5),
      Some(bm25Sql)),

    // the SAME BM25 retrieval answered from the PERSISTED inverted index
    // (graft.sources.TextIndex — the reference's flagship on-disk
    // artifact, `cuda/InvertedIndex.cu:463-513`): denormalized posting
    // lists (word, doc_id, tf, dl) bucket-sorted by word plus a running
    // (n_docs, sum_dl) totals table, built once; serving pushes the
    // query terms as a literal IN into the postings scan (bucket-pruned,
    // TextIndexSpec pins SelectedBucketsCount) and derives df from the
    // probe itself, so the corpus text is never re-tokenized. Scores sum
    // the same factored term expression as bm25TopK — identical answers,
    // so the oracle is the SAME full replay; the index changes cost,
    // never answers.
    Q("q_bm25_stored",
      (s, d) => {
        val name = graft.sources.TextIndex.ensureBuilt(s, d)
        graft.sources.TextIndex.serve(s, name, bm25Queries, k = 5)
      },
      Some(bm25Sql)),

    // wordfreq Ntop: global top-20, deterministic tiebreak
    Q("q_wordfreq_topn",
      (s, d) => TextOps.topWords(Tables.documents(s, d), "text", 20),
      Some("""SELECT word, count(*) AS n FROM (
                SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents
              ) WHERE length(word) > 0 GROUP BY word
              ORDER BY n DESC, word ASC LIMIT 20""")),

    // inverted index (`cuda/InvertedIndex.cu`): word → posting list of docs
    Q("q_inverted_index",
      (s, d) => TextOps.invertedIndex(Tables.documents(s, d), "text", "doc_id"),
      Some("""WITH pairs AS (
                SELECT DISTINCT word, doc_id FROM (
                  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
                  FROM documents
                ) WHERE length(word) > 0
              )
              SELECT word, count(*) AS n_docs,
                     string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
              FROM pairs GROUP BY word""")),

    // per-language word counts: wordfreq keyed by a second column
    Q("q_wordfreq_by_lang",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n")),
      Some("""SELECT lang, word, count(*) AS n FROM (
                SELECT lang, unnest(string_split_regex(text, '\s+')) AS word FROM documents
              ) WHERE length(word) > 0 GROUP BY lang, word""")),

    // IntCount (`cpu/IntCount.cpp`): int frequency over a column stream
    Q("q_intcount",
      (s, d) => TextOps.intCount(Tables.lineitem(s, d), "l_suppkey"),
      Some("SELECT l_suppkey AS i, count(*) AS n FROM lineitem GROUP BY l_suppkey")),

    // regexp extraction (the `<a href=` state machine generalized):
    // occurrences of tokens ending in 'k' per document
    Q("q_regex_extract",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\b(\\w*k)\\b"), lit(1))).cast("long").as("n_matches")),
      Some("""SELECT doc_id,
                     len(regexp_extract_all(text, '\b(\w*k)\b', 1)) AS n_matches
              FROM documents"""))
  )

  /** The fixed keyword-query set both BM25 registrations score. */
  private def bm25Queries: Seq[(String, String)] =
    Seq("q1" -> "spark hash join", "q2" -> "table scan filter",
      "q3" -> "sort merge batch")

  /** Full portable-replay oracle shared by q_bm25_topk and its
    * stored-index twin (identical ranking semantics — the index only
    * changes where the tf/dl/df derivation comes from). */
  private lazy val bm25Sql: String =
    """WITH w AS (SELECT doc_id,
                     unnest(string_split_regex(text, '\s+')) AS word
                   FROM documents),
              ww AS (SELECT doc_id, word FROM w WHERE length(word) > 0),
              tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
                     FROM ww GROUP BY 1, 2),
              dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
                     FROM tf GROUP BY 1),
              dfc AS (SELECT word, CAST(count(*) AS BIGINT) AS df
                      FROM tf GROUP BY 1),
              tot AS (SELECT count(*) AS n_docs,
                             CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
              q(qid, word) AS (VALUES
                ('q1', 'spark'), ('q1', 'hash'), ('q1', 'join'),
                ('q2', 'table'), ('q2', 'scan'), ('q2', 'filter'),
                ('q3', 'sort'), ('q3', 'merge'), ('q3', 'batch')),
              sc AS (SELECT q.qid, tf.doc_id,
                       round(sum(
                         ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5)
                                  / (df + 0.5)) *
                         (tf * (1.2 + 1.0)) /
                         (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
                            (CAST(sum_dl AS DOUBLE) / n_docs)))), 6) AS score
                     FROM tf
                     JOIN q USING (word)
                     JOIN dfc USING (word)
                     JOIN dl USING (doc_id)
                     CROSS JOIN tot
                     GROUP BY 1, 2)
              SELECT qid, doc_id, score, rn FROM (
                SELECT *, CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY score DESC, doc_id) AS BIGINT) AS rn FROM sc)
              WHERE rn <= 5"""
}
