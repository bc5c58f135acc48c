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
}
