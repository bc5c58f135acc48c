package graft.llm

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Oracle-checked LLM-pipeline capabilities over `documents` and
  * `embeddings`. Every hash-based op (MinHash banding, SimHash, LSH
  * planes, sampling gates) is built on portable int64 mixers, so DuckDB
  * replays each pipeline end-to-end — zero rows-only entries since
  * round 4. */
object LlmQueries {

  /** DuckDB cosine fragment over double-list columns, rounded to 6dp —
    * ordered list_sum matches Spark's aggregate() fold (q_embed_knn
    * established the parity). */
  private[graft] def duckCos(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
         / (sqrt(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i])))
          * sqrt(list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i])))), 6)"""

  /** DuckDB raw (unrounded) dot of a vector with Rademacher plane `j` —
    * the exact integer-mixer planes of [[Similarity.planeSign]]; DuckDB's
    * 1-based range index i equals Spark's (elementIndex + 1). */
  private[llm] def duckPlaneDot(v: String, j: Int): String =
    s"""list_sum(list_transform(range(1, len($v) + 1),
         i -> $v[i] * (CASE WHEN (i * 2654435761 + ${(j + 1) * 40503L})
                            % 9973 % 2 = 0
                       THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)))"""

  /** DuckDB LSH bucket id for `nPlanes` planes (sum of sign bits). */
  private[llm] def duckBucket(v: String, nPlanes: Int): String =
    (0 until nPlanes).map { j =>
      s"(CASE WHEN ${duckPlaneDot(v, j)} >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Golden SimHash corpus: fixed documents whose 64-bit fingerprints are
    * fully determined by the text (portable polynomial word hashes +
    * mixer bit signs — see [[graft.functions.SimHashFp]]), so the
    * near-dup pair set at maxHamming=3 is a constant — pinned as a VALUES
    * oracle, independently cross-checked in TextLlmSpec against brute-force
    * pairwise Hamming over the fingerprints (banding is lossless for
    * distance ≤ 3 over four 16-bit bands by pigeonhole). */
  val simhashGoldenDocs: Seq[(Long, String)] = {
    // SimHash flips a bit only where the per-bit ±1 word-sum sits at the
    // margin, so a 1-word edit in a long document moves few bits: base
    // docs are 160 deterministic pseudo-words; edits replace one word.
    // Edit positions (15, 2) are chosen so the flip counts land at 1 and
    // 3 under the round-4 portable hash — preserving the same pinned
    // pair set (1,2,1),(1,3,0),(2,3,1),(4,5,3) the xxhash64-era corpus
    // had (re-derived offline from the pure integer arithmetic).
    def base(tag: String) = (0 until 160).map(i => s"$tag$i")
    def text(ws: Seq[String]) = ws.mkString(" ")
    val a = base("alpha")
    val b = base("beta")
    Seq(
      (1L, text(a)),
      (2L, text(a.updated(15, "changed"))),           // near-dup of 1 (hamming 1)
      (3L, text(a.reverse)),                          // permutation: hamming 0 vs 1
      (4L, text(b)),
      (5L, text(b.updated(2, "swapped"))),            // near-dup of 4 (hamming 3)
      (6L, text(base("gamma"))))                      // unrelated
  }

  /** DuckDB word-shingle CTE fragment (k-word shingles, distinct);
    * `where` optionally scopes the documents scan. */
  private[llm] def shingleCteK(k: Int, where: String = ""): String = {
    val joined = (0 until k).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""ws AS (SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), w -> length(w) > 0) AS w
             FROM documents $where),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(w) - ${k - 2}),
                  i -> $joined)) AS shingle
              FROM ws WHERE len(w) >= $k)"""
  }

  /** The 3-shingle instance every Jaccard oracle shares. */
  private[llm] val shingleCte = shingleCteK(3)

  /** DuckDB replay of the substring-dedup front half
    * ([[Dedup.repeatedSpans]] steps 1-4 over gram TEXT instead of the
    * 128-bit gram hash): positional L-grams, grams in ≥2 distinct docs,
    * their positions, and the gaps-and-islands span merge (same island
    * iff p − lag(p) ≤ L; the lag-NULL first row starts an island via the
    * CASE ELSE). Ends inside the WITH — callers append `, cte AS ...` or
    * the final SELECT. */
  private[llm] def substringDedupCte(l: Int, keepOne: Boolean = false): String =
    s"""WITH ws AS (SELECT doc_id,
                      list_filter(string_split_regex(text, '\\s+'),
                        x -> length(x) > 0) AS w
                    FROM documents),
        gr AS (SELECT doc_id,
                 unnest(range(1, len(w) - ${l - 2})) AS p,
                 unnest(list_transform(range(1, len(w) - ${l - 2}),
                   i -> array_to_string(list_slice(w, i, i + ${l - 1}), ' ')))
                   AS gram
               FROM ws WHERE len(w) >= $l),
        dup AS (SELECT gram, min(doc_id) AS owner FROM gr GROUP BY gram
                HAVING count(DISTINCT doc_id) >= 2),
        dp AS (SELECT doc_id, p FROM gr JOIN dup USING (gram)${
      if (keepOne) " WHERE doc_id != owner" else ""}),
        brk AS (SELECT doc_id, p,
                  CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                         <= $l THEN 0 ELSE 1 END AS b
                FROM dp),
        isl AS (SELECT doc_id, p,
                  sum(b) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS island
                FROM brk)"""

  /** DuckDB replay of [[graft.functions.WinnowFingerprint]]: bytes from
    * hex(encode(text)), k-gram hashes as Σ byte·B^(k-1-j) mod M (equal to
    * the expression's rolling recurrence), window minima via a ROWS frame,
    * truncated tail windows excluded by the position bound. */
  private[llm] def winnowSql(k: Int, w: Int): String = {
    val B = graft.functions.WinnowFingerprint.Base
    val M = graft.functions.WinnowFingerprint.Mod
    val pows = (0 until k).map(j =>
      (0 until (k - 1 - j)).foldLeft(1L)((a, _) => a * B % M))
    s"""WITH m AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents),
        pos AS (SELECT doc_id, h, n, unnest(range(1, n - ${k - 1} + 1)) AS p
                FROM m WHERE n >= $k),
        kh AS (SELECT doc_id, n, p,
                 list_sum(list_transform(range(0, $k), j ->
                   (16 * (strpos('0123456789ABCDEF',
                            h[CAST(2 * (p + j) - 1 AS BIGINT)]) - 1)
                      + (strpos('0123456789ABCDEF',
                            h[CAST(2 * (p + j) AS BIGINT)]) - 1))
                   * ${pows.mkString("[", ", ", "]")}[CAST(j + 1 AS BIGINT)]))
                 % $M AS hash
               FROM pos),
        wm AS (SELECT doc_id, n, p,
                 min(hash) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mh
               FROM kh),
        sel AS (SELECT DISTINCT doc_id, mh FROM wm
                WHERE p <= n - ${k + w - 2}),
        fp AS (SELECT doc_id,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY mh) AS fp_set,
                 count(*) AS n_grams
               FROM sel GROUP BY doc_id)
        SELECT d.doc_id, coalesce(fp_set, '') AS fp_set,
               CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams
        FROM documents d LEFT JOIN fp USING (doc_id)"""
  }

  /** DuckDB replay of [[graft.functions.SimHashFp.wordHash]] for column
    * `w` — Σ byte·B^(L-j) mod M over the UTF-8 bytes, decoded from
    * hex(encode(..)) (the simhashCountsCte formulation, extracted for
    * operators that need the word hash standalone; words beyond 64
    * bytes index past the power table and fail LOUDLY as null). */
  private[graft] def duckWordHash(w: String): String = {
    val M = graft.functions.SimHashFp.Mod
    val B = graft.functions.SimHashFp.Base
    val pows = (0 until 64).scanLeft(1L)((a, _) => a * B % M).dropRight(1)
    val powLit = pows.mkString("[", ", ", "]")
    s"""list_sum(list_transform(range(1, octet_length(encode($w)) + 1),
          j -> (16 * (strpos('0123456789ABCDEF',
                   hex(encode($w))[CAST(2 * j - 1 AS BIGINT)]) - 1)
                + (strpos('0123456789ABCDEF',
                   hex(encode($w))[CAST(2 * j AS BIGINT)]) - 1))
               * $powLit[CAST(octet_length(encode($w)) - j + 1 AS BIGINT)]))
        % $M"""
  }

  /** Shared CTE prefix of both SimHash oracles — the full fingerprint
    * replay: per-word polynomial hash (Σ byte·B^(L-j) mod M over the
    * encoded bytes, ≡ [[graft.functions.SimHashFp.wordHash]]'s rolling
    * form; bytes decoded from hex(encode(..)) exactly like the winnowing
    * oracle; words beyond 64 bytes would index past the power table and
    * fail LOUDLY as a null hash — corpus max is 8), then per-(doc, bit)
    * ±1 mixer-sign counts for `nBits` bit indices (0–63 = salt-0 half;
    * 64–127 = salt-1 half — the salt enters the mixer as 64·salt + bit,
    * so one range covers both fingerprint halves). All pure int64
    * arithmetic. */
  private[llm] def simhashCountsCte(nBits: Int): String = {
    val M = graft.functions.SimHashFp.Mod
    val B = graft.functions.SimHashFp.Base
    val pows = (0 until 64).scanLeft(1L)((a, _) => a * B % M).dropRight(1)
    val powLit = pows.mkString("[", ", ", "]")
    s"""words AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(text, '\\s+'),
                   w -> length(w) > 0)) AS w
          FROM documents),
        wh AS MATERIALIZED (
          SELECT doc_id,
            list_sum(list_transform(range(1, octet_length(encode(w)) + 1),
              j -> (16 * (strpos('0123456789ABCDEF',
                       hex(encode(w))[CAST(2 * j - 1 AS BIGINT)]) - 1)
                    + (strpos('0123456789ABCDEF',
                       hex(encode(w))[CAST(2 * j AS BIGINT)]) - 1))
                   * $powLit[CAST(octet_length(encode(w)) - j + 1 AS BIGINT)]))
            % $M AS h
          FROM words),
        bits AS (SELECT unnest(range(0, $nBits)) AS b),
        g1 AS (SELECT doc_id, b,
                      (h * 2654435761 + 40503 * (b + 1)) % $M AS g
               FROM wh CROSS JOIN bits),
        sq AS (SELECT doc_id, b, ((g * g) % $M) AS s FROM g1),
        sq2 AS (SELECT doc_id, b, ((s * s) % $M) AS s FROM sq),
        counts AS MATERIALIZED (
          SELECT doc_id, b,
                 sum(CASE WHEN ((s >> 15) & 1) = 0 THEN 1 ELSE -1 END) AS c
          FROM sq2 GROUP BY doc_id, b)"""
  }

  /** Positive-count bits of one 64-bit half → BIGINT (bit 63 = BIGINT
    * min, two's complement). `off` selects the half. */
  private[llm] def simhashFold(off: Int): String =
    s"""CAST(sum(CASE WHEN b >= $off AND b < ${off + 64} AND c > 0 THEN
          (CASE WHEN b - $off = 63 THEN -9223372036854775807 - 1
                ELSE (CAST(1 AS BIGINT) << (b - $off)) END)
        ELSE 0 END) AS BIGINT)"""

  private[llm] def simhashPairsSql(maxHamming: Int): String =
    s"""WITH ${simhashCountsCte(64)},
        fp AS MATERIALIZED (
          SELECT doc_id, ${simhashFold(0)} AS f
          FROM counts GROUP BY doc_id),
        banded AS MATERIALIZED (
          SELECT doc_id, f, unnest([0, 1, 2, 3]) AS band,
                 unnest([f & 65535, (f >> 16) & 65535,
                         (f >> 32) & 65535, (f >> 48) & 65535]) AS bh
          FROM fp)
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
               CAST(bit_count(CAST(xor(a.f, b.f) AS BIGINT)) AS BIGINT) AS hamming
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        WHERE bit_count(CAST(xor(a.f, b.f) AS BIGINT)) <= $maxHamming"""

  /** DuckDB replay of [[Dedup.simHashPairsWide]]: both salted fingerprint
    * halves from one 128-bit-index count table, 4×32-bit bands, Hamming
    * over all 128 bits. */
  private[llm] def simhashPairsWideSql(maxHamming: Int): String =
    s"""WITH ${simhashCountsCte(128)},
        fp AS MATERIALIZED (
          SELECT doc_id, ${simhashFold(0)} AS f0, ${simhashFold(64)} AS f1
          FROM counts GROUP BY doc_id),
        banded AS MATERIALIZED (
          SELECT doc_id, f0, f1, unnest([0, 1, 2, 3]) AS band,
                 unnest([f0 & 4294967295, (f0 >> 32) & 4294967295,
                         f1 & 4294967295, (f1 >> 32) & 4294967295]) AS bh
          FROM fp)
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
               CAST(bit_count(CAST(xor(a.f0, b.f0) AS BIGINT))
                  + bit_count(CAST(xor(a.f1, b.f1) AS BIGINT)) AS BIGINT) AS hamming
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        WHERE bit_count(CAST(xor(a.f0, b.f0) AS BIGINT))
            + bit_count(CAST(xor(a.f1, b.f1) AS BIGINT)) <= $maxHamming"""

  /** Full LLM-pipeline registry — concatenation of the per-family
    * registries (split in round 7 to keep per-query diffs reviewable;
    * Q names unchanged). */
  val all: Seq[Q] =
    DedupQueries.all ++ SimilarityQueries.all ++
      TextAnalysisQueries.all ++ ScrubSamplingQueries.all
}
