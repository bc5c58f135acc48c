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
  private def duckCos(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
         / (sqrt(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i])))
          * sqrt(list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i])))), 6)"""

  /** DuckDB raw (unrounded) dot of a vector with Rademacher plane `j` —
    * the exact integer-mixer planes of [[Similarity.planeSign]]; DuckDB's
    * 1-based range index i equals Spark's (elementIndex + 1). */
  private def duckPlaneDot(v: String, j: Int): String =
    s"""list_sum(list_transform(range(1, len($v) + 1),
         i -> $v[i] * (CASE WHEN (i * 2654435761 + ${(j + 1) * 40503L})
                            % 9973 % 2 = 0
                       THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)))"""

  /** DuckDB LSH bucket id for `nPlanes` planes (sum of sign bits). */
  private def duckBucket(v: String, nPlanes: Int): String =
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
  private def shingleCteK(k: Int, where: String = ""): String = {
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
  private val shingleCte = shingleCteK(3)

  /** DuckDB replay of the substring-dedup front half
    * ([[Dedup.repeatedSpans]] steps 1-4 over gram TEXT instead of the
    * 128-bit gram hash): positional L-grams, grams in ≥2 distinct docs,
    * their positions, and the gaps-and-islands span merge (same island
    * iff p − lag(p) ≤ L; the lag-NULL first row starts an island via the
    * CASE ELSE). Ends inside the WITH — callers append `, cte AS ...` or
    * the final SELECT. */
  private def substringDedupCte(l: Int, keepOne: Boolean = false): String =
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
  private def winnowSql(k: Int, w: Int): String = {
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
  private def simhashCountsCte(nBits: Int): String = {
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
  private def simhashFold(off: Int): String =
    s"""CAST(sum(CASE WHEN b >= $off AND b < ${off + 64} AND c > 0 THEN
          (CASE WHEN b - $off = 63 THEN -9223372036854775807 - 1
                ELSE (CAST(1 AS BIGINT) << (b - $off)) END)
        ELSE 0 END) AS BIGINT)"""

  private def simhashPairsSql(maxHamming: Int): String =
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
  private def simhashPairsWideSql(maxHamming: Int): String =
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

    // decontamination: training docs sharing any 8-shingle with a
    // deterministic 20% "benchmark" slice (the q_hash_sample gate) are
    // flagged with their shared-shingle count — the train/test overlap
    // scrub, replayed exactly by DuckDB. k = 8 so only genuine overlap
    // (near-dups, quotes) flags; at k = 3 phrase-level collisions flag
    // essentially the whole corpus.
    // exact incremental dedup behind a Bloom pre-filter (Spark's own
    // runtime-filter expressions): the answer is bloom-invariant (exact
    // semi-join weeds false positives; false negatives impossible), so
    // the oracle is a plain fingerprint set difference
    Q("q_bloom_prefilter",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sampled = Sampling.hashSample(docs, "doc_id", 0.2)
        val corpus = docs.join(sampled.select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        // the batch = the 20% slice (novel) plus a re-crawl of part of
        // the corpus under NEW ids (true duplicates by construction) —
        // the corpus has no exact-dup groups of its own, so without the
        // re-crawl the rejection path would never fire
        val recrawl = corpus.where(col("doc_id") % 10 === 3)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        Dedup.exactIncremental(sampled.unionByName(recrawl), corpus,
          "text", "doc_id")
          .select(col("doc_id"))
      },
      Some("""WITH f0 AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                       ((doc_id % 1000000007) * 2654435761 + 283521) % 9973 < 1994
                         AS in_sample
                FROM documents),
              fresh AS (
                SELECT doc_id, fp FROM f0 WHERE in_sample
                UNION ALL
                SELECT doc_id + 1000000, fp FROM f0
                WHERE NOT in_sample AND doc_id % 10 = 3),
              cf AS (SELECT fp FROM f0 WHERE NOT in_sample)
              SELECT doc_id FROM fresh
              WHERE fp NOT IN (SELECT fp FROM cf)""")),

    // incremental ingestion dedup: the 20% mixer slice plays the "new
    // crawl batch", the rest the existing corpus; admitted = fresh docs
    // with no corpus near-dup at exact Jaccard >= 0.8 among banded
    // MinHash candidates. The oracle computes the true cross-Jaccard
    // directly (banding recall equivalence pinned by q_minhash_lsh_pairs)
    // NOTE on check strength: the Spark side admits via banded-MinHash
    // candidates, the oracle via exact cross-Jaccard — equal only when
    // banding recall is perfect. At tau=0.8, r=4, b=16 the per-pair miss
    // probability is (1−0.8⁴)^16 ≈ 2·10⁻⁴, and this fixture has no pair
    // near the boundary, so the check is deterministic HERE; on a
    // different corpus a missed band pair could admit a doc the oracle
    // rejects. Probabilistic-recall by design — same class as the
    // q_minhash_lsh_pairs equivalence it reuses.
    Q("q_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val fresh = Sampling.hashSample(docs, "doc_id", 0.2)
        val corpus = docs.join(fresh.select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        Dedup.incrementalDedup(fresh, corpus, "text", "doc_id")
          .select(col("doc_id"))
      },
      Some(s"""WITH $shingleCte,
               fresh AS (SELECT doc_id FROM documents
                         WHERE ((doc_id % 1000000007) * 2654435761 + 283521)
                               % 9973 < 1994),
               fs AS (SELECT sh.doc_id, shingle FROM sh JOIN fresh USING (doc_id)),
               cs AS (SELECT sh.doc_id, shingle FROM sh
                      WHERE sh.doc_id NOT IN (SELECT doc_id FROM fresh)),
               fsz AS (SELECT doc_id, count(*) AS nf FROM fs GROUP BY 1),
               csz AS (SELECT doc_id, count(*) AS nc FROM cs GROUP BY 1),
               inter AS (SELECT fs.doc_id AS fid, cs.doc_id AS cid,
                                count(*) AS c
                         FROM fs JOIN cs ON fs.shingle = cs.shingle
                         GROUP BY 1, 2),
               dup AS (SELECT DISTINCT fid FROM inter
                       JOIN fsz ON fsz.doc_id = inter.fid
                       JOIN csz ON csz.doc_id = inter.cid
                       WHERE round(c * 1.0 / (nf + nc - c), 4) >= 0.8)
               SELECT doc_id FROM fresh
               WHERE doc_id NOT IN (SELECT fid FROM dup)""")),

    // sequence-level (substring) dedup: maximal cross-document repeated
    // token spans (L=10 fits the fixture's 10-99-token docs; production
    // default is 50). The oracle replays the whole pipeline over gram
    // TEXT — the collision-free semantics the operator's 128-bit gram
    // key approximates (first expected collision past 10^18 grams).
    Q("q_repeated_spans",
      (s, d) => Dedup.repeatedSpans(Tables.documents(s, d), "text", "doc_id",
        spanLen = 10),
      Some(substringDedupCte(10) +
        """ SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
                  CAST(max(p) + 9 AS BIGINT) AS span_end,
                  CAST(max(p) + 9 - min(p) + 1 AS BIGINT) AS span_tokens
           FROM isl GROUP BY doc_id, island""")),

    // substring-dedup excision: every token covered by a cross-document
    // repeated 10-gram removed; clean_text is the surviving tokens joined
    // by single spaces (whitespace-normalized by contract, so the output
    // is a pure function of the token sequence on both engines).
    Q("q_excise_spans",
      (s, d) => Dedup.exciseRepeatedSpans(Tables.documents(s, d), "text",
        "doc_id", spanLen = 10),
      Some(substringDedupCte(10) +
        """, cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 10)) AS t
                     FROM dp),
           tok AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS t,
                          unnest(w) AS tokv
                   FROM ws),
           keep AS (SELECT doc_id, t, tokv FROM tok
                    WHERE NOT EXISTS (SELECT 1 FROM cov
                                      WHERE cov.doc_id = tok.doc_id
                                        AND cov.t = tok.t)),
           agg AS (SELECT doc_id, string_agg(tokv, ' ' ORDER BY t) AS ct,
                          count(*) AS nk
                   FROM keep GROUP BY doc_id)
           SELECT ws.doc_id, coalesce(ct, '') AS clean_text,
                  CAST(len(w) - coalesce(nk, 0) AS BIGINT) AS n_removed
           FROM ws LEFT JOIN agg USING (doc_id)""")),

    // keep-one-copy excision: each duplicated gram survives in its OWNER
    // document (min doc_id containing it — a deterministic global
    // tie-break both engines replay); every other copy is removed. The
    // production substring-dedup semantics: the corpus retains exactly
    // one canonical copy of each duplicated passage.
    Q("q_excise_spans_keep_one",
      (s, d) => Dedup.exciseRepeatedSpans(Tables.documents(s, d), "text",
        "doc_id", spanLen = 10, keepOne = true),
      Some(substringDedupCte(10, keepOne = true) +
        """, cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 10)) AS t
                     FROM dp),
           tok AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS t,
                          unnest(w) AS tokv
                   FROM ws),
           keep AS (SELECT doc_id, t, tokv FROM tok
                    WHERE NOT EXISTS (SELECT 1 FROM cov
                                      WHERE cov.doc_id = tok.doc_id
                                        AND cov.t = tok.t)),
           agg AS (SELECT doc_id, string_agg(tokv, ' ' ORDER BY t) AS ct,
                          count(*) AS nk
                   FROM keep GROUP BY doc_id)
           SELECT ws.doc_id, coalesce(ct, '') AS clean_text,
                  CAST(len(w) - coalesce(nk, 0) AS BIGINT) AS n_removed
           FROM ws LEFT JOIN agg USING (doc_id)""")),

    Q("q_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val test = Sampling.hashSample(docs, "doc_id", 0.2)
        val train = docs.join(test.select(col("doc_id")), Seq("doc_id"), "left_anti")
        Dedup.decontaminate(train, test, "text", "doc_id", k = 8)
      },
      Some(s"""WITH ${shingleCteK(8)},
               test_ids AS (SELECT doc_id FROM documents
                            WHERE ((doc_id % 1000000007) * 2654435761 + 283521) % 9973 < 1994),
               tsh AS (SELECT DISTINCT shingle FROM sh JOIN test_ids USING (doc_id))
               SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared_shingles
               FROM sh JOIN tsh USING (shingle)
               WHERE sh.doc_id NOT IN (SELECT doc_id FROM test_ids)
               GROUP BY sh.doc_id""")),

    // graded contamination: per-training-doc FRACTION of shingles shared
    // with the eval slice (left join marks membership, so clean docs
    // score 0.0 rather than vanishing) — thresholdable overlap, the form
    // pipelines adjudicate partial contamination with
    Q("q_contamination_score",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val test = Sampling.hashSample(docs, "doc_id", 0.2)
        val train = docs.join(test.select(col("doc_id")), Seq("doc_id"), "left_anti")
        Dedup.contaminationScore(train, test, "text", "doc_id", k = 8)
      },
      Some(s"""WITH ${shingleCteK(8)},
               test_ids AS (SELECT doc_id FROM documents
                            WHERE ((doc_id % 1000000007) * 2654435761 + 283521) % 9973 < 1994),
               tsh AS (SELECT DISTINCT shingle FROM sh JOIN test_ids USING (doc_id))
               SELECT sh.doc_id,
                      CAST(count(*) AS BIGINT) AS n_shingles,
                      CAST(count(tsh.shingle) AS BIGINT) AS n_shared,
                      round(count(tsh.shingle) * 1.0 / count(*), 6) AS overlap
               FROM sh LEFT JOIN tsh ON sh.shingle = tsh.shingle
               WHERE sh.doc_id NOT IN (SELECT doc_id FROM test_ids)
               GROUP BY sh.doc_id""")),

    // exact n-gram Jaccard near-dup pairs (quadratic truth baseline)
    // asymmetric containment pairs: sub-document duplication Jaccard
    // misses; rare-shingle-anchored candidates (df <= 20, >= 5 shared —
    // both deterministic dials, tuned for the synthetic corpus's
    // 31-word vocabulary where shingle df is artificially dense) make
    // the candidate set an exact function of the corpus: the oracle
    // replays it term for term, no banding recall to adjudicate
    Q("q_containment_pairs",
      (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "text",
        "doc_id", k = 3, tau = 0.8, maxDf = 20L, minShared = 5L),
      Some(s"""WITH $shingleCte,
               df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
               rare AS (SELECT sh.doc_id, sh.shingle
                        FROM sh JOIN df USING (shingle) WHERE df <= 20),
               cand AS (SELECT a.doc_id AS da, b.doc_id AS db
                        FROM rare a JOIN rare b
                          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                        GROUP BY 1, 2 HAVING count(*) >= 5),
               sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
               inter AS (SELECT c.da, c.db, count(*) AS c
                         FROM cand c
                         JOIN sh a ON a.doc_id = c.da
                         JOIN sh b ON b.doc_id = c.db AND b.shingle = a.shingle
                         GROUP BY 1, 2)
               SELECT da, db,
                      round(c * 1.0 / sa.n, 4) AS cont_a,
                      round(c * 1.0 / sb.n, 4) AS cont_b
               FROM inter
               JOIN sizes sa ON da = sa.doc_id
               JOIN sizes sb ON db = sb.doc_id
               WHERE greatest(round(c * 1.0 / sa.n, 4),
                              round(c * 1.0 / sb.n, 4)) >= 0.8""")),

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

    // MinHash LSH candidates + EXACT Jaccard verification: the final
    // answer is hash-independent (banding only prunes the pair space), so
    // the exact n-gram-Jaccard oracle checks the whole banded plan —
    // candidate recall at these parameters (P[miss] ≈ 2e-4 per true pair)
    // is also asserted against the quadratic baseline in TextLlmSpec.
    // RECALL CAVEAT: oracle equality assumes banding recall = 1 on the
    // current corpus. That holds for the fixed testdata, but regenerating
    // documents (or raising sf, adding true pairs near J = 0.8) can
    // legitimately drop a pair with probability (1 - J^4)^16 per pair —
    // a failure here after a DATA change means re-check recall before
    // suspecting the engine.
    Q("q_minhash_lsh_pairs",
      (s, d) => Dedup.minHashLshPairsExact(Tables.documents(s, d), "text",
        "doc_id", k = 3, numHashes = 64, bands = 16, tau = 0.8),
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

    // SimHash fingerprints + near-dup pairs on the real corpus —
    // oracle-checked since round 4: the portable polynomial word hash +
    // mixer signs let DuckDB recompute every fingerprint, band, and
    // Hamming distance (previously rows-only under xxhash64)
    Q("q_simhash_pairs",
      (s, d) => Dedup.simHashPairs(Tables.documents(s, d), "text", "doc_id",
        maxHamming = 3),
      Some(simhashPairsSql(maxHamming = 3))),

    // the 128-bit / 32-bit-band layout (the billion-doc scale path) on
    // the real corpus, with the same full-replay oracle machinery —
    // both fingerprint halves recomputed in SQL
    Q("q_simhash_pairs_wide",
      (s, d) => Dedup.simHashPairsWide(Tables.documents(s, d), "text", "doc_id",
        maxHamming = 3),
      Some(simhashPairsWideSql(maxHamming = 3))),

    // SimHash on the fixed golden corpus: fingerprints are a pure function
    // of the fixed text, so the pair set is a constant — VALUES oracle,
    // independently cross-checked in TextLlmSpec against brute-force
    // pairwise Hamming (banding is lossless for distance ≤ 3 by pigeonhole)
    Q("q_simhash_golden",
      (s, d) => {
        import s.implicits._
        Dedup.simHashPairs(simhashGoldenDocs.toDF("doc_id", "text"),
          "text", "doc_id", maxHamming = 3)
      },
      Some("""SELECT CAST(da AS BIGINT) AS da, CAST(db AS BIGINT) AS db,
                     CAST(hamming AS BIGINT) AS hamming
              FROM (VALUES (1, 2, 1), (1, 3, 0), (2, 3, 1), (4, 5, 3))
                t(da, db, hamming)""")),

    // per-label centroids via the fixed-dim VectorMeanAggregator (the
    // centroid step an IVF quantizer trains with): one 64-double buffer
    // per group with map-side partials — never an exploded (row, dim)
    // shuffle. Emitted one row per (label, dim) — scalar rows hash
    // portably where array cells would not.
    Q("q_embed_centroids",
      (s, d) => {
        val cent = Tables.embeddings(s, d)
          .groupBy(col("label"))
          .agg(graft.functions.VectorMeanAggregator.vecMean(64)(
            col("embedding")).as("c"))
        cent.select(col("label"), posexplode(col("c")).as(Seq("pos", "m0")))
          .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
            round(col("m0"), 6).as("m"))
      },
      Some("""WITH d AS (
                SELECT label, t.i AS dim,
                       avg(CAST(embedding[t.i] AS DOUBLE)) AS m
                FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
                GROUP BY 1, 2)
              SELECT label, CAST(dim AS BIGINT) AS dim, round(m, 6) AS m
              FROM d""")),

    // k-means over the embedding corpus: 2 fixed Lloyd rounds, k=16,
    // mixer-seeded init — the oracle unrolls both rounds as CTEs with
    // term-for-term identical arithmetic (6dp rounding pins the FP
    // boundary between rounds on both engines). Residual risk, accepted:
    // Spark's partial-aggregation merge order is nondeterministic, so a
    // centroid component landing within ~1e-15 of a 6dp rounding boundary
    // could round differently across runs and cascade into round-2
    // assignments — a FLAKY mismatch, not a wrong answer. Not observed
    // through sf0.1; if it appears at larger sf, widen the pin (round the
    // DISTANCES too, not just the centroids) rather than loosening it.
    Q("q_kmeans",
      (s, d) => Similarity.kmeans(Tables.embeddings(s, d), "vec_id",
        "embedding", dim = 64, k = 16, iters = 2),
      Some({
        def sq(a: String, b: String): String =
          s"""(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]))
               - 2 * list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
               + list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i])))"""
        s"""WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            c0 AS (SELECT vec_id AS cid, e AS cv FROM v
                   ORDER BY ((vec_id % 1000000007) * 2654435761 + 445533) % 9973,
                            vec_id
                   LIMIT 16),
            a1 AS (SELECT vec_id, e, cid FROM (
                     SELECT v.vec_id, v.e, c.cid,
                            row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(${sq("v.e", "c.cv")}, 6), c.cid)
                              AS rn
                     FROM v, c0 c) WHERE rn = 1),
            c1 AS (SELECT cid, list(mm ORDER BY dim) AS cv FROM (
                     SELECT cid, t.i AS dim, round(avg(e[t.i]), 6) AS mm
                     FROM a1, UNNEST(range(1, 65)) AS t(i) GROUP BY 1, 2)
                   GROUP BY cid),
            a2 AS (SELECT vec_id, cid FROM (
                     SELECT v.vec_id, c.cid,
                            row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round(${sq("v.e", "c.cv")}, 6), c.cid)
                              AS rn
                     FROM v, c1 c) WHERE rn = 1)
            SELECT vec_id, cid AS cluster FROM a2"""
      })),

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

    // exact embedding near-dup pairs — quadratic truth baseline on a FIXED
    // slice (vec_id < 500 both sides): the benched cost is constant in sf,
    // never O(n²) in the corpus. The production-scale paths are the
    // LSH/IVF queries below; this slice exists to keep an exact-answer
    // row in the harness.
    Q("q_embed_dup_pairs",
      (s, d) => Similarity.embeddingDupPairs(
        Tables.embeddings(s, d).where(col("vec_id") < 500),
        "vec_id", "embedding", tau = 0.45),
      Some("""WITH v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings WHERE vec_id < 500)
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

    // embedding near-dup clusters: cosine pairs → connected components,
    // the same pairs→cc→survivor composition as q_dedup_clusters but over
    // the vector side; DuckDB replays the closure recursively
    Q("q_embed_dup_clusters",
      (s, d) => Dedup.dedupClusters(
        Similarity.embeddingDupPairs(
          Tables.embeddings(s, d).where(col("vec_id") < 500),
          "vec_id", "embedding", tau = 0.45)
          .select(col("da"), col("db"))),
      Some("""WITH RECURSIVE v AS (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings WHERE vec_id < 500),
              pairs AS (
                SELECT da, db FROM (
                  SELECT a.vec_id AS da, b.vec_id AS db,
                         round(
                           list_sum(list_transform(range(1, len(a.e) + 1),
                             i -> a.e[i] * b.e[i]))
                           / (sqrt(list_sum(list_transform(range(1, len(a.e) + 1),
                                i -> a.e[i] * a.e[i])))
                            * sqrt(list_sum(list_transform(range(1, len(b.e) + 1),
                                i -> b.e[i] * b.e[i])))), 6) AS cos
                  FROM v a JOIN v b ON a.vec_id < b.vec_id)
                WHERE cos >= 0.45),
              adj AS (SELECT da AS v, db AS nbr FROM pairs
                      UNION ALL SELECT db, da FROM pairs),
              reach(v, r) AS (
                SELECT v, v FROM (SELECT DISTINCT v FROM adj)
                UNION
                SELECT adj.v, reach.r FROM adj JOIN reach ON adj.nbr = reach.v)
              SELECT v AS doc_id, min(r) AS cluster FROM reach GROUP BY v""")),

    // near-dup clusters: banded LSH pairs (exact-verified) → connected
    // components → survivor — the flagship production dedup shape. The
    // pair set is hash-independent (banding only prunes the pair space;
    // recall caveat as in q_minhash_lsh_pairs), so DuckDB replays the
    // closure recursively over the exact all-pairs edges and the answers
    // coincide. The quadratic generator survives only in
    // q_ngram_jaccard_pairs, its designated truth-baseline row.
    Q("q_dedup_clusters",
      (s, d) => Dedup.dedupClusters(
        Dedup.minHashLshPairsExact(Tables.documents(s, d), "text", "doc_id",
          k = 3, numHashes = 64, bands = 16, tau = 0.8)),
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

    // survivor policy: per near-dup cluster keep the HIGHEST-QUALITY
    // member (tie → min id) — the curation knob layered on the same
    // cluster set as q_dedup_clusters; quality is the 4dp-rounded blend,
    // so the argmax compares values both engines compute identically
    Q("q_dedup_survivors",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.survivorsByQuality(
          Dedup.dedupClusters(
            Dedup.minHashLshPairsExact(docs, "text", "doc_id",
              k = 3, numHashes = 64, bands = 16, tau = 0.8)),
          TextAnalysis.qualityScore(docs, "text", "doc_id"))
      },
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
                 SELECT adj.v, reach.r FROM adj JOIN reach ON adj.nbr = reach.v),
               clusters AS (SELECT v AS doc_id, min(r) AS cluster
                            FROM reach GROUP BY v),
               qt AS (
                 SELECT doc_id, text,
                        list_filter(string_split_regex(text, '\\s+'),
                          w -> length(w) > 0) AS w
                 FROM documents),
               qm AS (
                 SELECT doc_id,
                        len(w) AS n_words,
                        len(list_filter(w, x -> list_contains(
                          ${TextAnalysis.stopwords.mkString("['", "','", "']")}, x)))
                          * 1.0 / len(w) AS stop_ratio,
                        len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / length(text)
                          AS punct_ratio
                 FROM qt),
               q AS (
                 SELECT doc_id,
                        round(least(n_words / 100.0, 1.0) * 0.4 +
                              least(stop_ratio * 5.0, 1.0) * 0.4 +
                              (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 4)
                          AS quality
                 FROM qm)
               SELECT cluster, doc_id AS survivor_id,
                      quality AS survivor_quality
               FROM (
                 SELECT c.cluster, c.doc_id, q.quality,
                        row_number() OVER (PARTITION BY c.cluster
                          ORDER BY q.quality DESC, c.doc_id) AS rn
                 FROM clusters c JOIN q ON c.doc_id = q.doc_id)
               WHERE rn = 1""")),

    // IVF ANN: coarse-quantizer cells + nProbe search — fully deterministic
    // (portable-mixer hash-sample of a FIXED 64 centroids, so the
    // broadcast quantizer side is corpus-size-independent), and DuckDB
    // replays the whole pipeline: centroid selection, assignment, nProbe
    // cell selection, in-cell scoring, top-k
    // product-quantization ANN: 4 subspaces × 16 dims, 8-codeword
    // codebooks (mixer-seeded + one 6dp-pinned Lloyd recompute),
    // asymmetric-distance scoring against a broadcast (query × codeword)
    // table. The oracle unrolls the whole pipeline — init, assign,
    // recompute, encode, ADC — with term-for-term identical arithmetic.
    Q("q_embed_pq_knn",
      (s, d) => Similarity.pqKnn(Tables.embeddings(s, d), "vec_id",
        "embedding", dim = 64, col("vec_id") < 10, m = 4, ksub = 8, k = 5),
      Some({
        def sq(a: String, b: String): String =
          s"""(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]))
               - 2 * list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
               + list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i])))"""
        s"""WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            sub AS (
              SELECT vec_id, t.j,
                     list_slice(e, t.j * 16 + 1, t.j * 16 + 16) AS sv
              FROM v, UNNEST([0, 1, 2, 3]) AS t(j)),
            init AS (SELECT vec_id AS cid FROM v
                     ORDER BY ((vec_id % 1000000007) * 2654435761 + 526539)
                              % 9973, vec_id
                     LIMIT 8),
            cb0 AS (SELECT s.j, s.vec_id AS cid, s.sv AS cv
                    FROM sub s JOIN init ON s.vec_id = init.cid),
            a1 AS (SELECT vec_id, j, cid FROM (
                     SELECT s.vec_id, s.j, c.cid,
                            row_number() OVER (PARTITION BY s.vec_id, s.j
                              ORDER BY round(${sq("s.sv", "c.cv")}, 6), c.cid)
                              AS rn
                     FROM sub s JOIN cb0 c ON s.j = c.j) WHERE rn = 1),
            cb1 AS (SELECT j, cid, list(mm ORDER BY dim) AS cv FROM (
                     SELECT a1.j, a1.cid, t.i AS dim,
                            round(avg(s.sv[t.i]), 6) AS mm
                     FROM a1 JOIN sub s
                       ON a1.vec_id = s.vec_id AND a1.j = s.j,
                       UNNEST(range(1, 17)) AS t(i)
                     GROUP BY 1, 2, 3)
                   GROUP BY 1, 2),
            codes AS (SELECT vec_id, j, cid FROM (
                     SELECT s.vec_id, s.j, c.cid,
                            row_number() OVER (PARTITION BY s.vec_id, s.j
                              ORDER BY round(${sq("s.sv", "c.cv")}, 6), c.cid)
                              AS rn
                     FROM sub s JOIN cb1 c ON s.j = c.j) WHERE rn = 1),
            qd AS (SELECT s.vec_id AS qid, c.j, c.cid,
                          round(${sq("s.sv", "c.cv")}, 6) AS d
                   FROM sub s JOIN cb1 c ON s.j = c.j
                   WHERE s.vec_id < 10),
            sc AS (SELECT qd.qid, codes.vec_id AS nid,
                          round(sum(qd.d), 6) AS dist
                   FROM codes JOIN qd
                     ON codes.j = qd.j AND codes.cid = qd.cid
                   WHERE codes.vec_id <> qd.qid
                   GROUP BY 1, 2)
            SELECT qid, nid, dist, rn FROM (
              SELECT *, CAST(row_number() OVER (
                PARTITION BY qid ORDER BY dist, nid) AS BIGINT) AS rn
              FROM sc)
            WHERE rn <= 5"""
      })),

    // IVF-PQ composed: coarse cells bound WHICH vectors a query scores,
    // PQ codes bound WHAT the scoring join carries. Oracle = the IVF
    // cell CTEs + the PQ train/encode/ADC CTEs, joined on (cell) then
    // (j, code) — every stage term-for-term identical.
    Q("q_embed_ivfpq_knn",
      (s, d) => Similarity.ivfPqKnn(Tables.embeddings(s, d), "vec_id",
        "embedding", dim = 64, col("vec_id") < 10,
        numCentroids = 16, nProbe = 4, m = 4, ksub = 8, k = 5),
      Some({
        def sq(a: String, b: String): String =
          s"""(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]))
               - 2 * list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
               + list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i])))"""
        s"""WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            cents AS (SELECT vec_id AS ccid, e AS ccv FROM v
                      ORDER BY ((vec_id % 1000000007) * 2654435761 + 283521)
                               % 9973, vec_id
                      LIMIT 16),
            cellc AS (SELECT vid, cell FROM (
                      SELECT v.vec_id AS vid, c.ccid AS cell,
                             row_number() OVER (PARTITION BY v.vec_id
                               ORDER BY ${duckCos("v.e", "c.ccv")} DESC, c.ccid)
                               AS crn
                      FROM v, cents c) WHERE crn <= 1),
            cellq AS (SELECT qid, cell FROM (
                      SELECT v.vec_id AS qid, c.ccid AS cell,
                             row_number() OVER (PARTITION BY v.vec_id
                               ORDER BY ${duckCos("v.e", "c.ccv")} DESC, c.ccid)
                               AS crn
                      FROM v, cents c WHERE v.vec_id < 10) WHERE crn <= 4),
            sub AS (
              SELECT vec_id, t.j,
                     list_slice(e, t.j * 16 + 1, t.j * 16 + 16) AS sv
              FROM v, UNNEST([0, 1, 2, 3]) AS t(j)),
            init AS (SELECT vec_id AS cid FROM v
                     ORDER BY ((vec_id % 1000000007) * 2654435761 + 526539)
                              % 9973, vec_id
                     LIMIT 8),
            cb0 AS (SELECT s.j, s.vec_id AS cid, s.sv AS cv
                    FROM sub s JOIN init ON s.vec_id = init.cid),
            a1 AS (SELECT vec_id, j, cid FROM (
                     SELECT s.vec_id, s.j, c.cid,
                            row_number() OVER (PARTITION BY s.vec_id, s.j
                              ORDER BY round(${sq("s.sv", "c.cv")}, 6), c.cid)
                              AS rn
                     FROM sub s JOIN cb0 c ON s.j = c.j) WHERE rn = 1),
            cb1 AS (SELECT j, cid, list(mm ORDER BY dim) AS cv FROM (
                     SELECT a1.j, a1.cid, t.i AS dim,
                            round(avg(s.sv[t.i]), 6) AS mm
                     FROM a1 JOIN sub s
                       ON a1.vec_id = s.vec_id AND a1.j = s.j,
                       UNNEST(range(1, 17)) AS t(i)
                     GROUP BY 1, 2, 3)
                   GROUP BY 1, 2),
            codes AS (SELECT vec_id, j, cid FROM (
                     SELECT s.vec_id, s.j, c.cid,
                            row_number() OVER (PARTITION BY s.vec_id, s.j
                              ORDER BY round(${sq("s.sv", "c.cv")}, 6), c.cid)
                              AS rn
                     FROM sub s JOIN cb1 c ON s.j = c.j) WHERE rn = 1),
            qd AS (SELECT s.vec_id AS qid, c.j, c.cid,
                          round(${sq("s.sv", "c.cv")}, 6) AS d
                   FROM sub s JOIN cb1 c ON s.j = c.j
                   WHERE s.vec_id < 10),
            cand AS (SELECT DISTINCT cellq.qid, cellc.vid
                     FROM cellq JOIN cellc USING (cell)
                     WHERE cellq.qid <> cellc.vid),
            sc AS (SELECT cand.qid, cand.vid AS nid,
                          round(sum(qd.d), 6) AS dist
                   FROM cand
                   JOIN codes ON codes.vec_id = cand.vid
                   JOIN qd ON qd.qid = cand.qid
                          AND qd.j = codes.j AND qd.cid = codes.cid
                   GROUP BY 1, 2)
            SELECT qid, nid, dist, rn FROM (
              SELECT *, CAST(row_number() OVER (
                PARTITION BY qid ORDER BY dist, nid) AS BIGINT) AS rn
              FROM sc)
            WHERE rn <= 5"""
      })),

    // residual IVF-PQ: same cell/codebook CTEs as q_embed_ivfpq_knn but
    // codebooks train on (vector − cell centroid) residuals, and the
    // query ADC table carries the probed-cell key (a query's residual
    // differs per cell). Subtraction is double-widened on both engines.
    Q("q_embed_ivfpq_res_knn",
      (s, d) => Similarity.ivfPqResidualKnn(Tables.embeddings(s, d), "vec_id",
        "embedding", dim = 64, col("vec_id") < 10,
        numCentroids = 16, nProbe = 4, m = 4, ksub = 8, k = 5),
      Some({
        def sq(a: String, b: String): String =
          s"""(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]))
               - 2 * list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
               + list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i])))"""
        s"""WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings),
            cents AS (SELECT vec_id AS ccid, e AS ccv FROM v
                      ORDER BY ((vec_id % 1000000007) * 2654435761 + 283521)
                               % 9973, vec_id
                      LIMIT 16),
            cellc AS (SELECT vid, cell FROM (
                      SELECT v.vec_id AS vid, c.ccid AS cell,
                             row_number() OVER (PARTITION BY v.vec_id
                               ORDER BY ${duckCos("v.e", "c.ccv")} DESC, c.ccid)
                               AS crn
                      FROM v, cents c) WHERE crn <= 1),
            cellq AS (SELECT qid, cell FROM (
                      SELECT v.vec_id AS qid, c.ccid AS cell,
                             row_number() OVER (PARTITION BY v.vec_id
                               ORDER BY ${duckCos("v.e", "c.ccv")} DESC, c.ccid)
                               AS crn
                      FROM v, cents c WHERE v.vec_id < 10) WHERE crn <= 4),
            resc AS (SELECT cellc.vid, cellc.cell,
                            list_transform(range(1, 65),
                              i -> v.e[i] - c.ccv[i]) AS rv
                     FROM cellc JOIN v ON v.vec_id = cellc.vid
                                JOIN cents c ON c.ccid = cellc.cell),
            sub AS (
              SELECT vid AS vec_id, t.j,
                     list_slice(rv, t.j * 16 + 1, t.j * 16 + 16) AS sv
              FROM resc, UNNEST([0, 1, 2, 3]) AS t(j)),
            init AS (SELECT vec_id AS cid FROM v
                     ORDER BY ((vec_id % 1000000007) * 2654435761 + 526539)
                              % 9973, vec_id
                     LIMIT 8),
            cb0 AS (SELECT s.j, s.vec_id AS cid, s.sv AS cv
                    FROM sub s JOIN init ON s.vec_id = init.cid),
            a1 AS (SELECT vec_id, j, cid FROM (
                     SELECT s.vec_id, s.j, c.cid,
                            row_number() OVER (PARTITION BY s.vec_id, s.j
                              ORDER BY round(${sq("s.sv", "c.cv")}, 6), c.cid)
                              AS rn
                     FROM sub s JOIN cb0 c ON s.j = c.j) WHERE rn = 1),
            cb1 AS (SELECT j, cid, list(mm ORDER BY dim) AS cv FROM (
                     SELECT a1.j, a1.cid, t.i AS dim,
                            round(avg(s.sv[t.i]), 6) AS mm
                     FROM a1 JOIN sub s
                       ON a1.vec_id = s.vec_id AND a1.j = s.j,
                       UNNEST(range(1, 17)) AS t(i)
                     GROUP BY 1, 2, 3)
                   GROUP BY 1, 2),
            codes AS (SELECT vec_id, j, cid FROM (
                     SELECT s.vec_id, s.j, c.cid,
                            row_number() OVER (PARTITION BY s.vec_id, s.j
                              ORDER BY round(${sq("s.sv", "c.cv")}, 6), c.cid)
                              AS rn
                     FROM sub s JOIN cb1 c ON s.j = c.j) WHERE rn = 1),
            qres AS (SELECT cellq.qid, cellq.cell,
                            list_transform(range(1, 65),
                              i -> v.e[i] - c.ccv[i]) AS rq
                     FROM cellq JOIN v ON v.vec_id = cellq.qid
                                JOIN cents c ON c.ccid = cellq.cell),
            qsub AS (
              SELECT qid, cell, t.j,
                     list_slice(rq, t.j * 16 + 1, t.j * 16 + 16) AS sv
              FROM qres, UNNEST([0, 1, 2, 3]) AS t(j)),
            qd AS (SELECT qsub.qid, qsub.cell, c.j, c.cid,
                          round(${sq("qsub.sv", "c.cv")}, 6) AS d
                   FROM qsub JOIN cb1 c ON qsub.j = c.j),
            cand AS (SELECT cellq.qid, cellc.vid, cellc.cell
                     FROM cellq JOIN cellc USING (cell)
                     WHERE cellq.qid <> cellc.vid),
            sc AS (SELECT cand.qid, cand.vid AS nid,
                          round(sum(qd.d), 6) AS dist
                   FROM cand
                   JOIN codes ON codes.vec_id = cand.vid
                   JOIN qd ON qd.qid = cand.qid AND qd.cell = cand.cell
                          AND qd.j = codes.j AND qd.cid = codes.cid
                   GROUP BY 1, 2)
            SELECT qid, nid, dist, rn FROM (
              SELECT *, CAST(row_number() OVER (
                PARTITION BY qid ORDER BY dist, nid) AS BIGINT) AS rn
              FROM sc)
            WHERE rn <= 5"""
      })),

    Q("q_embed_ivf_knn",
      (s, d) => Similarity.ivfKnn(Tables.embeddings(s, d), "vec_id", "embedding",
        col("vec_id") < 10, k = 5, numCentroids = 64, nProbe = 2),
      Some(s"""WITH v AS (
                 SELECT vec_id,
                        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings),
               cents AS (SELECT vec_id AS cid, e AS cv FROM v
                         ORDER BY ((vec_id % 1000000007) * 2654435761 + 283521) % 9973, vec_id
                         LIMIT 64),
               corpus AS (
                 SELECT nid, nv, cid FROM (
                   SELECT v.vec_id AS nid, v.e AS nv, c.cid,
                          row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY ${duckCos("v.e", "c.cv")} DESC, c.cid) AS crn
                   FROM v, cents c)
                 WHERE crn <= 1),
               queries AS (
                 SELECT qid, qv, cid FROM (
                   SELECT v.vec_id AS qid, v.e AS qv, c.cid,
                          row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY ${duckCos("v.e", "c.cv")} DESC, c.cid) AS crn
                   FROM v, cents c WHERE v.vec_id < 10)
                 WHERE crn <= 2),
               scored AS (
                 SELECT DISTINCT qid, nid, ${duckCos("qv", "nv")} AS cos
                 FROM queries JOIN corpus USING (cid) WHERE qid <> nid)
               SELECT qid, nid, cos, rn FROM (
                 SELECT *, CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rn
                 FROM scored)
               WHERE rn <= 5""")),

    // LSH-bucketed ANN — the Rademacher planes come from a portable
    // integer mixer (Similarity.planeSign), so DuckDB replays bucketing,
    // multi-probe, scoring and top-k end-to-end
    Q("q_embed_lsh_knn",
      (s, d) => Similarity.lshKnn(Tables.embeddings(s, d),
        "vec_id", "embedding", dim = 64, col("vec_id") < 10, k = 5, nPlanes = 4),
      Some(s"""WITH v AS (
                 SELECT vec_id,
                        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings),
               corpus AS (
                 SELECT vec_id AS nid, e AS nv, ${duckBucket("e", 4)} AS bucket
                 FROM v),
               qb AS (
                 SELECT vec_id AS qid, e AS qv, ${duckBucket("e", 4)} AS b0
                 FROM v WHERE vec_id < 10),
               queries AS (
                 SELECT qid, qv, xor(b0, flip) AS bucket
                 FROM qb CROSS JOIN (VALUES (0), (1), (2), (4), (8)) f(flip)),
               scored AS (
                 SELECT DISTINCT qid, nid, ${duckCos("qv", "nv")} AS cos
                 FROM queries JOIN corpus USING (bucket) WHERE qid <> nid)
               SELECT qid, nid, cos, rn FROM (
                 SELECT *, CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY cos DESC, nid) AS BIGINT) AS rn
                 FROM scored)
               WHERE rn <= 5""")),

    // semantic decontamination: flag training vectors within cosine
    // >= tau of any eval vector — cross-set-only LSH candidates
    // (eval x train, never train x train), the tiny multi-probed eval
    // side broadcasts, the training corpus never shuffles
    // (PlanShapeSpec-pinned); oracle replays the bucketing exactly
    Q("q_embed_decontaminate",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.semanticDecontaminate(
          emb.where(col("vec_id") >= 50), emb.where(col("vec_id") < 50),
          "vec_id", "embedding", dim = 64, tau = 0.35, nPlanes = 4)
      },
      Some(s"""WITH v AS (
                 SELECT vec_id,
                        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings),
               train AS (
                 SELECT vec_id AS tid, e AS tv, ${duckBucket("e", 4)} AS bucket
                 FROM v WHERE vec_id >= 50),
               eb AS (
                 SELECT vec_id AS eid, e AS ev, ${duckBucket("e", 4)} AS b0
                 FROM v WHERE vec_id < 50),
               probes AS (
                 SELECT eid, ev, xor(b0, flip) AS bucket
                 FROM eb CROSS JOIN (VALUES (0), (1), (2), (4), (8)) f(flip)),
               pairs AS (
                 SELECT DISTINCT tid, eid, cos FROM (
                   SELECT tid, eid, ${duckCos("tv", "ev")} AS cos
                   FROM probes JOIN train USING (bucket))
                 WHERE cos >= 0.35)
               SELECT tid AS vec_id,
                      CAST(count(*) AS BIGINT) AS n_hits,
                      max(cos) AS max_cos
               FROM pairs GROUP BY tid""")),

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
              FROM documents"""))
  )
}
