package graft.streaming

import graft.Q

/** Streaming capabilities, each drained to a final table so the batch
  * DuckDB oracle can check streaming semantics exactly. ts arrives as
  * nanoseconds in DuckDB but microseconds in Spark, so oracles CAST to
  * (microsecond) TIMESTAMP wherever raw event times are emitted. */
object StreamingQueries {

  val all: Seq[Q] = Seq(

    // tumbling window + watermark ≡ batch date_trunc aggregation
    Q("q_stream_hourly",
      (s, d) => Streams.hourlyCounts(s, d),
      Some("""SELECT date_trunc('hour', ts) AS h, event_type,
                     count(*) AS n, round(sum(value), 2) AS total
              FROM events GROUP BY 1, 2""")),

    // session windows (30-minute gap) ≡ lag/gap sessionization
    Q("q_stream_sessions",
      (s, d) => Streams.sessions(s, d),
      Some("""WITH x AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                       CASE WHEN CAST(ts AS TIMESTAMP)
                              - lag(CAST(ts AS TIMESTAMP))
                                OVER (PARTITION BY user_id ORDER BY ts)
                              >= INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events),
              s AS (
                SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS sid
                FROM x)
              SELECT min(ts) AS session_start, user_id,
                     count(*) AS n_events, round(sum(value), 2) AS total
              FROM s GROUP BY user_id, sid""")),

    // stream-stream interval join ≡ batch range self-join
    Q("q_stream_interval_join",
      (s, d) => Streams.streamIntervalJoin(s, d),
      Some("""SELECT p.user_id AS user_id,
                     CAST(s.ts AS TIMESTAMP) AS signup_ts,
                     CAST(p.ts AS TIMESTAMP) AS purchase_ts,
                     p.value AS value
              FROM events p JOIN events s
                ON p.user_id = s.user_id
               AND p.event_type = 'purchase' AND s.event_type = 'signup'
               AND CAST(p.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
               AND CAST(p.ts AS TIMESTAMP) <= CAST(s.ts AS TIMESTAMP) + INTERVAL 1 HOUR""")),

    // watermarked streaming dedup ≡ batch DISTINCT
    Q("q_stream_dedup",
      (s, d) => Streams.streamDedup(s, d, Seq("user_id", "event_type")),
      Some("SELECT DISTINCT user_id, event_type FROM events")),

    // mixer-gated sampling per micro-batch (stateless) ≡ the batch gate:
    // stream and backfill agree on membership row for row
    Q("q_stream_sample",
      (s, d) => Streams.streamSample(s, d, fraction = 0.1),
      Some("""SELECT event_id, user_id, event_type FROM events
              WHERE ((event_id % 1000000007) * 2654435761 + 283521) % 9973
                    < 997""")),

    // stream-static broadcast enrichment ≡ batch dimension join
    Q("q_stream_enrich",
      (s, d) => Streams.enrich(s, d),
      Some("""SELECT event_id, user_id, c_mktsegment, c_nationkey, value
              FROM events JOIN customer ON user_id = c_custkey""")),

    // arbitrary keyed state (mapGroupsWithState) ≡ per-user lifetime aggs
    Q("q_stream_user_state",
      (s, d) => Streams.userState(s, d),
      Some("""SELECT user_id, count(*) AS n_events,
                     CAST(min(ts) AS TIMESTAMP) AS first_seen,
                     round(sum(value), 2) AS total_value
              FROM events GROUP BY user_id""")),

    // count-min sketch maintained incrementally over a documents stream
    // — the aggregation state IS the depth×width sketch; final state ≡
    // the batch sketch over the same corpus (exact: the sketch is a
    // deterministic function of the token multiset)
    Q("q_stream_cms",
      (s, d) => Streams.streamCms(s, d, depth = 4, width = 1024, seed = 11L),
      Some(s"""WITH words AS (
                 SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> length(x) > 0)) AS w
                 FROM documents),
               wh AS MATERIALIZED (
                 SELECT w, ${graft.llm.LlmQueries.duckWordHash("w")} AS h
                 FROM words),
               dd AS (SELECT unnest(range(0, 4)) AS i)
               SELECT i,
                      CAST(((h * 2654435761 + (11 + i) * 40503) % 1000000007)
                        % 1024 AS BIGINT) AS bucket,
                      CAST(count(*) AS BIGINT) AS c
               FROM wh CROSS JOIN dd GROUP BY 1, 2""")),

    // Bloom-prefiltered exact incremental dedup ON a stream: the 20%
    // mixer slice arrives as the live crawl, the corpus Bloom rides each
    // micro-batch as a constant predicate, bloom-positives weed through
    // a stream-static anti join, dropDuplicates state = the exact digest
    // set. Output (one row per admitted fingerprint) is bloom-invariant
    // AND arrival-order-invariant, so the oracle is plain set
    // difference — the q_bloom_prefilter discipline, streamed.
    Q("q_stream_incremental_dedup",
      (s, d) => Streams.streamIncrementalDedup(s, d),
      Some("""WITH f0 AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                       ((doc_id % 1000000007) * 2654435761 + 283521) % 9973 < 1994
                         AS in_sample
                FROM documents)
              SELECT DISTINCT fp FROM f0
              WHERE in_sample
                AND fp NOT IN (SELECT fp FROM f0 WHERE NOT in_sample)""")),

    // model-based quality scoring ON the crawl stream: the stateless
    // hashed-linear projection per micro-batch ≡ the batch score over
    // the same corpus (q_linear_score's oracle, verbatim)
    Q("q_stream_linear_score",
      (s, d) => Streams.streamLinearScore(s, d,
        graft.llm.TextAnalysis.mixerWeights(64)),
      Some(s"""WITH w AS (SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                       x -> length(x) > 0) AS ws
                   FROM documents),
               wt AS (SELECT list_transform(range(0, 64), i ->
                        CAST((i * 2654435761 + 40503) % 9973 AS DOUBLE)
                          / 9973.0 - 0.5) AS wv),
               pw AS (SELECT doc_id, len(ws) AS n_words,
                        list_sum(list_transform(ws, x ->
                          wv[CAST(${graft.llm.LlmQueries.duckWordHash("x")}
                             % 64 AS BIGINT) + 1])) AS s
                      FROM w CROSS JOIN wt)
               SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                      round(0.0 + CASE WHEN n_words > 0
                                       THEN s / n_words
                                       ELSE 0.0 END, 6) AS score
               FROM pw""")),

    // blocklist gating ON the crawl stream (r10): the stateless
    // blocklist projection per micro-batch ≡ the batch audit over the
    // same corpus — q_blocklist's oracle, verbatim (same phrase list)
    // IVF INGEST routing on the embedding stream (r11): each arriving
    // vector lands in its nearest coarse cell — the ANN layout's write
    // path at stream time. The batch-trained quantizer's k rows ride as
    // literals and the argmax is a stateless greatest()-over-structs
    // projection (windows are illegal on append streams); the oracle
    // replays the batch cell assignment, whose (cos desc, cid asc)
    // tiebreak the struct ordering reproduces exactly.
    Q("q_stream_embed_route",
      (s, d) => Streams.streamEmbedRoute(s, d, numCentroids = 16),
      Some(s"""WITH v AS (
                 SELECT vec_id,
                        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                 FROM embeddings),
               cents AS (SELECT vec_id AS cid, e AS cv FROM v
                         ORDER BY ((vec_id % 1000000007) * 2654435761
                                   + 283521) % 9973, vec_id
                         LIMIT 16)
               SELECT vec_id, cell FROM (
                 SELECT v.vec_id, c.cid AS cell,
                        row_number() OVER (PARTITION BY v.vec_id
                          ORDER BY ${graft.llm.LlmQueries.duckCos("v.e", "c.cv")}
                            DESC, c.cid) AS crn
                 FROM v, cents c) WHERE crn <= 1""")),

    // int8 quantization on the embedding stream (r11): the SQ8 storage
    // compression of an ingest pipeline as a stateless per-batch
    // projection — q_embed_int8's oracle, verbatim (shared builder)
    Q("q_stream_int8",
      (s, d) => Streams.streamInt8(s, d),
      Some(graft.llm.SimilarityQueries.int8Sql)),

    // domain classification on the crawl stream (r11): the mixture-
    // bucketing head at ingest time — stateless projection,
    // q_domain_classify's oracle via the shared CTE builder
    Q("q_stream_domain",
      (s, d) => Streams.streamDomain(s, d),
      Some(s"""WITH ${graft.llm.TextAnalysisQueries.domainCtes}
               SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                      CAST(c AS BIGINT) AS domain, score
               FROM dm""")),

    Q("q_stream_blocklist",
      (s, d) => Streams.streamBlocklist(s, d,
        Seq("slow", "big table", "fast merge")),
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

    // streaming ordered-step funnel: per-key three-long state cursor in
    // mapGroupsWithState; exact vs the batch funnel's chained-min oracle
    // (same SQL as q_funnel) when arrival is event-time-monotone per key
    Q("q_stream_funnel",
      (s, d) => Streams.streamFunnel(s, d, Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (SELECT user_id, min(epoch(CAST(ts AS TIMESTAMP))) AS t
                          FROM events WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT e.user_id, min(epoch(CAST(e.ts AS TIMESTAMP))) AS t
                     FROM events e JOIN s1 ON e.user_id = s1.user_id
                       AND epoch(CAST(e.ts AS TIMESTAMP)) > s1.t
                     WHERE e.event_type = 'click' GROUP BY 1),
              s3 AS (SELECT e.user_id, min(epoch(CAST(e.ts AS TIMESTAMP))) AS t
                     FROM events e JOIN s2 ON e.user_id = s2.user_id
                       AND epoch(CAST(e.ts AS TIMESTAMP)) > s2.t
                     WHERE e.event_type = 'purchase' GROUP BY 1)
              SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
                     count(*) AS users FROM s1
              UNION ALL SELECT 2, 'click', count(*) FROM s2
              UNION ALL SELECT 3, 'purchase', count(*) FROM s3""")),

    // streaming transition matrix: last-(time,type) state per key emits
    // append-mode (from,to) rows; counts + probabilities close after the
    // drain — same oracle as the batch q_event_transitions
    Q("q_stream_transitions",
      (s, d) => Streams.streamTransitions(s, d),
      Some("""WITH t AS (
                SELECT event_type AS from_type,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS to_type
                FROM events),
              c AS (SELECT from_type, to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
              SELECT from_type, to_type, n,
                     round(CAST(n AS DOUBLE) /
                       CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE),
                       6) AS p
              FROM c""")),

    // streaming retention twin: exact distinct (user, bucket) activity
    // via an unwatermarked dropDuplicates stream; the cohort math closes
    // over the drained pairs — same oracle as the batch q_retention
    Q("q_stream_retention",
      (s, d) => Streams.streamRetention(s, d),
      Some("""WITH f AS (SELECT user_id,
                     CAST(floor(epoch(min(CAST(ts AS TIMESTAMP))) / 604800)
                       AS BIGINT) AS cohort
                     FROM events GROUP BY 1),
              a AS (SELECT DISTINCT user_id,
                     CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800)
                       AS BIGINT) AS wk
                    FROM events),
              c AS (SELECT f.cohort, a.wk - f.cohort AS week_offset,
                           count(DISTINCT f.user_id) AS active_users
                    FROM f JOIN a ON f.user_id = a.user_id
                    GROUP BY 1, 2)
              SELECT cohort, week_offset, active_users,
                     round(active_users * 1.0 /
                       max(CASE WHEN week_offset = 0 THEN active_users END)
                         OVER (PARTITION BY cohort), 4) AS retention_pct
              FROM c""")),

    // streaming anomaly twin: watermarked complete-mode hourly counts;
    // the z-score half closes over the drained final counts — exact,
    // same oracle as the batch q_event_anomaly
    Q("q_stream_anomaly",
      (s, d) => Streams.streamAnomaly(s, d)
        .withColumnRenamed("key", "event_type"),
      Some("""WITH c AS (SELECT event_type, date_trunc('hour', ts) AS h,
                     CAST(count(*) AS BIGINT) AS n
                     FROM events GROUP BY 1, 2),
              st AS (SELECT event_type,
                       CAST(count(*) AS BIGINT) AS nb,
                       CAST(sum(n) AS BIGINT) AS s,
                       CAST(sum(n * n) AS BIGINT) AS ss
                     FROM c GROUP BY 1)
              SELECT c.event_type, c.h, c.n,
                     CASE WHEN CAST(ss AS DOUBLE) / nb
                               - (CAST(s AS DOUBLE) / nb)
                               * (CAST(s AS DOUBLE) / nb) > 0
                       THEN round((c.n - CAST(s AS DOUBLE) / nb)
                              / sqrt(CAST(ss AS DOUBLE) / nb
                                - (CAST(s AS DOUBLE) / nb)
                                * (CAST(s AS DOUBLE) / nb)), 4)
                     END AS z,
                     CAST(CASE WHEN CAST(ss AS DOUBLE) / nb
                                    - (CAST(s AS DOUBLE) / nb)
                                    * (CAST(s AS DOUBLE) / nb) > 0
                                AND abs((c.n - CAST(s AS DOUBLE) / nb)
                                  / sqrt(CAST(ss AS DOUBLE) / nb
                                    - (CAST(s AS DOUBLE) / nb)
                                    * (CAST(s AS DOUBLE) / nb))) > 3.0
                       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
              FROM c JOIN st USING (event_type)"""))
  )
}
