package graft.multimodal

import graft.Q

/** Multimodal plumbing, oracle-checked where DuckDB can replay the byte
  * math on the same payloads (text bytes ≡ blob). */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // metadata-only projection: binary column pruned from the scan
    Q("q_media_meta",
      (s, d) => Multimodal.mediaMeta(Multimodal.mediaTable(s, d)),
      Some("""SELECT doc_id AS media_id,
                     ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
                     octet_length(encode(text)) AS n_bytes,
                     source AS origin
              FROM documents""")),

    // fixed-size frame slicing + every-4th sampling; md5 per frame proves
    // byte-identical slicing across engines
    Q("q_frame_sample",
      (s, d) => Multimodal.frameSample(Multimodal.mediaTable(s, d),
        frameBytes = 64, every = 4),
      // payloads are the UTF-8 bytes of ASCII text, so VARCHAR substring
      // slices the same bytes DuckDB's blob would (blob substring isn't
      // supported); md5(varchar) hashes its UTF-8 encoding
      Some("""WITH m AS (
                SELECT doc_id AS media_id, text,
                       octet_length(encode(text)) AS n_bytes
                FROM documents),
              f AS (
                SELECT media_id, text,
                       unnest(range(0, CAST(ceil(n_bytes / 64.0) AS BIGINT))) AS frame_idx
                FROM m)
              SELECT media_id, frame_idx,
                     md5(substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64))
                       AS frame_md5
              FROM f WHERE frame_idx % 4 = 0""")),

    // stubbed decode + feature extraction via mapPartitions — byte
    // histogram replayable in SQL? kept rows-only (validated in spec)
    Q("q_decode_features",
      (s, d) => Multimodal.decodeFeatures(Multimodal.mediaTable(s, d)),
      None)
  )
}
