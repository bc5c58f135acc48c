package graft.multimodal

import graft.Q

/** IMAGE CROP detection queries — the row grid (vertical crops) and
  * the 2D block grid (horizontal/general crops), both riding the
  * temporal-index machinery over decoded rasters (split out of
  * [[MultimodalQueries]] in round 17; same registry contract). Exact
  * and perceptual legs, crawl gates, and the stored twins. */
object ImageCropQueries {

  private val live: Seq[Q] = Seq(

    // IMAGE CROP detection — the image cell of the shift-tolerant
    // matrix: a vertical crop (banner added or stripped — the
    // meme-repost edit) moves the whole-image dHash but leaves the
    // surviving raster ROWS matching the original's at one consistent
    // vertical offset. Rows are the grid the 16-px-wide raster gives
    // for free (48 bytes each, rasters are whole rows by the codec
    // contract), so this is clipPairsFromFrames over imageRowsFp rows
    // — the third modality riding the same machinery. Fixture: the
    // exact crop (+4M, rows 1–4) caught at shift +1; the +1-brightness
    // crop (+5M) correctly invisible to this byte-exact leg.
    Q("q_image_crop_detect",
      (s, d) => Multimodal.clipPairsFromFrames(
        Multimodal.imageRowsFp(
          Multimodal.imageTable(s, d)
            .unionByName(Multimodal.imageCropTable(s, d))),
        minFrames = 2, materializeFrames = true),
      Some(imageRowCte(corpusOnlyStop = false, perceptual = false) +
        """SELECT a.media_id AS da, b.media_id AS db,
                     CAST(a.seg - b.seg AS BIGINT) AS shift,
                     CAST(count(*) AS BIGINT) AS matched_frames
              FROM skx a JOIN skx b
                ON a.k = b.k AND a.media_id < b.media_id
              GROUP BY 1, 2, 3 HAVING count(*) >= 2""")),

    // the crop CRAWL GATE: both crop regimes arrive fresh against the
    // corpus-only stored row index — VideoIndex.clipAgainst verbatim
    // (the temporal index's third modality); only the exact crop
    // matches.
    Q("q_image_crop_against",
      (s, d) => graft.sources.VideoIndex.clipAgainst(s,
        graft.sources.VideoIndex.ensureBuiltImageRowsCorpus(s, d),
        Multimodal.imageRowsFp(Multimodal.imageCropTable(s, d)),
        minFrames = 2),
      Some(imageRowCte(corpusOnlyStop = true, perceptual = false) +
        """SELECT b.media_id AS fid, a.media_id AS cid,
                     CAST(a.seg - b.seg AS BIGINT) AS shift,
                     CAST(count(*) AS BIGINT) AS matched_frames
              FROM skx a JOIN skx b ON a.k = b.k
               AND a.media_id < 4000000 AND b.media_id >= 4000000
              GROUP BY 1, 2, 3 HAVING count(*) >= 2""")),

    // BRIGHTNESS-TOLERANT crop detection — the perceptual leg: the
    // +1-brightness crop's every byte differs (md5 leg blind), but the
    // row gradient fingerprint is EXACTLY invariant (comparisons and
    // the integer row mean all shift by 1 together), so the row-level
    // banding + Hamming verify + shift grouping catches it at
    // distance 0 at the same vertical offset.
    Q("q_image_crop_perceptual",
      (s, d) => Multimodal.clipPerceptualFromFrames(
        Multimodal.imageRowsFp(
          Multimodal.imageTable(s, d)
            .unionByName(Multimodal.imageCropTable(s, d))),
        maxDist = 6, minFrames = 2),
      Some(imageRowCte(corpusOnlyStop = false, perceptual = true) +
        """cand AS (
                SELECT DISTINCT a.media_id AS da, b.media_id AS db,
                       a.seg AS fa, b.seg AS fb
                FROM bandx a JOIN bandx b
                  ON a.bi = b.bi AND a.bv = b.bv
                 AND a.media_id < b.media_id
                WHERE NOT EXISTS (SELECT 1 FROM bstop s
                                  WHERE s.bi = a.bi AND s.bv = a.bv)),
              pm AS (
                SELECT c.da, c.db, c.fa, c.fb
                FROM cand c
                JOIN afp a ON a.media_id = c.da AND a.seg = c.fa
                JOIN afp b ON b.media_id = c.db AND b.seg = c.fb
                WHERE bit_count(xor(a.lo, b.lo))
                    + bit_count(xor(a.hi, b.hi)) <= 6)
              SELECT da, db, CAST(fa - fb AS BIGINT) AS shift,
                     CAST(count(*) AS BIGINT) AS matched_frames
              FROM pm GROUP BY 1, 2, 3 HAVING count(*) >= 2""")),

    // the perceptual crop GATE — both regimes caught (exact at
    // distance 0, brightness at distance 0 through the invariant
    // fingerprint): the admission decision the byte-exact gate gets
    // wrong for a re-brightened crop of stored material.
    Q("q_image_crop_perceptual_against",
      (s, d) => graft.sources.VideoIndex.clipPerceptualAgainst(s,
        graft.sources.VideoIndex.ensureBuiltImageRowsCorpus(s, d),
        Multimodal.imageRowsFp(Multimodal.imageCropTable(s, d)),
        maxDist = 6, minFrames = 2),
      Some(imageRowCte(corpusOnlyStop = true, perceptual = true) +
        """cand AS (
                SELECT DISTINCT b.media_id AS fid, a.media_id AS cid,
                       a.seg AS fa, b.seg AS fb
                FROM bandx a JOIN bandx b
                  ON a.bi = b.bi AND a.bv = b.bv
                 AND a.media_id < 4000000 AND b.media_id >= 4000000
                WHERE NOT EXISTS (SELECT 1 FROM bstop s
                                  WHERE s.bi = a.bi AND s.bv = a.bv)),
              pm AS (
                SELECT c.fid, c.cid, c.fa, c.fb
                FROM cand c
                JOIN afp a ON a.media_id = c.cid AND a.seg = c.fa
                JOIN afp b ON b.media_id = c.fid AND b.seg = c.fb
                WHERE bit_count(xor(a.lo, b.lo))
                    + bit_count(xor(a.hi, b.hi)) <= 6)
              SELECT fid, cid, CAST(fa - fb AS BIGINT) AS shift,
                     CAST(count(*) AS BIGINT) AS matched_frames
              FROM pm GROUP BY 1, 2, 3 HAVING count(*) >= 2""")),

    // 2D (HORIZONTAL/general) crop detection — the regime the row grid
    // documents as out of scope: a horizontal crop reflows every
    // raster row, so imageRowsFp fingerprints garbage, but 8×1-px
    // BLOCKS survive block-aligned crops byte-for-byte at ONE
    // consistent (row, col) offset. The packed `row·2^20 + col` index
    // makes that 2-vector a single subtraction, so
    // clipPairsFromFrames — and the whole temporal-index family —
    // serve it unchanged. Fixture: the right-half crop of rows 1–4
    // (+6M ids, honest 8-px-wide PNG) found at packed shift 2^20 + 1
    // (+1 row, +1 col), with 4 matched blocks; ImageCrop2dSpec pins
    // the row grid's blindness to the same twin. All-zero blocks
    // (indistinguishable from raster padding) are dropped on both
    // sides — the structural analog of the stop discipline.
    Q("q_image_crop2d_detect",
      (s, d) => Multimodal.clipPairsFromFrames(
        Multimodal.imageBlocksFp(
          Multimodal.imageTable(s, d)
            .unionByName(Multimodal.imageCrop2dTable(s, d))),
        minFrames = 2, materializeFrames = true),
      Some(imageBlockCte(corpusOnlyStop = false) +
        """SELECT a.media_id AS da, b.media_id AS db,
                     CAST(a.seg - b.seg AS BIGINT) AS shift,
                     CAST(count(*) AS BIGINT) AS matched_frames
              FROM skx a JOIN skx b
                ON a.k = b.k AND a.media_id < b.media_id
              GROUP BY 1, 2, 3 HAVING count(*) >= 2""")),

    // the 2D-crop CRAWL GATE: the crop twin arrives fresh against the
    // corpus-only stored BLOCK index — VideoIndex.clipAgainst verbatim
    // (fresh blocks broadcast, anti-joined on the _stop sidecar;
    // stored side map-side on the self-verifying block digest; one
    // match-bounded (fid, cid, packed shift) exchange).
    Q("q_image_crop2d_against",
      (s, d) => graft.sources.VideoIndex.clipAgainst(s,
        graft.sources.VideoIndex.ensureBuiltImageBlocksCorpus(s, d),
        Multimodal.imageBlocksFp(Multimodal.imageCrop2dTable(s, d)),
        minFrames = 2),
      Some(imageBlockCte(corpusOnlyStop = true) +
        """SELECT b.media_id AS fid, a.media_id AS cid,
                     CAST(a.seg - b.seg AS BIGINT) AS shift,
                     CAST(count(*) AS BIGINT) AS matched_frames
              FROM skx a JOIN skx b ON a.k = b.k
               AND a.media_id < 6000000 AND b.media_id >= 6000000
              GROUP BY 1, 2, 3 HAVING count(*) >= 2""")),

    // BRIGHTNESS-TOLERANT 2D crop detection — the perceptual leg of
    // the block grid: the +1-brightness crop's every block md5 differs
    // (exact leg blind) but the per-block gradient fingerprint is
    // exactly +1-invariant, so the position-free band join + inline
    // Hamming verify + packed-shift grouping catches it at distance 0
    // at the same (row, col) offset as the exact crop.
    Q("q_image_crop2d_perceptual",
      (s, d) => Multimodal.clipPerceptualFromFrames(
        Multimodal.imageBlocksFp(
          Multimodal.imageTable(s, d)
            .unionByName(Multimodal.imageCrop2dTable(s, d))),
        maxDist = 6, minFrames = 2),
      Some(imageBlockCte(corpusOnlyStop = false, perceptual = true) +
        """cand AS (
                SELECT DISTINCT a.media_id AS da, b.media_id AS db,
                       a.seg AS fa, b.seg AS fb
                FROM bandx a JOIN bandx b
                  ON a.bi = b.bi AND a.bv = b.bv
                 AND a.media_id < b.media_id
                WHERE NOT EXISTS (SELECT 1 FROM bstop s
                                  WHERE s.bi = a.bi AND s.bv = a.bv)),
              pm AS (
                SELECT c.da, c.db, c.fa, c.fb
                FROM cand c
                JOIN afp a ON a.media_id = c.da AND a.seg = c.fa
                JOIN afp b ON b.media_id = c.db AND b.seg = c.fb
                WHERE bit_count(xor(a.lo, b.lo))
                    + bit_count(xor(a.hi, b.hi)) <= 6)
              SELECT da, db, CAST(fa - fb AS BIGINT) AS shift,
                     CAST(count(*) AS BIGINT) AS matched_frames
              FROM pm GROUP BY 1, 2, 3 HAVING count(*) >= 2""")),

    // the perceptual 2D-crop GATE — both crop regimes arrive fresh and
    // BOTH are caught (exact at distance 0, brightness at distance 0
    // through the invariant fingerprint): clipPerceptualAgainst on the
    // corpus-only block index.
    Q("q_image_crop2d_perceptual_against",
      (s, d) => graft.sources.VideoIndex.clipPerceptualAgainst(s,
        graft.sources.VideoIndex.ensureBuiltImageBlocksCorpus(s, d),
        Multimodal.imageBlocksFp(Multimodal.imageCrop2dTable(s, d)),
        maxDist = 6, minFrames = 2),
      Some(imageBlockCte(corpusOnlyStop = true, perceptual = true) +
        """cand AS (
                SELECT DISTINCT b.media_id AS fid, a.media_id AS cid,
                       a.seg AS fa, b.seg AS fb
                FROM bandx a JOIN bandx b
                  ON a.bi = b.bi AND a.bv = b.bv
                 AND a.media_id < 6000000 AND b.media_id >= 6000000
                WHERE NOT EXISTS (SELECT 1 FROM bstop s
                                  WHERE s.bi = a.bi AND s.bv = a.bv)),
              pm AS (
                SELECT c.fid, c.cid, c.fa, c.fb
                FROM cand c
                JOIN afp a ON a.media_id = c.cid AND a.seg = c.fa
                JOIN afp b ON b.media_id = c.fid AND b.seg = c.fb
                WHERE bit_count(xor(a.lo, b.lo))
                    + bit_count(xor(a.hi, b.hi)) <= 6)
              SELECT fid, cid, CAST(fa - fb AS BIGINT) AS shift,
                     CAST(count(*) AS BIGINT) AS matched_frames
              FROM pm GROUP BY 1, 2, 3 HAVING count(*) >= 2""")),
  )

  /** The raster-ROW replay shared by the image CROP oracles: corpus ∪
    * the two-regime crop twin (exact +4M, +1-brightness +5M — raster
    * rows 1–4 = payload bytes [48, 240) = hex chars [97, 480] of the
    * % 4 = 1 docs with ≥ 6 full rows), 48-byte rows over the
    * zero-PADDED raster (encodePng's contract: decoded rasters are
    * whole rows), brightness applied in-SQL on hex-derived bytes
    * (crop payloads carry no padding, so +1 applies to every byte,
    * exactly as the engine brightens before encoding). Same emission
    * contract as [[audioSegCte]] (`sk.k` hex keys, optional
    * `afp`/`bandx`/`bstop` fingerprint CTEs), with the fb = 48
    * frameFpBits replay: NO wraparound in the consecutive-byte bits
    * (position 32 exists in a 48-byte row) and the mean over all 48
    * bytes. */
  private def imageRowCte(corpusOnlyStop: Boolean,
      perceptual: Boolean): String = {
    val scope = if (corpusOnlyStop) "WHERE media_id < 4000000" else ""
    val base = s"""WITH m AS (
                SELECT doc_id AS media_id, 0 AS bright,
                       hex(encode(text)) AS h,
                       octet_length(encode(text)) AS n
                FROM documents
                UNION ALL
                SELECT doc_id + 4000000, 0,
                       substring(hex(encode(text)), 97, 384), 192
                FROM documents
                WHERE doc_id % 4 = 1 AND octet_length(encode(text)) >= 288
                UNION ALL
                SELECT doc_id + 5000000, 1,
                       substring(hex(encode(text)), 97, 384), 192
                FROM documents
                WHERE doc_id % 4 = 1 AND octet_length(encode(text)) >= 288),
              pos AS (
                SELECT media_id, bright, h, n,
                       unnest(range(1, 48 * greatest(1,
                         CAST(ceil(n / 48.0) AS BIGINT)) + 1)) AS i
                FROM m),
              sb AS (
                SELECT media_id, (i - 1) // 48 AS seg, (i - 1) % 48 AS j,
                       CASE WHEN i > n THEN 0 ELSE
                         (16 * (strpos('0123456789ABCDEF',
                                 substring(h, CAST(2*i-1 AS BIGINT), 1)) - 1)
                           + (strpos('0123456789ABCDEF',
                                 substring(h, CAST(2*i AS BIGINT), 1)) - 1)
                           + bright) % 256
                       END AS byte
                FROM pos),
              sk AS (
                SELECT media_id, seg,
                       string_agg(
                         substring('0123456789abcdef', byte // 16 + 1, 1)
                         || substring('0123456789abcdef', byte % 16 + 1, 1),
                         '' ORDER BY j) AS k
                FROM sb GROUP BY 1, 2),
              stop AS (
                SELECT k FROM sk $scope
                GROUP BY 1 HAVING count(DISTINCT media_id) > 10000),
              skx AS (
                SELECT media_id, seg, k FROM sk
                WHERE NOT EXISTS (SELECT 1 FROM stop s WHERE s.k = sk.k))
              """
    val fp = s""", mn AS (
                SELECT media_id, seg, sum(byte) // 48 AS mean
                FROM sb GROUP BY 1, 2),
              glo AS (
                SELECT a.media_id, a.seg,
                       CAST(sum(CASE WHEN b.byte > a.byte
                         THEN (CAST(1 AS BIGINT) << CAST(a.j AS INT))
                         ELSE 0 END) AS BIGINT) AS lo
                FROM sb a JOIN sb b
                  ON a.media_id = b.media_id AND a.seg = b.seg
                 AND b.j = a.j + 1
                WHERE a.j < 32
                GROUP BY 1, 2),
              ghi AS (
                SELECT sb.media_id, sb.seg,
                       CAST(sum(CASE WHEN sb.byte > mn.mean
                         THEN (CAST(1 AS BIGINT) << CAST(sb.j AS INT))
                         ELSE 0 END) AS BIGINT) AS hi
                FROM sb JOIN mn
                  ON sb.media_id = mn.media_id AND sb.seg = mn.seg
                WHERE sb.j < 32
                GROUP BY 1, 2),
              afp AS (
                SELECT glo.media_id, glo.seg, glo.lo, ghi.hi
                FROM glo JOIN ghi
                  ON glo.media_id = ghi.media_id AND glo.seg = ghi.seg),
              bandx AS (
                SELECT media_id, seg, 0 AS bi, lo % 65536 AS bv FROM afp
                UNION ALL
                SELECT media_id, seg, 1, lo // 65536 FROM afp
                UNION ALL
                SELECT media_id, seg, 2, hi % 65536 FROM afp
                UNION ALL
                SELECT media_id, seg, 3, hi // 65536 FROM afp),
              bstop AS (
                SELECT bi, bv FROM bandx $scope
                GROUP BY 1, 2 HAVING count(DISTINCT media_id) > 10000),
              """
    if (perceptual) base + fp else base
  }

  /** The 2D BLOCK-grid replay (q_image_crop2d_*): every image tiles
    * into 8×1-px blocks (24 bytes, contiguous per row) AT ITS OWN row
    * pitch `rb` — the corpus decodes at the 16-px contract (rb = 48,
    * two block columns), the crop twin at its honest 8-px width
    * (rb = 24, one column). `seg` is the packed row·2^20 + col index
    * the live imageBlocksFp emits, `k` the block's bytes as hex
    * (byte equality ≡ the engine's md5 equality). All-zero blocks drop
    * in `skz` (raster-padding indistinguishable — the live side's
    * structural rule), then the stop-df discipline replays over the
    * survivors.
    *
    * TWIN-OFFSET CONTRACT (r15 ADVICE): the +1M…+8M twin id offsets
    * across this file, and the matching `media_id <threshold>`
    * corpus/fresh splits in the gate oracles, assume the corpus id
    * space stays below 1,000,000 — true of every registered fixture
    * scale (sf0.001–sf0.1 ≲ 10⁵ docs; the ×10/×100/×1000 rehearsals
    * replicate ids upward of +10M, clear of every twin band). A corpus
    * crossing 1M docs must re-derive the offsets from max(doc_id); the
    * fixtures fail LOUDLY there (twin ids collide with real docs and
    * the oracles' splits misclassify rows → hash mismatch), never
    * silently. */
  private def imageBlockCte(corpusOnlyStop: Boolean,
      perceptual: Boolean = false): String = {
    val scope = if (corpusOnlyStop) "WHERE media_id < 6000000" else ""
    val crop = """substring(hex(encode(text)), 145, 48) ||
                       substring(hex(encode(text)), 241, 48) ||
                       substring(hex(encode(text)), 337, 48) ||
                       substring(hex(encode(text)), 433, 48)"""
    val base = s"""WITH m AS (
                SELECT doc_id AS media_id, 0 AS bright,
                       hex(encode(text)) AS h,
                       octet_length(encode(text)) AS n, 48 AS rb
                FROM documents
                UNION ALL
                SELECT doc_id + 6000000, 0, $crop, 96, 24
                FROM documents
                WHERE doc_id % 4 = 1 AND octet_length(encode(text)) >= 288
                UNION ALL
                SELECT doc_id + 7000000, 1, $crop, 96, 24
                FROM documents
                WHERE doc_id % 4 = 1 AND octet_length(encode(text)) >= 288),
              pos AS (
                SELECT media_id, bright, h, n, rb,
                       unnest(range(1, rb * greatest(1,
                         CAST(ceil(n / (1.0 * rb)) AS BIGINT)) + 1)) AS i
                FROM m),
              sb AS (
                SELECT media_id,
                       ((i - 1) // rb) * 1048576
                         + (((i - 1) % rb) // 24) AS seg,
                       ((i - 1) % rb) % 24 AS j,
                       CASE WHEN i > n THEN 0 ELSE
                         (16 * (strpos('0123456789ABCDEF',
                                 substring(h, CAST(2*i-1 AS BIGINT), 1)) - 1)
                           + (strpos('0123456789ABCDEF',
                                 substring(h, CAST(2*i AS BIGINT), 1)) - 1)
                           + bright) % 256
                       END AS byte
                FROM pos),
              sk AS (
                SELECT media_id, seg,
                       string_agg(
                         substring('0123456789abcdef', byte // 16 + 1, 1)
                         || substring('0123456789abcdef', byte % 16 + 1, 1),
                         '' ORDER BY j) AS k
                FROM sb GROUP BY 1, 2),
              skz AS (
                SELECT media_id, seg, k FROM sk
                WHERE k <> repeat('00', 24)),
              stop AS (
                SELECT k FROM skz $scope
                GROUP BY 1 HAVING count(DISTINCT media_id) > 10000),
              skx AS (
                SELECT media_id, seg, k FROM skz
                WHERE NOT EXISTS (SELECT 1 FROM stop s WHERE s.k = skz.k))
              """
    // the per-block gradient fingerprint at fb = 24: bit k of the low
    // half compares bytes (k+1) mod 24 vs k mod 24 (the frameFpBits
    // wraparound — blocks are shorter than the 32-bit halves, unlike
    // the 48-byte rows), bit k of the high half compares byte k mod 24
    // against the block's integer mean; zero (padding) blocks excluded
    // exactly as the exact leg excludes them
    val fp = s""", mn AS (
                SELECT sb.media_id, sb.seg, sum(sb.byte) // 24 AS mean
                FROM sb JOIN skz z
                  ON z.media_id = sb.media_id AND z.seg = sb.seg
                GROUP BY 1, 2),
              fpk AS (SELECT unnest(range(0, 32)) AS k),
              glo AS (
                SELECT b1.media_id, b1.seg,
                       CAST(sum(CASE WHEN b2.byte > b1.byte
                         THEN (CAST(1 AS BIGINT) << CAST(f.k AS INT))
                         ELSE 0 END) AS BIGINT) AS lo
                FROM fpk f
                JOIN sb b1 ON b1.j = f.k % 24
                JOIN sb b2 ON b2.media_id = b1.media_id
                          AND b2.seg = b1.seg AND b2.j = (f.k + 1) % 24
                JOIN skz z ON z.media_id = b1.media_id AND z.seg = b1.seg
                GROUP BY 1, 2),
              ghi AS (
                SELECT b1.media_id, b1.seg,
                       CAST(sum(CASE WHEN b1.byte > mn.mean
                         THEN (CAST(1 AS BIGINT) << CAST(f.k AS INT))
                         ELSE 0 END) AS BIGINT) AS hi
                FROM fpk f
                JOIN sb b1 ON b1.j = f.k % 24
                JOIN mn ON mn.media_id = b1.media_id AND mn.seg = b1.seg
                GROUP BY 1, 2),
              afp AS (
                SELECT glo.media_id, glo.seg, glo.lo, ghi.hi
                FROM glo JOIN ghi
                  ON glo.media_id = ghi.media_id AND glo.seg = ghi.seg),
              bandx AS (
                SELECT media_id, seg, 0 AS bi, lo % 65536 AS bv FROM afp
                UNION ALL
                SELECT media_id, seg, 1, lo // 65536 FROM afp
                UNION ALL
                SELECT media_id, seg, 2, hi % 65536 FROM afp
                UNION ALL
                SELECT media_id, seg, 3, hi // 65536 FROM afp),
              bstop AS (
                SELECT bi, bv FROM bandx $scope
                GROUP BY 1, 2 HAVING count(DISTINCT media_id) > 10000),
              """
    if (perceptual) base + fp else base
  }

  /** The live entries + the STORED fingerprint twins (r13 verdict #1):
    * same answers, served from [[graft.sources.MediaIndex]]'s persisted
    * (media_id, h_lo, h_hi) table — the decode+dHash pass (33.6 s of
    * the ×100 row, R13MediaProbe) runs once at build/ingest; the query
    * scans 16-byte fingerprint rows and never opens a payload. Oracles
    * are the live queries' full replays VERBATIM (shared by reference,
    * not copied), because the stored layout changes cost, never
    * answers — the IvfIndex/TextIndex/DedupIndex discipline. */

  val all: Seq[Q] = live ++ Seq(
    // image crop detection served from the persisted raster-row index —
    // the temporal family's third modality; live oracle verbatim.
    Q("q_image_crop_detect_stored",
      (s, d) => Multimodal.clipPairsFromFrames(
        s.table(
          s"${graft.sources.VideoIndex.ensureBuiltImageRows(s, d)}_vf"),
        minFrames = 2),
      live.find(_.name == "q_image_crop_detect").get.oracle),
    // 2D crop detection served from the persisted BLOCK index — the
    // fourth grid on the same stored family (packed 2-vector shift);
    // live oracle verbatim.
    Q("q_image_crop2d_detect_stored",
      (s, d) => Multimodal.clipPairsFromFrames(
        s.table(
          s"${graft.sources.VideoIndex.ensureBuiltImageBlocks(s, d)}_vf"),
        minFrames = 2),
      live.find(_.name == "q_image_crop2d_detect").get.oracle),
  )
}
