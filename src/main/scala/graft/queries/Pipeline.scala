package graft.queries

import graft.ext.PipelineOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Corpus-hygiene pipeline queries (chunk dedup, boilerplate filtering,
  * PII redaction, streaming dedup-on-ingest) — SURVEY.md §2.9. Oracle SQL
  * mirrors the Spark expressions operation-for-operation. */
object Pipeline {

  val defs: Seq[QueryDef] = Seq(

    // ---- chunk-level corpus dedup (paragraph-dedup analog) ----------------
    // Non-overlapping 16-token chunks, hashed, counted corpus-wide; per-doc
    // duplicated-chunk fraction. DuckDB rebuilds the chunks with list
    // slicing (1-based inclusive bounds == the kernel's [c*k, min((c+1)k)).
    QueryDef(
      "q_chunk_dedup",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        c AS (SELECT doc_id,
                unnest(list_transform(
                  range(CAST(ceil(len(toks) / 16.0) AS BIGINT)),
                  i -> md5(array_to_string(
                    toks[i*16 + 1 : least((i+1)*16, len(toks))], ' ')))) AS ch
              FROM t WHERE len(toks) > 0),
        d AS (SELECT ch, count(DISTINCT doc_id) AS df FROM c GROUP BY ch)
        SELECT doc_id,
               count(*) AS n_chunks,
               count(CASE WHEN df > 1 THEN 1 END) AS n_dup_chunks,
               CAST(count(CASE WHEN df > 1 THEN 1 END) AS DOUBLE) / count(*)
                 AS dup_ratio
        FROM c JOIN d USING (ch) GROUP BY doc_id"""),
      (s, dir) => PipelineOps.chunkDedup(Tables.load(s, dir, "documents"), 16)),

    // ---- content-defined chunking dedup (LBFS/rsync CDC) -------------------
    // Chunk boundaries cut where u32(md5(8-char window)) % 64 == 0 —
    // content-defined, so an insertion reshapes only the chunks it
    // touches (fixed-size chunking loses all downstream alignment). The
    // oracle replays cuts, slices, and the cross-doc df relationally.
    QueryDef(
      "q_cdc_dedup",
      Some("""
        WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        c AS (SELECT doc_id, t, len(t) AS n,
                CASE WHEN len(t) >= 8 THEN
                  list_filter(range(1, len(t) - 8 + 2),
                    i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 8))::BIGINT
                           % 64 = 0)
                ELSE CAST([] AS BIGINT[]) END AS cuts
              FROM d),
        b AS (SELECT doc_id,
                list_filter(list_transform(range(1, len(cuts) + 2), k ->
                  substr(t,
                    CASE WHEN k = 1 THEN 1 ELSE cuts[k - 1] + 8 END,
                    (CASE WHEN k = len(cuts) + 1 THEN n
                          ELSE cuts[k] + 8 - 1 END)
                      - (CASE WHEN k = 1 THEN 1 ELSE cuts[k - 1] + 8 END)
                      + 1)),
                  ch -> ch <> '') AS chunks
              FROM c),
        h AS (SELECT doc_id, md5(unnest(chunks)) AS h,
                len(unnest(chunks)) AS clen
              FROM b),
        dfc AS (SELECT h, count(DISTINCT doc_id) AS df FROM h GROUP BY h)
        SELECT doc_id,
               count(*) AS n_chunks,
               count(CASE WHEN df > 1 THEN 1 END) AS n_dup_chunks,
               CAST(sum(CASE WHEN df > 1 THEN clen ELSE 0 END) AS BIGINT)
                 AS dup_chars,
               CAST(count(CASE WHEN df > 1 THEN 1 END) AS DOUBLE) / count(*)
                 AS dup_ratio
        FROM h JOIN dfc USING (h) GROUP BY doc_id"""),
      (s, dir) => PipelineOps.cdcChunkDedup(
        Tables.load(s, dir, "documents"), w = 8, mask = 64)),

    // ---- exact substring-SPAN dedup (Lee et al. 2022) ---------------------
    // Maximal token spans duplicated anywhere in the corpus (window w=8),
    // removed per document; the clean_fp md5 pins the exact span
    // boundaries — any island-merge or removal off-by-one flips the hash.
    // DuckDB replays the whole method: positional 8-gram duplicate test,
    // gap>w island split, span removal, ordered re-join.
    QueryDef(
      "q_substring_dedup",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+7], ' ') AS gram
              FROM t, unnest(range(1, len(toks) - 6)) AS r(i)
              WHERE len(toks) >= 8),
        dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        m AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
        isl AS (SELECT doc_id, pos,
                  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                       THEN 1 ELSE 0 END AS brk
                FROM m),
        isl2 AS (SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
                 FROM isl),
        sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
               FROM isl2 GROUP BY doc_id, island),
        tp AS (SELECT doc_id, i AS pos, toks[i] AS tok
               FROM t, unnest(range(1, len(toks) + 1)) AS r(i)),
        kept AS (SELECT tp.doc_id, tp.pos, tp.tok
                 FROM tp LEFT JOIN sp
                   ON sp.doc_id = tp.doc_id AND tp.pos BETWEEN sp.s AND sp.e
                 WHERE sp.doc_id IS NULL),
        cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ctext
               FROM kept GROUP BY doc_id),
        st AS (SELECT doc_id, count(*) AS n_spans,
                 CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
               FROM sp GROUP BY doc_id)
        SELECT t.doc_id, len(t.toks) AS total_tokens,
               COALESCE(st.n_spans, 0) AS n_spans,
               COALESCE(st.dup_tokens, 0) AS dup_tokens,
               md5(COALESCE(cl.ctext, '')) AS clean_fp
        FROM t LEFT JOIN st ON st.doc_id = t.doc_id
        LEFT JOIN cl ON cl.doc_id = t.doc_id"""),
      (s, dir) => graft.ext.SpanDedup.spanDedup(
        Tables.load(s, dir, "documents"), w = 8)),

    // ---- span-dedup-on-ingest (vs a frozen corpus gram index) -------------
    // Even-id docs freeze the reference gram set; odd-id docs arrive as
    // microbatches and a position is duplicated when its 8-gram exists
    // anywhere in the frozen corpus. Batching-invariant by construction
    // (static set only — intra-batch repeats deliberately not consulted).
    QueryDef(
      "q_stream_span_dedup",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+7], ' ') AS gram
              FROM t, unnest(range(1, len(toks) - 6)) AS r(i)
              WHERE len(toks) >= 8),
        m AS (SELECT a.doc_id, a.pos FROM g a
              WHERE a.doc_id % 2 = 1
                AND a.gram IN (SELECT gram FROM g WHERE doc_id % 2 = 0)),
        isl AS (SELECT doc_id, pos,
                  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                       THEN 1 ELSE 0 END AS brk
                FROM m),
        isl2 AS (SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
                 FROM isl),
        sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
               FROM isl2 GROUP BY doc_id, island),
        arr AS (SELECT doc_id, toks FROM t WHERE doc_id % 2 = 1),
        tp AS (SELECT doc_id, i AS pos, toks[i] AS tok
               FROM arr, unnest(range(1, len(toks) + 1)) AS r(i)),
        kept AS (SELECT tp.doc_id, tp.pos, tp.tok
                 FROM tp LEFT JOIN sp
                   ON sp.doc_id = tp.doc_id AND tp.pos BETWEEN sp.s AND sp.e
                 WHERE sp.doc_id IS NULL),
        cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ctext
               FROM kept GROUP BY doc_id),
        st AS (SELECT doc_id, count(*) AS n_spans,
                 CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
               FROM sp GROUP BY doc_id)
        SELECT arr.doc_id, len(arr.toks) AS total_tokens,
               COALESCE(st.n_spans, 0) AS n_spans,
               COALESCE(st.dup_tokens, 0) AS dup_tokens,
               md5(COALESCE(cl.ctext, '')) AS clean_fp
        FROM arr LEFT JOIN st ON st.doc_id = arr.doc_id
        LEFT JOIN cl ON cl.doc_id = arr.doc_id"""),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val index = graft.ext.SpanDedup.buildGramIndex(
          docs.where(col("doc_id") % 2 === 0), w = 8)
        val stream = Tables.documentsStream(s, dir)
        val out = graft.ext.SpanDedup.spanDedupOnIngest(
          stream.where(col("doc_id") % 2 === 1), index)
        index.release()
        out
      }),

    // ---- the full hygiene pipeline, composed ------------------------------
    // langid -> quality floor -> boilerplate (FRACTIONAL df floor) ->
    // exact dedup -> decontamination vs the doc_id<25 eval set ->
    // repetition floors (word + char-fraction) -> trigram-LM fit floor ->
    // PII redaction -> budget-constrained quality selection, one row per
    // SELECTED doc with every stage's evidence. The oracle recomputes the
    // whole composition — including the final budget cumsum over exactly
    // the hygiene survivors — so the gate checks the stages AND their
    // interaction (join semantics, filter order invariance, the shared
    // shingle CTE, and that selection sees post-hygiene docs only).
    QueryDef(
      "q_pipeline_e2e",
      Some(s"""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        lang AS (SELECT doc_id, s_en,
                   CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'other'
                        WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                        WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                        WHEN s_fr >= s_es THEN 'fr'
                        ELSE 'es' END AS predicted
                 FROM (SELECT doc_id,
                         len(regexp_extract_all(lower(text), '\\b(?:the|and|of|to|in)\\b')) AS s_en,
                         len(regexp_extract_all(lower(text), '\\b(?:der|die|und|das|ist)\\b')) AS s_de,
                         len(regexp_extract_all(lower(text), '\\b(?:le|la|et|les|des)\\b')) AS s_fr,
                         len(regexp_extract_all(lower(text), '\\b(?:el|los|y|que|una)\\b')) AS s_es
                       FROM documents)),
        qual AS (SELECT doc_id,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
                 FROM documents),
        nd AS (SELECT count(*) AS total FROM documents),
        d AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        boiler AS (SELECT doc_id,
                     CAST(count(CASE WHEN df >= greatest(3, CAST(ceil(0.01 * total) AS BIGINT)) THEN 1 END) AS DOUBLE)
                       / count(*) AS boiler_ratio
                   FROM sh JOIN d USING (shingle), nd GROUP BY doc_id),
        fp AS (SELECT doc_id,
                 md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS f
               FROM documents),
        surv AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25),
        decon AS (SELECT s.doc_id,
                    CAST(count(e.shingle) AS DOUBLE) / count(*) AS contam_frac
                  FROM sh s LEFT JOIN ev e ON s.shingle = e.shingle
                  WHERE s.doc_id >= 25 GROUP BY s.doc_id),
        rep AS (SELECT doc_id,
                  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
                FROM t WHERE len(toks) >= 2),
        bg AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                   i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))) AS b
               FROM t WHERE len(toks) >= 2),
        bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        tb AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
               FROM bc GROUP BY doc_id),
        ac AS (SELECT doc_id,
                 CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alpha_chars
               FROM documents),
        g3 AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) - 1),
                   i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                        || ' ' || list_extract(toks, i + 2))) AS gram
               FROM t WHERE len(toks) >= 3),
        c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2),
        d3 AS (SELECT doc_id,
                 CAST(sum(cnt * (length(gram) - 2)) AS BIGINT) AS dup3_chars
               FROM c3 WHERE cnt > 1 GROUP BY doc_id),
        chars AS (SELECT b3.doc_id,
                    CAST(COALESCE(d3.dup3_chars, 0) AS DOUBLE) / ac.alpha_chars AS dup3_frac
                  FROM (SELECT doc_id FROM t WHERE len(toks) >= 3) b3
                  JOIN ac ON ac.doc_id = b3.doc_id
                  LEFT JOIN d3 ON d3.doc_id = b3.doc_id),
        tld AS (SELECT doc_id, lower(text) AS s FROM documents),
        tlp AS (SELECT doc_id,
                  unnest(list_transform(range(1, length(s) - 1),
                    i -> substring(s, CAST(i AS INT), 3))) AS tri
                FROM tld),
        tltot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tlp),
        tlc AS (SELECT tri, CAST(count(*) AS BIGINT) AS cnt FROM tlp GROUP BY tri),
        tlcom AS (SELECT tri FROM tlc, tltot WHERE cnt * 2000 > tltot.total),
        trir AS (SELECT p.doc_id,
                   CAST(count(*) - count(c.tri) AS DOUBLE) / count(*) AS rare_rate
                 FROM tlp p LEFT JOIN tlcom c ON p.tri = c.tri
                 GROUP BY p.doc_id),
        red AS (SELECT doc_id,
                  md5(regexp_replace(
                    regexp_replace(text, '${PipelineOps.EmailRe}', '<EMAIL>', 'g'),
                    '${PipelineOps.PhoneRe}', '<PHONE>', 'g')) AS red_fp
                FROM documents),
        hyg AS (SELECT lang.doc_id, CAST(qual.n_tokens AS BIGINT) AS n_tokens,
                       CAST(lang.s_en AS DOUBLE) / qual.n_tokens AS stop_ratio,
                       boiler.boiler_ratio, decon.contam_frac,
                       rep.uniq_ratio, tb.top_bigram_frac, chars.dup3_frac,
                       trir.rare_rate, CAST(lang.s_en AS BIGINT) AS s_en,
                       red.red_fp
                FROM lang
                JOIN qual ON qual.doc_id = lang.doc_id
                JOIN boiler ON boiler.doc_id = lang.doc_id
                JOIN decon ON decon.doc_id = lang.doc_id
                JOIN surv ON surv.doc_id = lang.doc_id
                JOIN rep ON rep.doc_id = lang.doc_id
                JOIN tb ON tb.doc_id = lang.doc_id
                JOIN chars ON chars.doc_id = lang.doc_id
                JOIN trir ON trir.doc_id = lang.doc_id
                JOIN red ON red.doc_id = lang.doc_id
                WHERE lang.predicted = 'en'
                  AND qual.n_tokens >= 20
                  AND CAST(lang.s_en AS DOUBLE) / qual.n_tokens >= 0.02
                  AND boiler.boiler_ratio <= 0.3
                  AND decon.contam_frac < 0.3
                  AND tb.top_bigram_frac <= 0.2
                  AND rep.uniq_ratio >= 0.3
                  AND chars.dup3_frac <= 0.2
                  AND trir.rare_rate <= 0.2),
        bsel AS (SELECT doc_id,
                   CAST(sum(n_tokens) OVER (ORDER BY q DESC, doc_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                 FROM (SELECT doc_id, n_tokens,
                         (s_en * 100000) // n_tokens AS q FROM hyg))
        SELECT h.doc_id, h.n_tokens, h.stop_ratio, h.boiler_ratio,
               h.contam_frac, h.uniq_ratio, h.top_bigram_frac, h.dup3_frac,
               h.rare_rate, b.cum_tokens, h.red_fp
        FROM hyg h JOIN bsel b ON b.doc_id = h.doc_id
        WHERE b.cum_tokens <= 10000"""),
      (s, dir) => PipelineOps.hygienePipeline(
        Tables.load(s, dir, "documents"), col("doc_id") < 25)),

    // ---- hygiene-on-ingest: score arrivals vs a frozen corpus profile -----
    // The deployment form of the corpus build: the profile (shingle dfs,
    // eval shingles, common trigrams, fractional df floor) freezes once
    // from the existing corpus; arriving (doc_id >= 25) docs are scored
    // per microbatch by every per-document stage — langid, quality,
    // boilerplate-vs-reference, decontamination, word + char repetition
    // floors, trigram fit, PII fingerprint. Stream == corpus and
    // profile == corpus here, so the oracle is the batch composition
    // restricted to the arriving docs (the corpus-STATE stages — dedup
    // survivors and the budget cumsum — are inherently cross-document
    // and live only in the batch q_pipeline_e2e).
    QueryDef(
      "q_stream_pipeline",
      Some(s"""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        lang AS (SELECT doc_id, s_en,
                   CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'other'
                        WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                        WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                        WHEN s_fr >= s_es THEN 'fr'
                        ELSE 'es' END AS predicted
                 FROM (SELECT doc_id,
                         len(regexp_extract_all(lower(text), '\\b(?:the|and|of|to|in)\\b')) AS s_en,
                         len(regexp_extract_all(lower(text), '\\b(?:der|die|und|das|ist)\\b')) AS s_de,
                         len(regexp_extract_all(lower(text), '\\b(?:le|la|et|les|des)\\b')) AS s_fr,
                         len(regexp_extract_all(lower(text), '\\b(?:el|los|y|que|una)\\b')) AS s_es
                       FROM documents)),
        qual AS (SELECT doc_id,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
                 FROM documents),
        nd AS (SELECT count(*) AS total FROM documents),
        d AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        boiler AS (SELECT doc_id,
                     CAST(count(CASE WHEN df >= greatest(3, CAST(ceil(0.01 * total) AS BIGINT)) THEN 1 END) AS DOUBLE)
                       / count(*) AS boiler_ratio
                   FROM sh JOIN d USING (shingle), nd GROUP BY doc_id),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25),
        decon AS (SELECT s.doc_id,
                    CAST(count(e.shingle) AS DOUBLE) / count(*) AS contam_frac
                  FROM sh s LEFT JOIN ev e ON s.shingle = e.shingle
                  WHERE s.doc_id >= 25 GROUP BY s.doc_id),
        rep AS (SELECT doc_id,
                  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
                FROM t WHERE len(toks) >= 2),
        bg AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                   i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))) AS b
               FROM t WHERE len(toks) >= 2),
        bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        tb AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
               FROM bc GROUP BY doc_id),
        ac AS (SELECT doc_id,
                 CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alpha_chars
               FROM documents),
        g3 AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) - 1),
                   i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                        || ' ' || list_extract(toks, i + 2))) AS gram
               FROM t WHERE len(toks) >= 3),
        c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2),
        d3 AS (SELECT doc_id,
                 CAST(sum(cnt * (length(gram) - 2)) AS BIGINT) AS dup3_chars
               FROM c3 WHERE cnt > 1 GROUP BY doc_id),
        chars AS (SELECT b3.doc_id,
                    CAST(COALESCE(d3.dup3_chars, 0) AS DOUBLE) / ac.alpha_chars AS dup3_frac
                  FROM (SELECT doc_id FROM t WHERE len(toks) >= 3) b3
                  JOIN ac ON ac.doc_id = b3.doc_id
                  LEFT JOIN d3 ON d3.doc_id = b3.doc_id),
        tld AS (SELECT doc_id, lower(text) AS s FROM documents),
        tlp AS (SELECT doc_id,
                  unnest(list_transform(range(1, length(s) - 1),
                    i -> substring(s, CAST(i AS INT), 3))) AS tri
                FROM tld),
        tltot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tlp),
        tlc AS (SELECT tri, CAST(count(*) AS BIGINT) AS cnt FROM tlp GROUP BY tri),
        tlcom AS (SELECT tri FROM tlc, tltot WHERE cnt * 2000 > tltot.total),
        trir AS (SELECT p.doc_id,
                   CAST(count(*) - count(c.tri) AS DOUBLE) / count(*) AS rare_rate
                 FROM tlp p LEFT JOIN tlcom c ON p.tri = c.tri
                 GROUP BY p.doc_id),
        red AS (SELECT doc_id,
                  md5(regexp_replace(
                    regexp_replace(text, '${PipelineOps.EmailRe}', '<EMAIL>', 'g'),
                    '${PipelineOps.PhoneRe}', '<PHONE>', 'g')) AS red_fp
                FROM documents)
        SELECT lang.doc_id, CAST(qual.n_tokens AS BIGINT) AS n_tokens,
               CAST(lang.s_en AS DOUBLE) / qual.n_tokens AS stop_ratio,
               boiler.boiler_ratio, decon.contam_frac,
               rep.uniq_ratio, tb.top_bigram_frac, chars.dup3_frac,
               trir.rare_rate, red.red_fp
        FROM lang
        JOIN qual ON qual.doc_id = lang.doc_id
        JOIN boiler ON boiler.doc_id = lang.doc_id
        JOIN decon ON decon.doc_id = lang.doc_id
        JOIN rep ON rep.doc_id = lang.doc_id
        JOIN tb ON tb.doc_id = lang.doc_id
        JOIN chars ON chars.doc_id = lang.doc_id
        JOIN trir ON trir.doc_id = lang.doc_id
        JOIN red ON red.doc_id = lang.doc_id
        WHERE lang.doc_id >= 25
          AND lang.predicted = 'en'
          AND qual.n_tokens >= 20
          AND CAST(lang.s_en AS DOUBLE) / qual.n_tokens >= 0.02
          AND boiler.boiler_ratio <= 0.3
          AND decon.contam_frac < 0.3
          AND tb.top_bigram_frac <= 0.2
          AND rep.uniq_ratio >= 0.3
          AND chars.dup3_frac <= 0.2
          AND trir.rare_rate <= 0.2"""),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val profile = PipelineOps.buildHygieneProfile(docs, col("doc_id") < 25)
        val stream = Tables.documentsStream(s, dir)
        val out = PipelineOps.hygieneOnIngest(
          stream.where(col("doc_id") >= 25), profile)
        profile.release()
        out
      }),

    // ---- boilerplate n-gram detection / filter ----------------------------
    // Shingles in >= 3 docs are boilerplate; drop docs over 30% boilerplate.
    QueryDef(
      "q_boilerplate",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        d AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
        SELECT doc_id,
               count(*) AS n_sh,
               count(CASE WHEN df >= 3 THEN 1 END) AS boiler_sh,
               CAST(count(CASE WHEN df >= 3 THEN 1 END) AS DOUBLE) / count(*)
                 AS boiler_ratio,
               CAST(count(CASE WHEN df >= 3 THEN 1 END) AS DOUBLE) / count(*)
                 <= 0.3 AS keep
        FROM sh JOIN d USING (shingle) GROUP BY doc_id"""),
      (s, dir) => PipelineOps.boilerplate(
        Tables.load(s, dir, "documents"), minDf = 3, maxRatio = 0.3)),

    // ---- directed containment (quotation / partial-dup detection) ---------
    // Default engine path: prefix-filtered candidates (rarest-first global
    // shingle order, recall-1 by the pigeonhole bound) + exact directed
    // verification — so the oracle is the plain exact SQL: the filter is
    // lossless, not approximate.
    QueryDef(
      "q_containment",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b
                    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
                  GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b,
               CAST(i.c AS DOUBLE) / sa.n_sh AS containment
        FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
        WHERE CAST(i.c AS DOUBLE) / sa.n_sh >= 0.8"""),
      (s, dir) => PipelineOps.containmentPairs(
        Tables.load(s, dir, "documents"), 0.8)),

    // ---- directed containment, all-pairs exact baseline -------------------
    // Same oracle SQL as q_containment: the prefix path above must return
    // exactly these rows (losslessness pinned in the gate, not just specs).
    QueryDef(
      "q_containment_exact",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b
                    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
                  GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b,
               CAST(i.c AS DOUBLE) / sa.n_sh AS containment
        FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
        WHERE CAST(i.c AS DOUBLE) / sa.n_sh >= 0.8"""),
      (s, dir) => PipelineOps.containmentPairs(
        Tables.load(s, dir, "documents"), 0.8, exact = true)),

    // ---- eval-set decontamination -----------------------------------------
    // Eval set = doc_id < 25; training docs are scored by the fraction of
    // their distinct shingles appearing anywhere in the eval set.
    QueryDef(
      "q_decontaminate",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25)
        SELECT s.doc_id,
               count(*) AS n_sh,
               count(e.shingle) AS shared_sh,
               CAST(count(e.shingle) AS DOUBLE) / count(*) AS contam_frac,
               CAST(count(e.shingle) AS DOUBLE) / count(*) >= 0.3
                 AS contaminated
        FROM sh s LEFT JOIN ev e ON s.shingle = e.shingle
        WHERE s.doc_id >= 25 GROUP BY s.doc_id"""),
      (s, dir) => PipelineOps.decontaminate(
        Tables.load(s, dir, "documents"), col("doc_id") < 25, maxFrac = 0.3)),

    // ---- Bloom-filter decontamination (self-validating gate) --------------
    // The membership-at-scale variant: eval shingles folded distributed
    // into a Bloom bitset, docs scored by one codegen'd counting pass.
    // Bloom bit placement is deterministic (seed-fixed double hashing,
    // OR-merge), so two structural properties are oracle-checkable:
    // no_false_neg (bloom_hits >= exact shared count, guaranteed) and
    // fpr_ok (total overshoot within 3x nominal fpp + slack — Poisson sd
    // is ~sqrt(mean), the 3x margin is dozens of sds at any corpus size).
    // Exact columns ride along SQL-reproduced; the engine-specific hit
    // counts themselves never reach the hash.
    QueryDef(
      "q_decontaminate_bloom",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25)
        SELECT s.doc_id,
               count(*) AS n_sh,
               count(e.shingle) AS shared_sh,
               CAST(count(e.shingle) AS DOUBLE) / count(*) AS contam_frac,
               CAST(count(e.shingle) AS DOUBLE) / count(*) >= 0.3
                 AS contaminated,
               true AS no_false_neg,
               true AS fpr_ok
        FROM sh s LEFT JOIN ev e ON s.shingle = e.shingle
        WHERE s.doc_id >= 25 GROUP BY s.doc_id"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val exact = PipelineOps.decontaminate(docs, col("doc_id") < 25, 0.3)
        val bloomed = PipelineOps
          .decontaminateBloom(docs, col("doc_id") < 25, 0.3)
          .select(col("doc_id"), col("bloom_hits"))
        val j = exact.join(bloomed, "doc_id")
        val tot = j.agg(
          sum(col("bloom_hits") - col("shared_sh")).as("__extra"),
          sum(col("n_sh") - col("shared_sh")).as("__neg"))
        j.crossJoin(broadcast(tot))
          .select(
            col("doc_id"), col("n_sh"), col("shared_sh"),
            col("contam_frac"), col("contaminated"),
            (col("bloom_hits") >= col("shared_sh")).as("no_false_neg"),
            (col("__extra") <= ceil(lit(0.03) * col("__neg")) + lit(32L))
              .as("fpr_ok"))
      }),

    // ---- PII redaction (deterministic injected contacts) ------------------
    QueryDef(
      "q_redact",
      Some(s"""
        WITH i AS (SELECT doc_id,
                     text || ' contact user' || doc_id ||
                     '@example.com or +1-555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
                   FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(t, '${PipelineOps.EmailRe}')) AS n_emails,
               len(regexp_extract_all(t, '${PipelineOps.PhoneRe}')) AS n_phones,
               md5(regexp_replace(
                 regexp_replace(t, '${PipelineOps.EmailRe}', '<EMAIL>', 'g'),
                 '${PipelineOps.PhoneRe}', '<PHONE>', 'g')) AS red_fp
        FROM i"""),
      (s, dir) => PipelineOps.redactDemo(Tables.load(s, dir, "documents"))),

    // ---- stratified sampling (exactly N per group) ------------------------
    // Two-phase: 16-bit hash-prefix prefilter sized from group counts
    // (~4x oversample), then rank only the survivors. The oracle applies
    // the identical integer bound, so the result is engine-exact.
    QueryDef(
      "q_stratified_sample",
      Some("""
        WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
        b AS (SELECT lang, least(65535, CAST(ceil(2621440.0 / cnt) AS INT)) AS bound
              FROM c),
        f AS (SELECT d.doc_id, d.lang, md5(d.text) AS m
              FROM documents d JOIN b USING (lang)
              WHERE ('0x' || substr(md5(d.text), 1, 4))::INT < b.bound),
        r AS (SELECT doc_id, lang,
                row_number() OVER (PARTITION BY lang ORDER BY m, doc_id) AS rn
              FROM f)
        SELECT doc_id, lang, CAST(rn AS INT) AS rn FROM r WHERE rn <= 10"""),
      (s, dir) => PipelineOps.stratifiedSample(
        Tables.load(s, dir, "documents"), "lang", 10)),

    // ---- streaming boilerplate-on-ingest ----------------------------------
    // Arriving docs scored against the STATIC reference shingle-df table
    // per microbatch. Stream == corpus and reference == corpus here, so
    // the result is pinned to the batch q_boilerplate oracle exactly.
    QueryDef(
      "q_stream_boilerplate",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        d AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
        SELECT doc_id,
               count(*) AS n_sh,
               count(CASE WHEN df >= 3 THEN 1 END) AS boiler_sh,
               CAST(count(CASE WHEN df >= 3 THEN 1 END) AS DOUBLE) / count(*)
                 AS boiler_ratio,
               CAST(count(CASE WHEN df >= 3 THEN 1 END) AS DOUBLE) / count(*)
                 <= 0.3 AS keep
        FROM sh JOIN d USING (shingle) GROUP BY doc_id"""),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val refDf = PipelineOps.shingleDf(docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val stream = Tables.documentsStream(s, dir)
        val out = graft.streaming.StreamingOps.runBatchesToParquet(
          stream, "stream_boilerplate",
          batch => PipelineOps.boilerplateAgainst(refDf, batch))
        refDf.unpersist()
        out
      }),

    // ---- streaming chunk-dedup-on-ingest ----------------------------------
    QueryDef(
      "q_stream_chunk_dedup",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        c AS (SELECT doc_id,
                unnest(list_transform(
                  range(CAST(ceil(len(toks) / 16.0) AS BIGINT)),
                  i -> md5(array_to_string(
                    toks[i*16 + 1 : least((i+1)*16, len(toks))], ' ')))) AS ch
              FROM t WHERE len(toks) > 0),
        d AS (SELECT ch, count(DISTINCT doc_id) AS df FROM c GROUP BY ch)
        SELECT doc_id,
               count(*) AS n_chunks,
               count(CASE WHEN df > 1 THEN 1 END) AS n_dup_chunks,
               CAST(count(CASE WHEN df > 1 THEN 1 END) AS DOUBLE) / count(*)
                 AS dup_ratio
        FROM c JOIN d USING (ch) GROUP BY doc_id"""),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val refDf = PipelineOps.chunkDf(docs, 16)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val stream = Tables.documentsStream(s, dir)
        val out = graft.streaming.StreamingOps.runBatchesToParquet(
          stream, "stream_chunk_dedup",
          batch => PipelineOps.chunkDedupAgainst(refDf, batch, 16))
        refDf.unpersist()
        out
      }),

    // ---- streaming CDC-dedup-on-ingest ------------------------------------
    // Content-defined chunking against the frozen corpus chunk-frequency
    // table: same oracle as q_cdc_dedup (with the batch == the reference
    // corpus, the against-form reduces exactly to the self-form), same
    // foreachBatch shape as q_stream_chunk_dedup.
    QueryDef(
      "q_stream_cdc_dedup",
      Some("""
        WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        c AS (SELECT doc_id, t, len(t) AS n,
                CASE WHEN len(t) >= 8 THEN
                  list_filter(range(1, len(t) - 8 + 2),
                    i -> ('0x' || substr(md5(substr(t, i, 8)), 1, 8))::BIGINT
                           % 64 = 0)
                ELSE CAST([] AS BIGINT[]) END AS cuts
              FROM d),
        b AS (SELECT doc_id,
                list_filter(list_transform(range(1, len(cuts) + 2), k ->
                  substr(t,
                    CASE WHEN k = 1 THEN 1 ELSE cuts[k - 1] + 8 END,
                    (CASE WHEN k = len(cuts) + 1 THEN n
                          ELSE cuts[k] + 8 - 1 END)
                      - (CASE WHEN k = 1 THEN 1 ELSE cuts[k - 1] + 8 END)
                      + 1)),
                  ch -> ch <> '') AS chunks
              FROM c),
        h AS (SELECT doc_id, md5(unnest(chunks)) AS h,
                len(unnest(chunks)) AS clen
              FROM b),
        dfc AS (SELECT h, count(DISTINCT doc_id) AS df FROM h GROUP BY h)
        SELECT doc_id,
               count(*) AS n_chunks,
               count(CASE WHEN df > 1 THEN 1 END) AS n_dup_chunks,
               CAST(sum(CASE WHEN df > 1 THEN clen ELSE 0 END) AS BIGINT)
                 AS dup_chars,
               CAST(count(CASE WHEN df > 1 THEN 1 END) AS DOUBLE) / count(*)
                 AS dup_ratio
        FROM h JOIN dfc USING (h) GROUP BY doc_id"""),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val refDf = PipelineOps.cdcChunkDf(docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val stream = Tables.documentsStream(s, dir)
        val out = graft.streaming.StreamingOps.runBatchesToParquet(
          stream, "stream_cdc_dedup",
          batch => PipelineOps.cdcDedupAgainst(refDf, batch))
        refDf.unpersist()
        out
      }),

    // ---- streaming PII redaction on ingest --------------------------------
    // Pure projection: stateless append-mode streaming, no reference
    // frames at all — the simplest on-ingest hygiene op.
    QueryDef(
      "q_stream_redact",
      Some(s"""
        WITH i AS (SELECT doc_id,
                     text || ' contact user' || doc_id ||
                     '@example.com or +1-555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
                   FROM documents)
        SELECT doc_id,
               len(regexp_extract_all(t, '${PipelineOps.EmailRe}')) AS n_emails,
               len(regexp_extract_all(t, '${PipelineOps.PhoneRe}')) AS n_phones,
               md5(regexp_replace(
                 regexp_replace(t, '${PipelineOps.EmailRe}', '<EMAIL>', 'g'),
                 '${PipelineOps.PhoneRe}', '<PHONE>', 'g')) AS red_fp
        FROM i"""),
      (s, dir) => {
        Tables.prepare(s)
        val stream = Tables.documentsStream(s, dir)
        graft.streaming.StreamingOps.runToParquet(
          PipelineOps.redactDemo(stream), "stream_redact")
      }),

    // ---- streaming decontamination-on-ingest ------------------------------
    // REAL append-mode streaming: the shingle kernel emits each arriving
    // doc's whole distinct-shingle set in one row, so scoring is a
    // stateless array_intersect against the broadcast eval set — no state
    // store, batching-invariant, same oracle as the batch query.
    QueryDef(
      "q_stream_decontaminate",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25)
        SELECT s.doc_id,
               count(*) AS n_sh,
               count(e.shingle) AS shared_sh,
               CAST(count(e.shingle) AS DOUBLE) / count(*) AS contam_frac,
               CAST(count(e.shingle) AS DOUBLE) / count(*) >= 0.3
                 AS contaminated
        FROM sh s LEFT JOIN ev e ON s.shingle = e.shingle
        WHERE s.doc_id >= 25 GROUP BY s.doc_id"""),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val evalSh = PipelineOps.evalShingleSet(docs.where(col("doc_id") < 25))
        val stream = Tables.documentsStream(s, dir)
        graft.streaming.StreamingOps.runToParquet(
          PipelineOps.decontaminateScore(
            stream.where(col("doc_id") >= 25), evalSh, maxFrac = 0.3),
          "stream_decontaminate")
      }),

    // ---- streaming containment-on-ingest ----------------------------------
    // Arriving docs scored against a static reference index per microbatch
    // (foreachBatch; joins+aggs against static frames are inexpressible as
    // stateful streaming ops). Stream == corpus and index == corpus here,
    // so the result is pinned to the batch q_containment oracle exactly.
    QueryDef(
      "q_stream_containment",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                     i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                          || ' ' || list_extract(toks, i + 2))
                   ELSE [] END) AS shingle
               FROM t),
        sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b
                    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
                  GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b,
               CAST(i.c AS DOUBLE) / sa.n_sh AS containment
        FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
        WHERE CAST(i.c AS DOUBLE) / sa.n_sh >= 0.8"""),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val index = PipelineOps.buildContainmentIndex(docs)
        val stream = Tables.documentsStream(s, dir)
        val out = PipelineOps.containmentOnIngest(stream, index, 0.8)
        index.release()
        out
      }),

    // ---- streaming dedup-on-ingest ----------------------------------------
    // Real Structured Streaming query: stateful dropDuplicates on the
    // normalized-content fingerprint; output = the distinct fingerprint set
    // (keys only, so the result is independent of arrival order).
    QueryDef(
      "q_stream_dedup",
      Some("""
        SELECT DISTINCT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        FROM documents"""),
      (s, dir) => {
        Tables.prepare(s)
        val stream = Tables.documentsStream(s, dir)
        val deduped = stream
          .select(graft.ext.TextOps.fingerprint(col("text")).as("fp"))
          .dropDuplicates("fp")
        graft.streaming.StreamingOps.runToParquet(deduped, "stream_dedup",
          statePartitions = Some(graft.streaming.StreamingOps
            .boundedStatePartitions(s, s"$dir/documents.parquet")))
      })
  )
}
