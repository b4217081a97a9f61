package graft.queries

import graft.ext.{Dedup, DedupIndex, Multimodal, TextOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Text-analysis + dedup extension queries over `documents`
  * (SURVEY.md §2.9). Oracle SQL mirrors the Spark expressions exactly —
  * same regexes, same integer/double operation order. */
object Text {

  /** Shared oracle CTE chain: the hashed-classifier scoring (see
    * `TextOps.hashClassifier` — unigram + bigram features, md5-derived
    * integer micro-unit weights). Used by q_quality_classifier and
    * q_rank_calibrate. */
  private[queries] val classifierCte = """
        t AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
              FROM documents),
        u AS (SELECT doc_id, unnest(toks) AS f FROM t),
        b AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS f
              FROM t, unnest(range(1, len(toks))) AS r(i)
              WHERE len(toks) >= 2),
        wt AS (SELECT doc_id,
                 (('0x' || substr(md5('s1:' || f), 1, 8))::BIGINT % 2001)
                   - 1000 AS wt
               FROM (SELECT * FROM u UNION ALL SELECT * FROM b)),
        agg AS (SELECT doc_id, count(*) AS n_features,
                  CAST(sum(wt) AS BIGINT) AS score_micros
                FROM wt GROUP BY doc_id)"""

  /** Shared oracle CTEs: token arrays and distinct 3-gram shingles.
    * `range(1, len-1)` == Spark's guarded `sequence(1, size-2)`. */
  private[queries] val shinglesCte = """
    t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents),
    sh AS (SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                 i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                      || ' ' || list_extract(toks, i + 2))
               ELSE [] END) AS shingle
           FROM t),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)"""

  /** Shared oracle for q_dedup_against and q_stream_dedup_against: both
    * compute the same batch-vs-corpus near-dup result (odd ids probe the
    * even-id corpus), one via a direct probe, one per-microbatch. */
  private val dedupAgainstOracle = s"""
        WITH $shinglesCte,
        sig AS (SELECT doc_id, i,
                  min(substr(md5(shingle || '#' || (i // 2)),
                             CAST(1 + 16 * (i % 2) AS BIGINT), 16)) AS sig
                FROM sh CROSS JOIN range(9) r(i) GROUP BY doc_id, i),
        band AS (SELECT doc_id, i // 3 AS band,
                   md5(min(CASE WHEN i % 3 = 0 THEN sig END) || ',' ||
                       min(CASE WHEN i % 3 = 1 THEN sig END) || ',' ||
                       min(CASE WHEN i % 3 = 2 THEN sig END)) AS bkey
                 FROM sig GROUP BY doc_id, i // 3),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM band a JOIN band b
                   ON a.band = b.band AND a.bkey = b.bkey
                 WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b ON a.shingle = b.shingle
                  JOIN cand ON cand.doc_a = a.doc_id AND cand.doc_b = b.doc_id
                  GROUP BY 1, 2)
        SELECT i.doc_a AS doc_id, i.doc_b AS dup_of,
               CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) >= 0.7"""

  /** One BPE merge iteration as materialized CTEs `p$i`/`s$i` over
    * `s${i-1}`: frequency-argmax pair + leftmost double-pass rewrite.
    * MATERIALIZED because each s_i/p_i is referenced several times by
    * the next iteration — inlined CTEs would re-derive the whole prior
    * chain per reference, exponential in k (measured: >5 min inlined vs
    * 0.5 s materialized at k=6). `weightExpr` is `count(*)` for
    * doc-level streams and `sum(freq)` for the vocabulary form;
    * `keyCols` carries the stream's identity columns. An EMPTY argmax
    * (exhausted vocabulary: every stream is one symbol) coalesces the
    * rewrite patterns to '~' — outside the stream alphabet, so the
    * replace is the identity, matching the engine loop's early stop. */
  private def bpeIterSql(i: Int, weightExpr: String, keyCols: String)
      : String = s"""
        p$i AS MATERIALIZED (
                SELECT sym[j] || '|' || sym[j + 1] AS pair,
                       $weightExpr AS c
                FROM (SELECT *, list_filter(string_split(st, '|'),
                               x -> x <> '') AS sym
                      FROM s${i - 1}) z,
                     unnest(range(1, len(sym))) r(j)
                GROUP BY 1 ORDER BY c DESC, pair LIMIT 1),
        s$i AS MATERIALIZED (
                SELECT $keyCols,
                  replace(replace(st,
                    COALESCE((SELECT '|' || pair || '|' FROM p$i), '~'),
                    COALESCE((SELECT '|' || replace(pair, '|', '_') || '|'
                              FROM p$i), '~')),
                    COALESCE((SELECT '|' || pair || '|' FROM p$i), '~'),
                    COALESCE((SELECT '|' || replace(pair, '|', '_') || '|'
                              FROM p$i), '~'))
                    AS st
                FROM s${i - 1})"""

  /** Apply merge `i` (the `p$i` CTE from [[bpeIterSql]]) to a document
    * stream chain `d${i-1}` -> `d$i` — same double-pass rewrite and
    * same empty-argmax identity guard; not materialized (each d_i is
    * referenced exactly once, so the chain is linear). */
  private def bpeApplySql(i: Int, keyCols: String): String = s"""
        d$i AS (SELECT $keyCols,
                  replace(replace(st,
                    COALESCE((SELECT '|' || pair || '|' FROM p$i), '~'),
                    COALESCE((SELECT '|' || replace(pair, '|', '_') || '|'
                              FROM p$i), '~')),
                    COALESCE((SELECT '|' || pair || '|' FROM p$i), '~'),
                    COALESCE((SELECT '|' || replace(pair, '|', '_') || '|'
                              FROM p$i), '~'))
                    AS st
                FROM d${i - 1})"""

  /** The container-sniff CASE chain over hex(payload) — the SQL mirror
    * of `Multimodal.sniffContainer`, shared verbatim by the
    * q_mm_video_meta and q_mm_audio_meta oracles so the two cannot
    * drift. Same prefixes, same precedence: ftyp@4, RIFF families, GIF,
    * PNG, JPEG, BMP, FLAC, then MPEG audio (an ID3v2 tag, or a bare
    * frame sync FF Ex/Fx — no overlap with jpeg's FF D8), with the
    * layer-bits-00 sync pairs (FF F0/F1/F8/F9) carved out first as
    * ADTS AAC. */
  private val sniffCaseSql = """
               CASE
                 WHEN substr(hx, 9, 8) = '66747970' THEN 'mp4'
                 WHEN substr(hx, 1, 8) = '52494646'
                      AND substr(hx, 17, 8) = '41564920' THEN 'avi'
                 WHEN substr(hx, 1, 8) = '52494646'
                      AND substr(hx, 17, 8) = '57415645' THEN 'wav'
                 WHEN substr(hx, 1, 12) = '474946383761'
                      OR substr(hx, 1, 12) = '474946383961' THEN 'gif'
                 WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
                 WHEN substr(hx, 1, 4) = 'FFD8' THEN 'jpeg'
                 WHEN substr(hx, 1, 4) = '424D' THEN 'bmp'
                 WHEN substr(hx, 1, 8) = '664C6143' THEN 'flac'
                 WHEN substr(hx, 1, 8) = '4F676753' THEN 'ogg'
                 WHEN substr(hx, 1, 8) = '1A45DFA3' THEN 'mkv'
                 WHEN substr(hx, 1, 6) = '494433' THEN 'mp3'
                 WHEN substr(hx, 1, 2) = 'FF'
                      AND substr(hx, 3, 2) IN ('F0', 'F1', 'F8', 'F9')
                   THEN 'aac'
                 WHEN substr(hx, 1, 2) = 'FF'
                      AND substr(hx, 3, 1) IN ('E', 'F') THEN 'mp3'
                 ELSE 'none'
               END AS container"""

  val defs: Seq[QueryDef] = Seq(

    // ---- exact dedup ------------------------------------------------------
    QueryDef(
      "q_exact_dedup",
      Some("""
        SELECT text, min(doc_id) AS keep_id, count(*) AS copies
        FROM documents GROUP BY text"""),
      (s, dir) => Tables.load(s, dir, "documents")
        .groupBy("text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))),

    // ---- normalized-fingerprint dedup -------------------------------------
    QueryDef(
      "q_norm_dedup",
      Some("""
        SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
               min(doc_id) AS keep_id, count(*) AS copies
        FROM documents GROUP BY 1"""),
      (s, dir) => Tables.load(s, dir, "documents")
        .groupBy(TextOps.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))),

    // ---- n-gram Jaccard near-dup (exact all-pairs) -------------------------
    QueryDef(
      "q_jaccard_neardup",
      Some(s"""
        WITH $shinglesCte,
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b,
               CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) >= 0.7"""),
      (s, dir) => Dedup.jaccardNearDup(Tables.load(s, dir, "documents"), 0.7)),

    // ---- MinHash-LSH near-dup (banded candidates, verified) ---------------
    QueryDef(
      "q_minhash_lsh",
      Some(s"""
        WITH $shinglesCte,
        sig AS (SELECT doc_id, i,
                  min(substr(md5(shingle || '#' || (i // 2)),
                             CAST(1 + 16 * (i % 2) AS BIGINT), 16)) AS sig
                FROM sh CROSS JOIN range(9) r(i) GROUP BY doc_id, i),
        band AS (SELECT doc_id, i // 3 AS band,
                   md5(min(CASE WHEN i % 3 = 0 THEN sig END) || ',' ||
                       min(CASE WHEN i % 3 = 1 THEN sig END) || ',' ||
                       min(CASE WHEN i % 3 = 2 THEN sig END)) AS bkey
                 FROM sig GROUP BY doc_id, i // 3),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM band a JOIN band b
                   ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  JOIN cand ON cand.doc_a = a.doc_id AND cand.doc_b = b.doc_id
                  GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b,
               CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) >= 0.7"""),
      (s, dir) => Dedup.minhashNearDup(
        Tables.load(s, dir, "documents"), 0.7, bands = 3, rowsPerBand = 3)),

    // ---- MARGIN-sized MinHash-LSH (recall-safe banding) -------------------
    // The (3,3) banding above is textbook-sized for threshold 0.7 — its
    // S-curve centers AT the threshold, so per-pair recall is ~88% at
    // j=0.8 (tools/MinhashCheck measured 7 misses in 2560 pairs at x10,
    // all at j 0.80-0.92, exactly on the curve). This query is the
    // recall-sensitive configuration the minhashNearDup contract
    // recommends: (16 bands x 4 rows) centers the curve at
    // (1/16)^(1/4) = 0.5, giving ~99% recall at j >= 0.7 (measured
    // 2560/2560 at x10) for 64 hashes — still ONE aggregation pass, the
    // same two shuffles, ~6.4x the signature arithmetic. The oracle
    // replays all 64 signatures and the 16-band bucketing exactly.
    QueryDef(
      "q_minhash_margin",
      Some(s"""
        WITH $shinglesCte,
        sig AS (SELECT doc_id, i,
                  min(substr(md5(shingle || '#' || (i // 2)),
                             CAST(1 + 16 * (i % 2) AS BIGINT), 16)) AS sig
                FROM sh CROSS JOIN range(64) r(i) GROUP BY doc_id, i),
        band AS (SELECT doc_id, i // 4 AS band,
                   md5(min(CASE WHEN i % 4 = 0 THEN sig END) || ',' ||
                       min(CASE WHEN i % 4 = 1 THEN sig END) || ',' ||
                       min(CASE WHEN i % 4 = 2 THEN sig END) || ',' ||
                       min(CASE WHEN i % 4 = 3 THEN sig END)) AS bkey
                 FROM sig GROUP BY doc_id, i // 4),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM band a JOIN band b
                   ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  JOIN cand ON cand.doc_a = a.doc_id AND cand.doc_b = b.doc_id
                  GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b,
               CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) AS jaccard
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) >= 0.7"""),
      (s, dir) => Dedup.minhashNearDup(
        Tables.load(s, dir, "documents"), 0.7, bands = 16, rowsPerBand = 4)),

    // ---- incremental near-dup: new batch vs existing corpus ---------------
    // Even doc_ids play the existing corpus, odd ids the arriving batch.
    // Same md5 LSH family as q_minhash_lsh, but candidates are batch x
    // corpus ONLY (never corpus x corpus — that work is already done),
    // and the corpus side is a PERSISTED DedupIndex (built once, probed
    // partition-pruned) — per-batch work is O(batch + candidates), never
    // O(corpus). The oracle replays the banding with the same split.
    QueryDef(
      "q_dedup_against",
      Some(dedupAgainstOracle),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val path = s.conf.get("spark.sql.warehouse.dir") + "/graft_dedup_index"
        DedupIndex.build(docs.where(col("doc_id") % 2 === 0), path)
        DedupIndex.searchAgainst(
          DedupIndex.load(s, path), docs.where(col("doc_id") % 2 === 1), 0.7)
      }),

    // ---- streaming near-dup-on-ingest vs the persisted index --------------
    // The recurring-crawl shape: arriving (odd-id) docs probe the static
    // even-id DedupIndex per microbatch. Stream ∪ batches == the batch
    // probe side, and each doc is scored against the same static index
    // regardless of its batch, so the result is pinned to the exact
    // q_dedup_against oracle.
    QueryDef(
      "q_stream_dedup_against",
      Some(dedupAgainstOracle),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val path = s.conf.get("spark.sql.warehouse.dir") + "/graft_dedup_index_s"
        DedupIndex.build(docs.where(col("doc_id") % 2 === 0), path)
        val idx = DedupIndex.load(s, path)
        val stream = Tables.documentsStream(s, dir)
        DedupIndex.nearDupOnIngest(
          stream.where(col("doc_id") % 2 === 1), idx, 0.7)
      }),

    // ---- duplicate-cluster resolution (keep-one-per-cluster) --------------
    // Spark computes true connected components (min-label fixpoint); the
    // oracle closes over 3 hops, exact because near-dup clusters are
    // near-cliques (verified: every member is within 1 hop of the min).
    // Oracle pairs replay the SAME (3,3) md5 LSH banding the operator
    // uses (sig/band/cand CTEs, identical to q_minhash_lsh) rather than
    // exact all-pairs Jaccard: the operator's documented semantics are
    // "clusters of LSH-verified pairs", and at x10 the two generators
    // legitimately differ by the known boundary pair the (3,3) S-curve
    // misses (round-14 x10 sweep caught the one-doc divergence; the
    // recall-safe generator is benched separately as q_minhash_margin).
    // Algorithm-INDEPENDENT verification is retained where exact==LSH:
    // tools.ClusterExactCheck (in gates.sh) re-derives both results
    // from exact all-pairs Jaccard + a from-scratch union-find at
    // sf0.01/sf0.1.
    QueryDef(
      "q_dup_clusters",
      Some(s"""
        WITH $shinglesCte,
        sig AS (SELECT doc_id, i,
                  min(substr(md5(shingle || '#' || (i // 2)),
                             CAST(1 + 16 * (i % 2) AS BIGINT), 16)) AS sig
                FROM sh CROSS JOIN range(9) r(i) GROUP BY doc_id, i),
        band AS (SELECT doc_id, i // 3 AS band,
                   md5(min(CASE WHEN i % 3 = 0 THEN sig END) || ',' ||
                       min(CASE WHEN i % 3 = 1 THEN sig END) || ',' ||
                       min(CASE WHEN i % 3 = 2 THEN sig END)) AS bkey
                 FROM sig GROUP BY doc_id, i // 3),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM band a JOIN band b
                   ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  JOIN cand ON cand.doc_a = a.doc_id AND cand.doc_b = b.doc_id
                  GROUP BY 1, 2),
        pairs AS (SELECT i.doc_a AS a, i.doc_b AS b
                  FROM inter i
                  JOIN sz sa ON sa.doc_id = i.doc_a
                  JOIN sz sb ON sb.doc_id = i.doc_b
                  WHERE CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) >= 0.7),
        e AS (SELECT a, b FROM pairs
              UNION ALL SELECT b, a FROM pairs
              UNION ALL SELECT doc_id, doc_id FROM documents),
        h1 AS (SELECT a, min(b) AS m FROM e GROUP BY a),
        h2 AS (SELECT e.a, min(h1.m) AS m FROM e JOIN h1 ON h1.a = e.b GROUP BY e.a),
        h3 AS (SELECT e.a, min(h2.m) AS m FROM e JOIN h2 ON h2.a = e.b GROUP BY e.a)
        SELECT a AS doc_id, m AS cluster_root, a = m AS keep FROM h3"""),
      (s, dir) => Dedup.duplicateClusters(Tables.load(s, dir, "documents"), 0.7)),

    // ---- keep-best-per-cluster dedup resolution ---------------------------
    // Same components as q_dup_clusters, but the kept member is the
    // LONGEST doc (alpha chars, ties to smaller id) — the resolution
    // real pipelines run. Oracle: 3-hop closure + relational score rank.
    // Same LSH-banding oracle pairs as q_dup_clusters (see note there).
    QueryDef(
      "q_dedup_keep_best",
      Some(s"""
        WITH $shinglesCte,
        sig AS (SELECT doc_id, i,
                  min(substr(md5(shingle || '#' || (i // 2)),
                             CAST(1 + 16 * (i % 2) AS BIGINT), 16)) AS sig
                FROM sh CROSS JOIN range(9) r(i) GROUP BY doc_id, i),
        band AS (SELECT doc_id, i // 3 AS band,
                   md5(min(CASE WHEN i % 3 = 0 THEN sig END) || ',' ||
                       min(CASE WHEN i % 3 = 1 THEN sig END) || ',' ||
                       min(CASE WHEN i % 3 = 2 THEN sig END)) AS bkey
                 FROM sig GROUP BY doc_id, i // 3),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM band a JOIN band b
                   ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  JOIN cand ON cand.doc_a = a.doc_id AND cand.doc_b = b.doc_id
                  GROUP BY 1, 2),
        pairs AS (SELECT i.doc_a AS a, i.doc_b AS b
                  FROM inter i
                  JOIN sz sa ON sa.doc_id = i.doc_a
                  JOIN sz sb ON sb.doc_id = i.doc_b
                  WHERE CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) >= 0.7),
        e AS (SELECT a, b FROM pairs
              UNION ALL SELECT b, a FROM pairs
              UNION ALL SELECT doc_id, doc_id FROM documents),
        h1 AS (SELECT a, min(b) AS m FROM e GROUP BY a),
        h2 AS (SELECT e.a, min(h1.m) AS m FROM e JOIN h1 ON h1.a = e.b GROUP BY e.a),
        h3 AS (SELECT e.a, min(h2.m) AS m FROM e JOIN h2 ON h2.a = e.b GROUP BY e.a),
        sc AS (SELECT doc_id,
                 CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS score
               FROM documents)
        SELECT h3.a AS doc_id, h3.m AS cluster_root, sc.score,
               row_number() OVER (PARTITION BY h3.m
                                  ORDER BY sc.score DESC, h3.a) = 1 AS keep
        FROM h3 JOIN sc ON sc.doc_id = h3.a"""),
      (s, dir) => Dedup.keepBestPerCluster(
        Tables.load(s, dir, "documents"), 0.7)),

    // ---- token statistics per language ------------------------------------
    QueryDef(
      "q_token_stats",
      Some("""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang"""),
      (s, dir) => Tables.load(s, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text"))).cast("long")).cast("bigint").as("total_tokens"),
          sum(col("n_chars")).cast("bigint").as("total_chars"))),

    // ---- language-ID heuristic (stopword n-gram scores) --------------------
    QueryDef(
      "q_langid",
      Some("""
        SELECT doc_id, s_en, s_de, s_fr, s_es,
               CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'other'
                    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS predicted
        FROM (SELECT doc_id,
                len(regexp_extract_all(lower(text), '\b(?:the|and|of|to|in)\b')) AS s_en,
                len(regexp_extract_all(lower(text), '\b(?:der|die|und|das|ist)\b')) AS s_de,
                len(regexp_extract_all(lower(text), '\b(?:le|la|et|les|des)\b')) AS s_fr,
                len(regexp_extract_all(lower(text), '\b(?:el|los|y|que|una)\b')) AS s_es
              FROM documents)"""),
      (s, dir) => {
        val scored = TextOps.LangStopwords.foldLeft(Tables.load(s, dir, "documents")) {
          case (df, (l, pat)) => df.withColumn(s"s_$l", TextOps.matchCount(col("text"), pat))
        }
        scored.select(
          col("doc_id"), col("s_en"), col("s_de"), col("s_fr"), col("s_es"),
          when(col("s_en") === 0 && col("s_de") === 0 && col("s_fr") === 0 && col("s_es") === 0, "other")
            .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
            .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
            .when(col("s_fr") >= col("s_es"), "fr")
            .otherwise("es").as("predicted"))
      }),

    // ---- quality scoring ----------------------------------------------------
    QueryDef(
      "q_quality",
      Some("""
        SELECT doc_id, n_tokens, alpha_chars,
               CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
               CAST(alpha_chars AS DOUBLE) / n_tokens AS mean_token_chars
        FROM (SELECT doc_id,
                len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
                len(regexp_extract_all(lower(text), '\b(?:the|and|of|to|in)\b')) AS n_stop,
                CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alpha_chars
              FROM documents)
        WHERE n_tokens > 0"""),
      (s, dir) => Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
          TextOps.matchCount(col("text"), TextOps.LangStopwords.head._2).as("n_stop"),
          length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).cast("long").as("alpha_chars"))
        .where(col("n_tokens") > 0)
        .select(
          col("doc_id"), col("n_tokens"), col("alpha_chars"),
          (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
          (col("alpha_chars").cast("double") / col("n_tokens")).as("mean_token_chars"))),

    // ---- hashed linear quality classifier (fastText hashing trick) --------
    // Unigram + adjacent-bigram features, each hashed straight to its
    // weight (md5-derived micro-units — the self-contained stand-in for
    // a trained bucket array; see TextOps.hashClassifier). Zero shuffles:
    // the whole scoring is one map-side projection over the scan.
    QueryDef(
      "q_quality_classifier",
      Some(s"""
        WITH $classifierCte
        SELECT t.doc_id,
               COALESCE(agg.n_features, 0) AS n_features,
               COALESCE(agg.score_micros, 0) AS score_micros,
               COALESCE(agg.score_micros, 0) > 0 AS keep
        FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id"""),
      (s, dir) => TextOps.hashClassifier(
        Tables.load(s, dir, "documents"))),

    // ---- TRAINED hashed classifier (naive-Bayes log-odds buckets) --------
    // The trained form of q_quality_classifier: bucket weights are FIT on
    // the even-doc_id half against the deterministic stopword-prose label
    // (event-level add-one NB log-odds in integer micro-units — the
    // dsirSelect recipe), then every document scores through the same
    // one-kernel-call-per-row plan with the learned array shipped as a
    // binary literal, and the keep threshold is CALIBRATED to the train
    // label rate on the per-feature score (globalRank picks the k-th
    // largest train value without a driver sort). Training cost: one
    // feature-bucket aggregation (<= 65536 rows out, bounded driver
    // collect) + one rank pass; scoring: zero shuffles. The oracle refits
    // the same weights and threshold from scratch in SQL and replays
    // every score bit-for-bit. ClassifierTrainSpec holds the accuracy
    // gate: the trained keep-set beats the hash-weight strawman on
    // held-out docs.
    QueryDef(
      "q_classifier_trained",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
                     len(regexp_extract_all(lower(text),
                         '\b(?:the|and|of|to|in)\b')) * 20
                       >= len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS pos
                   FROM documents),
        feat AS (
          SELECT doc_id, pos, unnest(toks) AS f FROM t
          UNION ALL
          SELECT doc_id, pos, toks[i] || ' ' || toks[i + 1] AS f
          FROM t, unnest(range(1, len(toks))) AS r(i)
          WHERE len(toks) >= 2),
        bf AS (SELECT doc_id, pos,
                 ('0x' || substr(md5(f), 1, 8))::BIGINT % 65536 AS b
               FROM feat),
        cnt AS (SELECT b,
                  sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
                  sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cneg
                FROM bf WHERE doc_id % 2 = 0 GROUP BY b),
        tot AS (SELECT sum(cpos) AS npos, sum(cneg) AS nneg FROM cnt),
        w AS (SELECT b,
                CAST(round((ln((cpos + 1.0) / (npos + 65536.0))
                  - ln((cneg + 1.0) / (nneg + 65536.0))) * 1e6, 0) AS BIGINT)
                  AS w
              FROM cnt, tot),
        w0 AS (SELECT CAST(round((ln(1.0 / (npos + 65536.0))
                 - ln(1.0 / (nneg + 65536.0))) * 1e6, 0) AS BIGINT) AS w0
               FROM tot),
        sc AS (SELECT bf.doc_id,
                 count(*) AS n_features,
                 CAST(sum(COALESCE(w.w, (SELECT w0 FROM w0))) AS BIGINT)
                   AS score_micros
               FROM bf LEFT JOIN w ON w.b = bf.b
               GROUP BY bf.doc_id),
        alldocs AS (SELECT t.doc_id, t.pos,
                      COALESCE(sc.n_features, 0) AS n_features,
                      COALESCE(sc.score_micros, 0) AS score_micros
                    FROM t LEFT JOIN sc ON sc.doc_id = t.doc_id),
        vms AS (SELECT *, CASE WHEN n_features > 0
                  THEN CAST(round(score_micros * 1000.0 / n_features, 0)
                            AS BIGINT)
                  ELSE 0 END AS vm
                FROM alldocs),
        k AS (SELECT count(*) AS k FROM vms WHERE pos AND doc_id % 2 = 0),
        thr AS (SELECT vm AS thr FROM
                  (SELECT vm, row_number()
                     OVER (ORDER BY vm DESC, doc_id) AS rnk
                   FROM vms WHERE doc_id % 2 = 0) q, k
                WHERE q.rnk = k.k)
        SELECT doc_id, n_features, score_micros,
               vm > COALESCE((SELECT thr FROM thr), 9223372036854775807)
                 AS keep
        FROM vms"""),
      // The COALESCE matches the engine's k=0 branch: a zero-positive
      // train half leaves thr empty, and the engine keeps nothing
      // (thr = Long.MaxValue) — without it every oracle keep is NULL.
      (s, dir) => TextOps.trainedClassifier(
        Tables.load(s, dir, "documents"))),

    // ---- percentile calibration: corpus-wide rank of the score ----------
    // The "keep the top X%" primitive: classifier scores ranked across
    // the whole corpus WITHOUT a global-sort window (MixOps.globalRank —
    // bucket offsets + within-bucket row_number). The oracle runs the
    // textbook single global window; the hash gate proves the
    // decomposition exactly equal.
    QueryDef(
      "q_rank_calibrate",
      Some(s"""
        WITH $classifierCte,
        sc AS (SELECT t.doc_id, COALESCE(agg.score_micros, 0) AS score
               FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id)
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                 AS BIGINT) AS rnk
        FROM sc"""),
      (s, dir) => graft.ext.MixOps.globalRank(
        TextOps.hashClassifier(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), col("score_micros").as("score")))),

    // ---- BPE-style merge-loop tokenizer training ---------------------------
    // Three greedy merge iterations at word granularity (see
    // TextOps.bpeMergeLoop): each oracle iteration re-derives the argmax
    // pair and replays the double-pass rewrite string-for-string; the
    // per-doc merged_fp pins every rewrite byte-for-byte.
    QueryDef(
      "q_bpe_merges",
      Some {
        s"""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        s0 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_before,
                 '|' || array_to_string(toks, '|') || '|' AS st
               FROM t),
        ${bpeIterSql(1, "count(*)", "doc_id, n_before")},
        ${bpeIterSql(2, "count(*)", "doc_id, n_before")},
        ${bpeIterSql(3, "count(*)", "doc_id, n_before")}
        SELECT doc_id, n_before,
               CAST(len(list_filter(string_split(st, '|'), x -> x <> ''))
                 AS BIGINT) AS n_after,
               md5(st) AS merged_fp
        FROM s3"""
      },
      (s, dir) => TextOps.bpeMergeLoop(
        Tables.load(s, dir, "documents"), k = 3)),

    // ---- SUBWORD BPE merge loop (character granularity) ------------------
    // The real tokenizer-training form of the merge loop (see
    // TextOps.bpeSubwordTrain): the corpus collapses to its (word, freq)
    // vocabulary, words split to character symbols + '</w>', and six
    // freq-weighted greedy merges run. The oracle replays each argmax and
    // double-pass rewrite string-for-string on the same vocabulary;
    // BpeSubwordSpec pins the textbook Sennrich merge sequence on the
    // canonical low/lower/newest/widest fixture.
    QueryDef(
      "q_bpe_subword",
      Some {
        s"""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        wf AS (SELECT word, count(*) AS freq
               FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
        s0 AS (SELECT word, freq,
                 '|' || regexp_replace(word, '(.)', '\\1|', 'g') || '</w>|'
                   AS st
               FROM wf),
        ${(1 to 6).map(bpeIterSql(_, "sum(freq)", "word, freq"))
          .mkString(",")}
        SELECT word, freq,
               CAST(len(list_filter(string_split(st, '|'), x -> x <> ''))
                 AS BIGINT) AS n_syms,
               st
        FROM s6"""
      },
      (s, dir) => TextOps.bpeSubwordLoop(
        Tables.load(s, dir, "documents"), k = 6)),

    // ---- BPE ENCODE: apply the learned merges to every document ----------
    // The apply half of the tokenizer (see TextOps.bpeEncode): the oracle
    // re-derives the 6 merges on the vocabulary (same chain as
    // q_bpe_subword), then replays them in order on each document's
    // concatenated symbol stream. No join on either side — merge patterns
    // cannot span the '||' word boundary — so per-doc enc_fp pins every
    // rewrite byte-for-byte.
    QueryDef(
      "q_bpe_encode",
      Some {
        s"""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        wf AS (SELECT word, count(*) AS freq
               FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
        s0 AS (SELECT word, freq,
                 '|' || regexp_replace(word, '(.)', '\\1|', 'g') || '</w>|'
                   AS st
               FROM wf),
        ${(1 to 6).map(bpeIterSql(_, "sum(freq)", "word, freq"))
          .mkString(",")},
        d0 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                 array_to_string(list_transform(toks,
                   x -> '|' || regexp_replace(x, '(.)', '\\1|', 'g')
                     || '</w>|'), '') AS st
               FROM t),
        ${(1 to 6).map(bpeApplySql(_, "doc_id, n_tokens")).mkString(",")}
        SELECT doc_id, n_tokens,
               CAST(len(list_filter(string_split(st, '|'), x -> x <> ''))
                 AS BIGINT) AS n_subtokens,
               md5(st) AS enc_fp
        FROM d6"""
      },
      (s, dir) => TextOps.bpeEncode(
        Tables.load(s, dir, "documents"), k = 6)),

    // ---- vocabulary coverage / OOV-rate scoring ---------------------------
    // Top-16 tokens by corpus frequency (ties by token) become the
    // (the synthetic corpus has only 31 distinct tokens, so 16 is the
    // size at which coverage actually bites at every scale factor);
    // vocab; every doc is scored by its out-of-vocabulary token rate —
    // the tokenizer-coverage check run before committing to a vocab.
    // The engine scores via the broadcast set-membership kernel; the
    // oracle rebuilds vocab + scoring relationally. All-integer counts.
    QueryDef(
      "q_vocab_oov",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM t WHERE len(toks) > 0),
        cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        v AS (SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT 16),
        s AS (SELECT k.doc_id, count(*) AS n_tokens, count(v.tok) AS in_vocab
              FROM tok k LEFT JOIN v ON k.tok = v.tok GROUP BY k.doc_id)
        SELECT doc_id, n_tokens, n_tokens - in_vocab AS n_oov,
               CAST(n_tokens - in_vocab AS DOUBLE) / n_tokens AS oov_rate
        FROM s"""),
      (s, dir) => TextOps.vocabCoverage(
        Tables.load(s, dir, "documents"), 16)),

    // ---- multimodal metadata (binary payload plumbing, oracle-checkable) ---
    QueryDef(
      "q_mm_meta",
      Some("""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               CAST(length(text) AS BIGINT) AS n_cp,
               octet_length(CAST(text AS BLOB)) = length(text) AS is_ascii
        FROM documents"""),
      (s, dir) => Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          length(col("text")).cast("long").as("n_cp"),
          (octet_length(col("text")) === length(col("text"))).as("is_ascii"))),

    // ---- video container metadata (REAL MP4/MOV box walk + magic sniff) ---
    // The container column is the magic-number sniff, replayed by the
    // oracle from hex(payload) with the IDENTICAL prefix/precedence
    // chain; the MP4 columns (duration from mvhd timescale/duration,
    // trak count, tkhd 16.16 display dims) come from the real ISO BMFF
    // box walk, spec-pinned in MultimodalMp4Spec against byte-assembled
    // boxes. On this corpus no payload sniffs as MP4 (verified 0 'ftyp'
    // at offset 4 across sf0.001-0.1 AND x10/x100), and prose cannot
    // contain a parseable moov/mvhd, so the oracle's NULLs are exact.
    QueryDef(
      "q_mm_video_meta",
      Some(s"""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        SELECT doc_id,$sniffCaseSql,
               CAST(NULL AS BIGINT) AS duration_ms,
               CAST(NULL AS BIGINT) AS n_tracks,
               CAST(NULL AS BIGINT) AS width,
               CAST(NULL AS BIGINT) AS height,
               CAST(NULL AS BIGINT) AS n_samples,
               CAST(NULL AS BIGINT) AS sample_bytes,
               CAST(NULL AS BIGINT) AS bitrate_bps,
               CAST(NULL AS BIGINT) AS n_chunks,
               CAST(NULL AS BIGINT) AS chunk_span_bytes,
               CAST(NULL AS VARCHAR) AS codecs,
               CAST(NULL AS VARCHAR) AS codec_params
        FROM b"""),
      (s, dir) => Multimodal.containerMeta(
        Multimodal.documentsAsMedia(Tables.load(s, dir, "documents")))),

    // ---- audio container metadata (REAL MP3 frame-header walk) ------------
    // The audio sibling of q_mm_video_meta: same shared sniff CASE
    // (oracle-replayed from hex(payload) — the mp3 rows fire for 'ID3'
    // prefixes and bare FF Ex/Fx frame syncs), real MPEG-audio
    // frame-walk facts (frame count, duration, mean bitrate, VBR flag)
    // for payloads that parse, real PCM header facts for WAVs. On this
    // corpus no payload parses (0xFF cannot open UTF-8 prose; an 'ID3'
    // text prefix still needs a valid frame sync after the declared
    // synchsafe tag length), so the oracle's NULLs are exact — the real
    // path is spec-pinned in MultimodalMp3Spec on byte-assembled
    // frames, the q_mm_audio pattern.
    QueryDef(
      "q_mm_audio_meta",
      Some(s"""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        SELECT doc_id,$sniffCaseSql,
               CAST(NULL AS BIGINT) AS duration_ms,
               CAST(NULL AS BIGINT) AS n_frames,
               CAST(NULL AS BIGINT) AS bitrate_bps,
               CAST(NULL AS BOOLEAN) AS vbr,
               CAST(NULL AS BIGINT) AS xing_frames
        FROM b"""),
      (s, dir) => Multimodal.audioMeta(
        Multimodal.documentsAsMedia(Tables.load(s, dir, "documents")))),

    // ---- winnowing fingerprints (MOSS), md5-portable, full oracle ---------
    // Rolling-window document fingerprinting: hash every 8-char gram of
    // the whitespace-free normalized text, keep the min of each 4-hash
    // window (distinct), pair documents by shared fingerprints, score by
    // normalized overlap |A^B|/min(|A|,|B|). Near-dups land at >= 0.9,
    // the next pair at 0.57 corpus-wide, so threshold 0.7 is exact here.
    // The engine generates candidates with the recall-1 rarest-first
    // prefix filter (no df cap — the round-7 corpus-relative cap's
    // Σ df² join volume measured ~linear-in-corpus at x10, and any cap
    // either loses pairs or pays that), so the oracle is the plain
    // UNCAPPED all-pairs replay: the filter is lossless, not
    // approximate. All counts are integers so the one final division
    // matches bit-for-bit.
    QueryDef(
      "q_winnow_neardup",
      Some("""
        WITH nt AS (SELECT doc_id,
                      array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), '') AS s
                    FROM documents),
        g AS (SELECT doc_id, list_transform(range(1, len(s) - 8 + 2),
                i -> CAST(('0x' || substr(md5(substr(s, CAST(i AS BIGINT), 8)), 1, 8)) AS BIGINT)) AS hs
              FROM nt WHERE len(s) >= 8),
        w AS (SELECT doc_id, list_distinct(list_transform(range(1, len(hs) - 4 + 2),
                j -> list_min(hs[CAST(j AS BIGINT):CAST(j + 3 AS BIGINT)]))) AS fps
              FROM g WHERE len(hs) >= 4),
        fp AS (SELECT doc_id, unnest(fps) AS fp FROM w),
        nf AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY 1),
        sh2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               round(CAST(c AS DOUBLE) / least(na.n, nb.n), 6) AS overlap
        FROM sh2
        JOIN nf na ON na.doc_id = sh2.doc_a
        JOIN nf nb ON nb.doc_id = sh2.doc_b
        WHERE CAST(c AS DOUBLE) / least(na.n, nb.n) >= 0.7"""),
      (s, dir) => Dedup.winnowNearDup(
        Tables.load(s, dir, "documents"), 0.7)),

    // Rolling-hash (Karp-Rabin) winnowing — O(len) hashing instead of
    // md5's O(len*k), the 100 TB fingerprinting path. Hash values are
    // engine-specific, so the gate emits the md5-portable pairs as the
    // hash-checked ground truth plus an aggregate agreement boolean
    // (Dedup.winnowRecallGate).
    QueryDef(
      "q_winnow_fast",
      Some("""
        WITH nt AS (SELECT doc_id,
                      array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'), '') AS s
                    FROM documents),
        g AS (SELECT doc_id, list_transform(range(1, len(s) - 8 + 2),
                i -> CAST(('0x' || substr(md5(substr(s, CAST(i AS BIGINT), 8)), 1, 8)) AS BIGINT)) AS hs
              FROM nt WHERE len(s) >= 8),
        w AS (SELECT doc_id, list_distinct(list_transform(range(1, len(hs) - 4 + 2),
                j -> list_min(hs[CAST(j AS BIGINT):CAST(j + 3 AS BIGINT)]))) AS fps
              FROM g WHERE len(hs) >= 4),
        fp AS (SELECT doc_id, unnest(fps) AS fp FROM w),
        nf AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY 1),
        sh2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
        SELECT doc_a, doc_b, true AS recall_ok
        FROM sh2
        JOIN nf na ON na.doc_id = sh2.doc_a
        JOIN nf nb ON nb.doc_id = sh2.doc_b
        WHERE CAST(c AS DOUBLE) / least(na.n, nb.n) >= 0.7"""),
      (s, dir) => Dedup.winnowRecallGate(
        Tables.load(s, dir, "documents"), 0.7)),

    // ---- SimHash (portable md5 bit source, full oracle) -------------------
    // 64-bit SimHash over distinct 3-gram shingles; bit b of the signature
    // is the sign of the vote sum over shingles of bit b of md5(shingle)
    // (hex digit b/4, bit b%4). Bit 63's contribution is Long.MinValue on
    // both sides (DuckDB rejects 1::BIGINT << 63, so the oracle spells the
    // two's-complement value out).
    QueryDef(
      "q_simhash",
      Some(s"""
        WITH $shinglesCte,
        md AS (SELECT doc_id, md5(shingle) AS m FROM sh),
        dig AS (SELECT doc_id, i, ('0x' || substr(m, CAST(i+1 AS BIGINT), 1))::INT AS dv
                FROM md, range(16) r(i)),
        bits AS (SELECT doc_id, i*4 + b AS bit, ((dv >> b) & 1)*2 - 1 AS vote
                 FROM dig, range(4) rb(b)),
        v AS (SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY 1, 2)
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN
                 CASE WHEN bit = 63 THEN -9223372036854775807 - 1
                      ELSE 1::BIGINT << CAST(bit AS INT) END
                 ELSE 0 END) AS BIGINT) AS simhash
        FROM v GROUP BY doc_id"""),
      (s, dir) => Dedup.simhashPortable(Tables.load(s, dir, "documents"))),

    // ---- multimodal feature extraction (stub decoder, full oracle) --------
    // The decode step is a deterministic byte-level stub (no codecs in the
    // container — graft.ext.Multimodal.decodeStub), which makes it fully
    // ANSI-expressible: DuckDB re-derives width/height/per-bucket byte
    // means from hex(encode(text)). Bucket means are exact on both sides:
    // integer byte sums stay < 2^53, so double accumulation order is
    // irrelevant, and the single final division uses identical operands.
    QueryDef(
      "q_mm_features",
      Some {
        val fCols = (0 until Multimodal.featureDim).map { j =>
          s"COALESCE(CAST(sum(CASE WHEN bkt=$j THEN byte END) AS DOUBLE)" +
            s"/NULLIF(count(CASE WHEN bkt=$j THEN 1 END),0), 0.0) AS f$j"
        }.mkString(",\n                ")
        val fSel = (0 until Multimodal.featureDim)
          .map(j => s"COALESCE(f.f$j, 0.0) AS f$j").mkString(", ")
        s"""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                          octet_length(encode(text)) AS n
                   FROM documents),
        e AS (SELECT doc_id, hx, n, unnest(range(n)) AS i FROM b),
        v AS (SELECT doc_id, i % ${Multimodal.featureDim} AS bkt,
                     ('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2))::INT AS byte
              FROM e),
        f AS (SELECT doc_id,
                $fCols
              FROM v GROUP BY doc_id)
        SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_bytes,
               16 + CASE WHEN b.n >= 1 THEN ('0x' || substr(b.hx,1,2))::INT & 63 ELSE 0 END AS width,
               16 + CASE WHEN b.n >= 2 THEN ('0x' || substr(b.hx,3,2))::INT & 63 ELSE 0 END AS height,
               $fSel,
               FALSE AS decoded
        FROM b LEFT JOIN f USING (doc_id)"""
      },
      (s, dir) => {
        val feats = Multimodal.extractFeatures(
          Multimodal.documentsAsMedia(Tables.load(s, dir, "documents")))
        feats.select(
          (Seq(col("doc_id"), col("n_bytes"), col("width"), col("height")) ++
            (0 until Multimodal.featureDim).map(j =>
              element_at(col("features"), j + 1).as(s"f$j"))
            :+ col("decoded")): _*)
      }),

    // ---- multimodal audio features (stub contract, full oracle) -----------
    // The audio sibling of q_mm_features: same partition-parallel binary
    // plumbing, REAL javax.sound.sampled decode for WAV payloads (pinned
    // in ExtOpsSpec with in-test generated PCM), deterministic byte-level
    // stub for this corpus's text payloads — every stub quantity is
    // integer arithmetic until one final scale/divide, so DuckDB
    // reproduces rms/peak/zcr/dc bit-for-bit from hex(payload).
    QueryDef(
      "q_mm_audio",
      Some("""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                          octet_length(encode(text)) AS n
                   FROM documents),
        e AS (SELECT doc_id, n, hx, unnest(range(n)) AS i FROM b),
        s AS (SELECT doc_id, n, i,
                CASE WHEN ('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2))::INT >= 128
                     THEN ('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2))::INT - 256
                     ELSE ('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2))::INT END AS sb
              FROM e),
        l AS (SELECT doc_id, n, sb,
                lag(sb) OVER (PARTITION BY doc_id ORDER BY i) AS prev
              FROM s),
        a AS (SELECT doc_id, any_value(n) AS n, sum(sb*sb) AS ss, sum(sb) AS sm,
                     max(abs(sb)) AS pk,
                     count(CASE WHEN sb * prev < 0 THEN 1 END) AS zc
              FROM l GROUP BY doc_id)
        SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
               CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
               CAST(n AS BIGINT) AS n_frames,
               CAST(n AS DOUBLE) / 8000.0 AS duration_s,
               sqrt(CAST(ss AS DOUBLE) / (16384.0 * n)) AS rms,
               CAST(pk AS DOUBLE) / 128.0 AS peak,
               CASE WHEN n > 1 THEN CAST(zc AS DOUBLE) / (n - 1) ELSE 0.0 END AS zcr,
               CAST(sm AS DOUBLE) / (128.0 * n) AS dc,
               FALSE AS decoded
        FROM a"""),
      (s, dir) => Multimodal.extractAudioFeatures(
        Multimodal.documentsAsMedia(Tables.load(s, dir, "documents")))),

    // ---- video frame sampling (cardinality-changing multimodal op) --------
    // One payload row explodes into its stride-sampled frame rows inside
    // mapPartitions (stride 3 = 30 native fps -> 10 target). Frames are
    // deterministic 64-byte windows (honest stub — no video codecs in
    // the container), so the oracle reproduces frames AND the per-frame
    // mean byte exactly via blob slicing + hex arithmetic.
    QueryDef(
      "q_mm_frames",
      Some("""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS px,
                          octet_length(encode(text)) AS n
                   FROM documents),
        f AS (SELECT doc_id, px, CAST(unnest(range((n + 63) // 64)) AS BIGINT)
                       AS frame_idx
              FROM b),
        g AS (SELECT doc_id, frame_idx, frame_idx * 1000 // 30 AS ts_ms,
                     unhex(substr(px, frame_idx * 128 + 1, 128)) AS frame
              FROM f WHERE frame_idx % 3 = 0),
        h AS (SELECT doc_id, frame_idx, hex(frame) AS hx,
                     octet_length(frame) AS fl
              FROM g),
        e AS (SELECT doc_id, frame_idx, hx, unnest(range(fl)) AS k FROM h),
        s AS (SELECT doc_id, frame_idx,
                     sum(('0x' || substr(hx, CAST(2 * k + 1 AS BIGINT), 2))::INT) AS sm
              FROM e GROUP BY 1, 2)
        SELECT g.doc_id, g.frame_idx, g.ts_ms, hex(g.frame) AS frame_hex,
               CAST(s.sm AS DOUBLE) / octet_length(g.frame) AS mean_byte
        FROM g JOIN s ON s.doc_id = g.doc_id AND s.frame_idx = g.frame_idx"""),
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.documentsAsMedia(Tables.load(s, dir, "documents")),
        targetFps = 10)
        // the operator's frame column is BINARY (the real payload shape);
        // the gate compares its hex image — bytes round-trip through
        // parquet/duckdb as engine-specific object types the hash
        // comparator has no portable ordering for
        .select(col("doc_id"), col("frame_idx"), col("ts_ms"),
          hex(col("frame")).as("frame_hex"), col("mean_byte"))),

    // ---- perceptual-hash image dedup (aHash + banded hamming) -------------
    // Image near-dup via 64-bit average hash: real pixel path for
    // decodable images, integer-exact byte-bucket stub for this corpus's
    // text payloads — cross-multiplied threshold comparisons keep the
    // stub all-integer, so DuckDB reproduces every BIT from
    // hex(payload). Candidates come from four 16-bit hash bands
    // (pigeonhole recall 1 at hamming <= 3); the oracle replays the hash
    // per doc AND the same four-band candidate generation (identical
    // result set by pigeonhole — hamming <= 3 across 4 bands leaves at
    // least one band equal — but linear in candidates instead of the
    // all-pairs bitwise compare, whose 64x|docs|^2 intermediate blew the
    // x10 sweep's replay budget). All 25 of the
    // corpus's text near-dup pairs land at hamming <= 3 (measured 14 at
    // 0, 7 at 1, 2 at 2, 2 at 3), while unrelated payloads concentrate
    // at ~32 — the aHash sees through the tail edits that preserve byte
    // positions.
    QueryDef(
      "q_mm_phash",
      Some("""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                          octet_length(encode(text)) AS n
                   FROM documents),
        e AS (SELECT doc_id, n, unnest(range(n)) AS i, hx FROM b),
        v AS (SELECT doc_id, CAST(i % 64 AS BIGINT) AS cell,
                     ('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2))::BIGINT AS byte
              FROM e),
        t AS (SELECT doc_id, sum(byte) AS ts, count(*) AS tc FROM v GROUP BY doc_id),
        c AS (SELECT doc_id, cell, sum(byte) AS cs, count(*) AS cc
              FROM v GROUP BY doc_id, cell),
        cells AS (SELECT doc_id, unnest(range(64)) AS cell FROM b WHERE n > 0),
        bits AS (SELECT cells.doc_id, cells.cell,
                   CASE WHEN COALESCE(c.cs, 0) * t.tc > t.ts * COALESCE(c.cc, 0)
                        THEN 1 ELSE 0 END AS bit
                 FROM cells
                 JOIN t ON t.doc_id = cells.doc_id
                 LEFT JOIN c ON c.doc_id = cells.doc_id AND c.cell = cells.cell),
        bands AS (SELECT doc_id, cell // 16 AS band,
                         sum(bit << CAST(cell % 16 AS INT)) AS bval
                  FROM bits GROUP BY 1, 2),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
                 FROM bands a JOIN bands b2
                   ON a.band = b2.band AND a.bval = b2.bval
                      AND a.doc_id < b2.doc_id),
        ham AS (SELECT c.doc_a, c.doc_b,
                       sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hamming
                FROM cand c
                JOIN bits x ON x.doc_id = c.doc_a
                JOIN bits y ON y.doc_id = c.doc_b AND y.cell = x.cell
                GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        FROM ham WHERE hamming <= 3"""),
      (s, dir) => Multimodal.phashNearDup(
        Multimodal.documentsAsMedia(Tables.load(s, dir, "documents")))),

    // ---- band-energy audio fingerprint dedup (the audio modality) ---------
    // Audio near-dup via 64-bit band-energy fingerprint — the q_mm_phash
    // pattern completing the dedup modality matrix: real sample-energy
    // path for decodable WAVs (spec-pinned in ExtOpsSpec on synthesized
    // PCM), integer-exact signed-byte-energy stub for this corpus's text
    // payloads — cross-multiplied threshold comparisons keep the stub
    // all-integer (sb² <= 16384, sums < 2^53), so DuckDB reproduces
    // every BIT from hex(payload). Candidates come from four 16-bit
    // fingerprint bands (pigeonhole recall 1 at hamming <= 3); the
    // oracle replays the fingerprint AND the same four-band candidate
    // generation (identical result set by pigeonhole, linear in
    // candidates instead of all-pairs — the q_mm_phash argument). All
    // 25 of the corpus's near-dup pairs land at hamming <= 3 (measured
    // 11 at 0, 11 at 1, 2 at 2, 1 at 3) with nothing in (3, 8] — the
    // energy fingerprint sees through tail edits exactly like the
    // byte-mean aHash, while unrelated payloads concentrate at ~32.
    QueryDef(
      "q_audio_fp",
      Some("""
        WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                          octet_length(encode(text)) AS n
                   FROM documents),
        e AS (SELECT doc_id, n, unnest(range(n)) AS i, hx FROM b),
        v AS (SELECT doc_id, CAST(i % 64 AS BIGINT) AS cell,
                     CASE WHEN ('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2))::INT >= 128
                          THEN ('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2))::INT - 256
                          ELSE ('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2))::INT
                     END AS sb
              FROM e),
        w AS (SELECT doc_id, cell, CAST(sb AS BIGINT) * sb AS en FROM v),
        t AS (SELECT doc_id, sum(en) AS ts, count(*) AS tc FROM w GROUP BY doc_id),
        c AS (SELECT doc_id, cell, sum(en) AS cs, count(*) AS cc
              FROM w GROUP BY doc_id, cell),
        cells AS (SELECT doc_id, unnest(range(64)) AS cell FROM b WHERE n > 0),
        bits AS (SELECT cells.doc_id, cells.cell,
                   CASE WHEN COALESCE(c.cs, 0) * t.tc > t.ts * COALESCE(c.cc, 0)
                        THEN 1 ELSE 0 END AS bit
                 FROM cells
                 JOIN t ON t.doc_id = cells.doc_id
                 LEFT JOIN c ON c.doc_id = cells.doc_id AND c.cell = cells.cell),
        bands AS (SELECT doc_id, cell // 16 AS band,
                         sum(bit << CAST(cell % 16 AS INT)) AS bval
                  FROM bits GROUP BY 1, 2),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
                 FROM bands a JOIN bands b2
                   ON a.band = b2.band AND a.bval = b2.bval
                      AND a.doc_id < b2.doc_id),
        ham AS (SELECT c.doc_a, c.doc_b,
                       sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hamming
                FROM cand c
                JOIN bits x ON x.doc_id = c.doc_a
                JOIN bits y ON y.doc_id = c.doc_b AND y.cell = x.cell
                GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        FROM ham WHERE hamming <= 3"""),
      (s, dir) => Multimodal.audioFpNearDup(
        Multimodal.documentsAsMedia(Tables.load(s, dir, "documents")))),

    // ---- repetition signals (Gopher/MassiveText filters) ------------------
    // Top word-2-gram char fraction + duplicated word-3-gram char
    // fraction per doc. Engine side is ONE kernel call per row (no
    // explode/shuffle/window — graft_repetition_stats); the oracle
    // rebuilds the n-gram frequency tables relationally. Tie-break for
    // the top 2-gram is (count DESC, gram ASC) on both sides.
    QueryDef(
      "q_repetition_chars",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
                     CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alpha_chars
                   FROM documents),
        base AS (SELECT doc_id, toks, alpha_chars,
                        CAST(len(toks) AS BIGINT) AS n_tokens
                 FROM t WHERE len(toks) >= 3),
        g2 AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                   i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1))) AS gram
               FROM base),
        c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram),
        top2 AS (SELECT doc_id, gram AS top2_gram, CAST(cnt AS BIGINT) AS top2_cnt
                 FROM (SELECT doc_id, gram, cnt,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY cnt DESC, gram) AS rn
                       FROM c2) WHERE rn = 1),
        g3 AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks) - 1),
                   i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                        || ' ' || list_extract(toks, i + 2))) AS gram
               FROM base),
        c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY doc_id, gram),
        d3 AS (SELECT doc_id,
                 CAST(sum(cnt * (length(gram) - 2)) AS BIGINT) AS dup3_chars
               FROM c3 WHERE cnt > 1 GROUP BY doc_id)
        SELECT b.doc_id, b.n_tokens, b.alpha_chars,
               top2.top2_gram, top2.top2_cnt,
               CAST(top2.top2_cnt * (length(top2.top2_gram) - 1) AS DOUBLE)
                 / b.alpha_chars AS top2_frac,
               COALESCE(d3.dup3_chars, 0) AS dup3_chars,
               CAST(COALESCE(d3.dup3_chars, 0) AS DOUBLE) / b.alpha_chars AS dup3_frac
        FROM base b
        JOIN top2 USING (doc_id)
        LEFT JOIN d3 USING (doc_id)"""),
      (s, dir) => TextOps.repetitionSignals(Tables.load(s, dir, "documents"))),

    // ---- char-trigram LM scoring (CCNet-style corpus-fit filter) ----------
    // rare_rate = fraction of trigram positions whose trigram has corpus
    // relative frequency <= 1/2000. Engine side: bounded-key model agg +
    // broadcast common-set membership kernel (structurally <= 2000
    // entries at any scale); oracle rebuilds model + scoring
    // relationally. All-integer until the final division.
    QueryDef(
      "q_trigram_lm",
      Some("""
        WITH d AS (SELECT doc_id, lower(text) AS s FROM documents),
        p AS (SELECT doc_id,
                unnest(list_transform(range(1, length(s) - 1),
                  i -> substring(s, CAST(i AS INT), 3))) AS tri
              FROM d),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM p),
        c AS (SELECT tri, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY tri),
        com AS (SELECT tri FROM c, tot WHERE cnt * 2000 > total),
        sc AS (SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_tri,
                      CAST(count(com.tri) AS BIGINT) AS n_common
               FROM p LEFT JOIN com ON p.tri = com.tri GROUP BY p.doc_id)
        SELECT doc_id, n_tri, n_tri - n_common AS n_rare,
               CAST(n_tri - n_common AS DOUBLE) / n_tri AS rare_rate
        FROM sc"""),
      (s, dir) => TextOps.trigramRareRate(
        Tables.load(s, dir, "documents"), relDenom = 2000L))
  )
}
