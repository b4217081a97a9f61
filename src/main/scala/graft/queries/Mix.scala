package graft.queries

import graft.ext.{MixOps, PipelineOps}
import graft.sources.Tables

/** Corpus-assembly queries (SURVEY.md §2.9): deterministic shuffle +
  * sharding, concat-and-chunk context packing, temperature-sampled data
  * mixing, within-doc repetition filtering, URL/domain hygiene. Oracle
  * SQL mirrors the Spark expressions operation-for-operation; everything
  * is integer/md5 arithmetic except the documented IEEE-exact divisions.
  */
object Mix {

  private val NShards = 8
  private val Budget = 512
  private val MixK = 2

  /** Blocklist for the URL-hygiene demo: every 7th injected site. */
  val Blocklist: Seq[String] =
    (0 until 50 by 7).map(i => s"site$i.example.com")

  val defs: Seq[QueryDef] = Seq(

    // ---- deterministic corpus shuffle + shard assignment -------------------
    // md5(doc_id:text) IS the reproducible random order; shard = first 8
    // hex digits mod 8; pos = md5 rank within the shard. One shuffle, no
    // global sort — shards are independent units, as on disk.
    QueryDef(
      "q_shard",
      Some(s"""
        WITH s AS (SELECT doc_id,
                     md5(CAST(doc_id AS VARCHAR) || ':' || text) AS m
                   FROM documents),
        h AS (SELECT doc_id, m,
                ('0x' || substr(m, 1, 8))::BIGINT % $NShards AS shard
              FROM s)
        SELECT doc_id, shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY m, doc_id)
                 AS INT) AS pos
        FROM h"""),
      (s, dir) => MixOps.shardAssign(
        Tables.load(s, dir, "documents"), NShards)),

    // ---- concat-and-chunk context packing ----------------------------------
    // Documents laid out in shuffle order within each shard; the
    // concatenated token stream is cut into 512-token context windows.
    // All integer arithmetic (cum sums, div) — engine-exact by type.
    QueryDef(
      "q_pack",
      Some(s"""
        WITH s AS (SELECT doc_id,
                     md5(CAST(doc_id AS VARCHAR) || ':' || text) AS m,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS n_tokens
                   FROM documents),
        h AS (SELECT doc_id, m, n_tokens,
                ('0x' || substr(m, 1, 8))::BIGINT % $NShards AS shard
              FROM s WHERE n_tokens > 0),
        c AS (SELECT doc_id, shard, n_tokens,
                CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY m, doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM h)
        SELECT doc_id, shard, n_tokens,
               (cum - n_tokens) // $Budget AS start_ctx,
               (cum - 1) // $Budget AS end_ctx,
               (cum - 1) // $Budget - (cum - n_tokens) // $Budget + 1 AS n_ctxs
        FROM c"""),
      (s, dir) => MixOps.packContexts(
        Tables.load(s, dir, "documents"), NShards, Budget)),

    // ---- per-source temperature sampling (data mixing) ---------------------
    // quota_s = min(cnt_s, ceil(2*sqrt(cnt_s))) — flattens the source
    // distribution without a cross-source normalizing sum (which would be
    // summation-order-dependent in doubles). Filled by md5(text) rank via
    // the same 16-bit hash-prefix prefilter as q_stratified_sample.
    QueryDef(
      "q_domain_mix",
      Some("""
        WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
        q AS (SELECT source, cnt,
                least(cnt, CAST(ceil(2 * sqrt(cnt)) AS BIGINT)) AS quota
              FROM c),
        b AS (SELECT source, quota,
                least(65535, CAST(ceil(262144.0 * quota / cnt) AS INT)) AS bound
              FROM q),
        f AS (SELECT d.doc_id, d.source, b.quota, md5(d.text) AS m
              FROM documents d JOIN b USING (source)
              WHERE ('0x' || substr(md5(d.text), 1, 4))::INT < b.bound),
        r AS (SELECT doc_id, source, quota,
                row_number() OVER (PARTITION BY source ORDER BY m, doc_id) AS rn
              FROM f)
        SELECT doc_id, source, quota, CAST(rn AS INT) AS rn
        FROM r WHERE rn <= quota"""),
      (s, dir) => MixOps.temperatureSample(
        Tables.load(s, dir, "documents"), "source", MixK)),

    // ---- budget-constrained quality selection ------------------------------
    // Keep the highest-quality docs until a 2000-token budget is spent.
    // The oracle replays the NAIVE form (one global-order cumsum window);
    // the engine runs the distributed prefix-sum decomposition (integer
    // quality buckets -> per-bucket totals -> driver prefix sum ->
    // within-bucket windows), so the hash gate proves the decomposition
    // exactly equals the single-partition formulation it replaces.
    QueryDef(
      "q_select_budget",
      Some("""
        WITH s AS (SELECT doc_id,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
                     len(regexp_extract_all(lower(text), '\b(?:the|and|of|to|in)\b')) AS n_stop
                   FROM documents),
        q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                (CAST(n_stop AS BIGINT) * 100000) // CAST(n_tokens AS BIGINT) AS q
              FROM s WHERE n_tokens > 0)
        SELECT doc_id, q, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY q DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY q DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) <= 2000 AS selected
        FROM q"""),
      (s, dir) => MixOps.selectUnderBudget(
        Tables.load(s, dir, "documents"), 2000L)),

    // ---- UniMax epoch allocation across languages --------------------------
    // Chung et al. 2023: budget = 1.5x the corpus tokens, max 2 epochs
    // per language. The greedy ascending-size loop is replayed through
    // its closed windowed form on BOTH sides (capped groups are the
    // prefix where cap_i*(n-i+1)+cumcap <= budget, matching the greedy
    // cap <= b/k boundary case exactly; the uniform leftover
    // share is loop-invariant). On this corpus the four small languages
    // cap at 2 epochs and English absorbs the remainder below 1 epoch —
    // all-integer arithmetic end to end.
    QueryDef(
      "q_epoch_mix",
      Some("""
        WITH t AS (SELECT lang, count(*) AS n_docs,
                     CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                       AS BIGINT) AS n_tokens
                   FROM documents GROUP BY lang),
        w AS (SELECT lang, n_docs, n_tokens,
                n_tokens * 2 AS cap,
                CAST(row_number() OVER (ORDER BY n_tokens, lang) AS BIGINT) AS i,
                CAST(coalesce(sum(n_tokens * 2) OVER (ORDER BY n_tokens, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_prev,
                CAST(count(*) OVER () AS BIGINT) AS n_groups,
                CAST(sum(n_tokens) OVER () AS BIGINT) AS total
              FROM t),
        c AS (SELECT *, (total * 3) // 2 AS budget,
                cap * (n_groups - i + 1) + cum_prev <= (total * 3) // 2 AS capped
              FROM w),
        f AS (SELECT *,
                CAST(coalesce(sum(CASE WHEN capped THEN cap END) OVER (), 0)
                  AS BIGINT) AS capped_sum,
                CAST(n_groups - coalesce(
                  sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER (), 0)
                  AS BIGINT) AS n_uncapped
              FROM c)
        SELECT lang, n_docs, n_tokens, capped,
               CASE WHEN capped THEN cap
                 ELSE (budget - capped_sum) // greatest(n_uncapped, 1)
               END AS alloc_tokens,
               CASE WHEN n_tokens > 0 THEN
                 CAST(CAST(CASE WHEN capped THEN cap
                    ELSE (budget - capped_sum) // greatest(n_uncapped, 1)
                  END AS HUGEINT) * 1000000 // n_tokens AS BIGINT)
               ELSE 0 END AS epochs_micro
        FROM f"""),
      (s, dir) => MixOps.epochAllocate(
        Tables.load(s, dir, "documents"), "lang",
        maxEpochs = 2L, budgetNum = 3L, budgetDen = 2L)),

    // ---- corpus recipe: allocation -> concrete document multiset -----------
    // q_epoch_mix's token allocation materialized per document: each
    // language contributes floor(epochs) full copies, and its
    // top-quality docs (hashed-classifier score) fill the remainder one
    // more time. The oracle replays scoring, allocation, and the
    // per-language quality cumsum end to end.
    QueryDef(
      "q_recipe",
      Some(s"""
        WITH ${Text.classifierCte},
        sc AS (SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
                 COALESCE(agg.score_micros, 0) AS score
               FROM t LEFT JOIN agg USING (doc_id)),
        d AS (SELECT doc_id, lang FROM documents),
        g AS (SELECT d.lang, CAST(sum(sc.n_tokens) AS BIGINT) AS group_tokens
              FROM d JOIN sc USING (doc_id) GROUP BY d.lang),
        w AS (SELECT lang, group_tokens, group_tokens * 2 AS cap,
                CAST(row_number() OVER (ORDER BY group_tokens, lang)
                  AS BIGINT) AS i,
                CAST(coalesce(sum(group_tokens * 2)
                  OVER (ORDER BY group_tokens, lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_prev,
                CAST(count(*) OVER () AS BIGINT) AS n_groups,
                CAST(sum(group_tokens) OVER () AS BIGINT) AS total
              FROM g),
        c AS (SELECT *, (total * 3) // 2 AS budget,
                cap * (n_groups - i + 1) + cum_prev <= (total * 3) // 2
                  AS capped
              FROM w),
        f AS (SELECT *,
                CAST(coalesce(sum(CASE WHEN capped THEN cap END) OVER (), 0)
                  AS BIGINT) AS capped_sum,
                CAST(n_groups - coalesce(
                  sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER (), 0)
                  AS BIGINT) AS n_uncapped
              FROM c),
        al AS (SELECT lang, group_tokens,
                 CASE WHEN capped THEN cap
                   ELSE (budget - capped_sum) // greatest(n_uncapped, 1)
                 END AS alloc_tokens
               FROM f),
        j AS (SELECT d.doc_id, d.lang, sc.n_tokens, sc.score,
                al.group_tokens, al.alloc_tokens
              FROM d JOIN sc USING (doc_id) JOIN al USING (lang)),
        r AS (SELECT *,
                CASE WHEN group_tokens > 0
                  THEN alloc_tokens // group_tokens ELSE 0 END AS n_copies,
                CASE WHEN group_tokens > 0
                  THEN alloc_tokens % group_tokens ELSE 0 END AS rem,
                CAST(sum(n_tokens) OVER (PARTITION BY lang
                  ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
              FROM j)
        SELECT doc_id, lang, n_tokens, score,
               CAST(n_copies AS BIGINT) AS n_copies,
               cum <= rem AS extra,
               CAST(n_copies + CASE WHEN cum <= rem THEN 1 ELSE 0 END
                 AS BIGINT) AS n_appearances
        FROM r"""),
      (s, dir) => MixOps.corpusRecipe(
        Tables.load(s, dir, "documents"), "lang",
        maxEpochs = 2L, budgetNum = 3L, budgetDen = 2L)),

    // ---- within-doc repetition scoring (Gopher-style quality rules) --------
    QueryDef(
      "q_repetition",
      Some("""
        WITH t AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                   FROM documents),
        p AS (SELECT doc_id, len(toks) AS n_tokens,
                CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                  AS uniq_ratio,
                1.0 - CAST(len(list_distinct(list_transform(
                    range(CAST(ceil(len(toks) / 8.0) AS BIGINT)),
                    i -> array_to_string(
                      toks[i*8 + 1 : least((i+1)*8, len(toks))], ' '))))
                  AS DOUBLE) /
                  CAST(ceil(len(toks) / 8.0) AS BIGINT) AS dup_chunk_ratio
              FROM t WHERE len(toks) >= 2),
        bg AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                   i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)))
                   AS b
               FROM t WHERE len(toks) >= 2),
        bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        tb AS (SELECT doc_id, max(c) AS top, sum(c) AS tot FROM bc
               GROUP BY doc_id)
        SELECT p.doc_id, p.n_tokens, p.uniq_ratio,
               CAST(tb.top AS DOUBLE) / tot AS top_bigram_frac,
               p.dup_chunk_ratio,
               (CAST(tb.top AS DOUBLE) / tot <= 0.2 AND p.uniq_ratio >= 0.5)
                 AS keep
        FROM p JOIN tb USING (doc_id)"""),
      (s, dir) => PipelineOps.repetitionScore(
        Tables.load(s, dir, "documents"))),

    // ---- URL/domain census + blocklist filter ------------------------------
    QueryDef(
      "q_url_domains",
      Some(s"""
        WITH i AS (SELECT 'see http://site' || CAST(doc_id % 50 AS VARCHAR) ||
                     '.example.com/p/' || CAST(doc_id AS VARCHAR) || ' ' || text
                     AS t
                   FROM documents),
        d AS (SELECT regexp_extract(t, '${PipelineOps.UrlDomainRe}', 1)
                AS domain FROM i)
        SELECT domain, count(*) AS n_docs,
               domain IN (${Blocklist.map(d => s"'$d'").mkString(", ")})
                 AS blocked
        FROM d GROUP BY domain"""),
      (s, dir) => PipelineOps.urlDomainStats(
        Tables.load(s, dir, "documents"), Blocklist)),

    // ---- DSIR importance selection (Xie et al., NeurIPS 2023) -------------
    // Top-50 raw docs by unigram log-likelihood ratio toward the lang='en'
    // target distribution, add-0.5 smoothing over the raw vocabulary.
    // Per-token weights round to integer micro-units BEFORE the per-doc
    // sum, so scores are exact integers on both engines (order-independent
    // summation — the cents trick).
    QueryDef(
      "q_dsir_select",
      Some("""
        WITH t AS (SELECT doc_id, lang = 'en' AS is_tgt,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                   FROM documents),
        c AS (SELECT tok, count(*) AS c_raw,
                count(CASE WHEN is_tgt THEN 1 END) AS c_tgt
              FROM t GROUP BY tok),
        tot AS (SELECT CAST(sum(c_raw) AS DOUBLE) AS n_raw,
                       CAST(sum(c_tgt) AS DOUBLE) AS n_tgt,
                       CAST(count(*) AS DOUBLE) AS v
                FROM c),
        w AS (SELECT tok,
                CAST(round((ln((c_tgt + 0.5) / (n_tgt + 0.5 * v)) -
                            ln((c_raw + 0.5) / (n_raw + 0.5 * v))) * 1e6, 0)
                  AS BIGINT) AS w_micro
              FROM c, tot),
        s AS (SELECT t.doc_id, sum(w.w_micro) AS score_micro
              FROM t JOIN w USING (tok) GROUP BY t.doc_id),
        r AS (SELECT d.doc_id,
                CAST(COALESCE(s.score_micro, 0) AS BIGINT) AS score_micro
              FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id),
        k AS (SELECT doc_id, score_micro,
                row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rn
              FROM r)
        SELECT doc_id, score_micro, true AS selected FROM k WHERE rn <= 50"""),
      (s, dir) => MixOps.dsirSelect(
        Tables.load(s, dir, "documents"),
        org.apache.spark.sql.functions.col("lang") === "en", 50))
  )
}
