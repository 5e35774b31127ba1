"""DuckDB oracle SQL for the pipeline (dedup/text/similarity) and
relational (TPC-H-ish/events) queries.

These operate on the raw testdata views directly (no snapshot CTEs).
Parity rules (same as oracles.py) plus:
- all md5-derived hashes are identical by construction
- cosine/dot products computed on DOUBLE[] (DuckDB list_cosine_similarity
  on FLOAT[] accumulates float32 error that breaks round-6 equality)
- money aggregates summed as DECIMAL(18,2/4) then cast to DOUBLE —
  order-independent, bit-identical
- integer division uses `//` (DuckDB) / `div` (Spark), never
  float-division + cast
"""

from __future__ import annotations

from .operators.graph import (
    KCORE_K,
    KCORE_ROUNDS,
    KTRUSS_ROUNDS,
    STAR_ROUNDS,
)
from .pipelines.similarity import (
    NEARDUP_BITS_LADDER,
    NEARDUP_CANDIDATE_BUDGET,
    NEARDUP_TABLES,
)
from .pipelines.dedup import (
    CONTAINMENT_K_LADDER,
    CONTAINMENT_MASS_BUDGET,
    COSINE_THRESHOLD,
    HAMMING_MAX_BUCKET,
    JACCARD_THRESHOLD,
    NUM_BANDS,
    NUM_HASHES,
    ROWS_PER_BAND,
    SHINGLE_K,
    SIMHASH_BITS,
    SIMHASH_CHUNK_BITS,
    SIMHASH_MAX_HAMMING,
    threshold_rational as dedup_threshold_rational,
)

# --- shared text CTE fragments (duckdb dialect) ---
NORM_CTE = """
norm AS (
  SELECT doc_id, lang, source,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents
)"""

SHINGLE_CTE = (
    NORM_CTE
    + f""",
tokarr AS (
  SELECT doc_id, lang, string_split(t, ' ') AS toks FROM norm
),
shingled AS (
  SELECT doc_id, lang,
    list_distinct(list_transform(
      generate_series(0, greatest(len(toks) - {SHINGLE_K}, 0)),
      i -> array_to_string(toks[i+1:i+{SHINGLE_K}], ' '))) AS sh
  FROM tokarr
),
docs AS (SELECT * FROM shingled WHERE len(sh) > 0)"""
)

_JACCARD = (
    "round(CAST(len(list_filter(da.sh, x -> list_contains(db.sh, x))) AS DOUBLE)"
    " / (len(da.sh) + len(db.sh)"
    " - len(list_filter(da.sh, x -> list_contains(db.sh, x)))), 6)"
)


def pipeline_oracles() -> dict[str, str]:
    q: dict[str, str] = {}

    # --- dedup ---
    q["dedup_exact_groups"] = f"""
WITH {NORM_CTE}
SELECT md5(t) AS fingerprint,
  CAST(min(doc_id) AS BIGINT) AS keeper,
  CAST(count(*) AS BIGINT) AS dup_count
FROM norm GROUP BY md5(t) HAVING count(*) > 1"""

    q["dedup_exact_keep"] = f"""
WITH {NORM_CTE}
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5(t) AS fingerprint
FROM norm GROUP BY md5(t)"""

    # cross-source duplicate overlap: NULL-text docs drop out in both
    # engines (md5(NULL) joins nothing under NULL-equality semantics)
    q["dedup_source_overlap"] = f"""
WITH {NORM_CTE},
fp AS (SELECT DISTINCT source, md5(t) AS fingerprint FROM norm)
SELECT a.source AS src_a, b.source AS src_b,
  CAST(count(*) AS BIGINT) AS shared_fingerprints
FROM fp a JOIN fp b
  ON a.fingerprint = b.fingerprint AND a.source <= b.source
GROUP BY 1, 2"""

    q["dedup_minhash_lsh"] = f"""
WITH {SHINGLE_CTE},
sig AS (
  SELECT doc_id, sh,
    list_transform(generate_series(0, {NUM_HASHES - 1}),
      h -> list_min(list_transform(sh,
        s -> md5(CAST(h AS STRING) || ':' || s)))) AS sig
  FROM docs
),
bands AS (
  SELECT doc_id, b.band_id,
    md5(array_to_string(
      sig[b.band_id*{ROWS_PER_BAND}+1 : b.band_id*{ROWS_PER_BAND}+{ROWS_PER_BAND}],
      '|')) AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {NUM_BANDS - 1})) AS band_id) b
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
  FROM bands
),
keep AS (SELECT * FROM sized WHERE bucket_n <= 1000),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
  FROM keep a JOIN keep bb
    ON a.band_id = bb.band_id AND a.band_key = bb.band_key
   AND a.doc_id < bb.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b, {_JACCARD} AS jaccard
  FROM cand c
  JOIN docs da ON c.doc_a = da.doc_id
  JOIN docs db ON c.doc_b = db.doc_id
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}"""

    # fuzzy source overlap: the verified LSH pair query (above) as a
    # FROM-subquery, attributed to source pairs; jaccard mass summed as
    # DECIMAL(38,6) over the rounded pair values (order-independent;
    # 38 digits so >10k-pair source pairs never saturate — ADVICE r7)
    q["dedup_source_overlap_fuzzy"] = f"""
SELECT least(a.source, b.source) AS src_a,
  greatest(a.source, b.source) AS src_b,
  CAST(count(*) AS BIGINT) AS pair_count,
  CAST(sum(CAST(p.jaccard AS DECIMAL(38,6))) AS DOUBLE) AS jaccard_sum
FROM ({q["dedup_minhash_lsh"]}) p
JOIN documents a ON p.doc_a = a.doc_id
JOIN documents b ON p.doc_b = b.doc_id
GROUP BY 1, 2"""

    from .pipelines.dedup import INCREMENTAL_SPLIT_DOC_ID

    # incremental ingestion screen: same sig/band construction as
    # dedup_minhash_lsh, but candidates are (new × corpus) only and the
    # new-batch/corpus split is the fixture convention at doc_id 250
    q["dedup_incremental_screen"] = f"""
WITH {SHINGLE_CTE},
sig AS (
  SELECT doc_id, sh,
    list_transform(generate_series(0, {NUM_HASHES - 1}),
      h -> list_min(list_transform(sh,
        s -> md5(CAST(h AS STRING) || ':' || s)))) AS sig
  FROM docs
),
bands AS (
  SELECT doc_id, b.band_id,
    md5(array_to_string(
      sig[b.band_id*{ROWS_PER_BAND}+1 : b.band_id*{ROWS_PER_BAND}+{ROWS_PER_BAND}],
      '|')) AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {NUM_BANDS - 1})) AS band_id) b
),
corpus_bands AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
    FROM bands WHERE doc_id < {INCREMENTAL_SPLIT_DOC_ID}
  ) WHERE bucket_n <= 1000
),
new_bands AS (
  SELECT doc_id AS new_doc, band_id, band_key FROM bands
  WHERE doc_id >= {INCREMENTAL_SPLIT_DOC_ID}
),
cand AS (
  SELECT DISTINCT n.new_doc, c.doc_id AS corpus_doc
  FROM corpus_bands c JOIN new_bands n
    ON c.band_id = n.band_id AND c.band_key = n.band_key
),
verified AS (
  SELECT cand.new_doc, cand.corpus_doc, {_JACCARD} AS jaccard
  FROM cand
  JOIN docs da ON cand.new_doc = da.doc_id
  JOIN docs db ON cand.corpus_doc = db.doc_id
)
SELECT new_doc, corpus_doc, jaccard FROM verified
WHERE jaccard >= {JACCARD_THRESHOLD}"""

    q["dedup_ngram_jaccard"] = f"""
WITH {SHINGLE_CTE},
pairs AS (
  SELECT da.lang, da.doc_id AS doc_a, db.doc_id AS doc_b,
    {_JACCARD} AS jaccard
  FROM docs da JOIN docs db
    ON da.lang = db.lang AND da.doc_id < db.doc_id
)
SELECT lang, doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.35"""

    # r6: DIRECTIONAL containment (asymmetric near-dup) — the oracle
    # brute-forces all ordered pairs; the Spark side routes through the
    # pigeonhole-exact prefix filter (recall 1.0 by construction; the
    # r12 adaptive posting cap provably preserves that, so no cap
    # appears here). r12: the shingle width K is density-adaptive
    # (dedup.choose_containment_k) — the oracle mirrors the measured
    # escalation rule, then brute-forces at the chosen width. At
    # K=SHINGLE_K this reduces exactly to the pre-r12 oracle. r13:
    # three-rung ladder (3,5,7) — smallest K whose measured mass fits
    # the budget, priced against the NARROW frame's doc count; the
    # mid-rung mass is the cascading second test (VERDICT r12 next #5).
    _k0, _k1, _k2 = CONTAINMENT_K_LADDER

    def _shingled_k(k: int, name: str) -> str:
        return f"""{name} AS (
  SELECT doc_id, lang,
    list_distinct(list_transform(
      generate_series(0, greatest(len(toks) - {k}, 0)),
      i -> array_to_string(toks[i+1:i+{k}], ' '))) AS sh
  FROM tokarr
  WHERE len(list_distinct(list_transform(
      generate_series(0, greatest(len(toks) - {k}, 0)),
      i -> array_to_string(toks[i+1:i+{k}], ' ')))) > 0
)"""

    _containment_docs_cte = f"""{NORM_CTE},
tokarr AS (
  SELECT doc_id, lang, string_split(t, ' ') AS toks FROM norm
),
{_shingled_k(_k0, "cdocs_narrow")},
cmass AS (
  SELECT coalesce(sum((df * (df - 1)) // 2), 0) AS mass FROM (
    SELECT count(*) AS df FROM (
      SELECT doc_id, unnest(sh) AS s FROM cdocs_narrow
    ) GROUP BY s
  )
),
{_shingled_k(_k1, "cdocs_mid")},
cmass_mid AS (
  SELECT coalesce(sum((df * (df - 1)) // 2), 0) AS mass FROM (
    SELECT count(*) AS df FROM (
      SELECT doc_id, unnest(sh) AS s FROM cdocs_mid
    ) GROUP BY s
  )
),
ck AS (
  SELECT CASE
    WHEN (SELECT mass FROM cmass)
      <= {CONTAINMENT_MASS_BUDGET} * (SELECT count(*) FROM cdocs_narrow)
    THEN {_k0}
    WHEN (SELECT mass FROM cmass_mid)
      <= {CONTAINMENT_MASS_BUDGET} * (SELECT count(*) FROM cdocs_narrow)
    THEN {_k1} ELSE {_k2} END AS k
),
{_shingled_k(_k2, "cdocs_wide")},
cdocs AS (
  SELECT * FROM cdocs_narrow WHERE (SELECT k FROM ck) = {_k0}
  UNION ALL
  SELECT * FROM cdocs_mid WHERE (SELECT k FROM ck) = {_k1}
  UNION ALL
  SELECT * FROM cdocs_wide WHERE (SELECT k FROM ck) = {_k2}
)"""
    q["dedup_containment"] = f"""
WITH {_containment_docs_cte},
pairs AS (
  SELECT da.lang, da.doc_id AS doc_a, db.doc_id AS doc_b,
    round(CAST(len(list_filter(da.sh, x -> list_contains(db.sh, x)))
      AS DOUBLE) / len(da.sh), 6) AS containment
  FROM cdocs da JOIN cdocs db
    ON da.lang = db.lang AND da.doc_id <> db.doc_id
)
SELECT lang, doc_a, doc_b, containment FROM pairs
WHERE containment >= 0.8"""

    # r7: capped-probe recall audit (ADVICE r6 observability). The
    # oracle re-derives the capped-last probe selection relationally.
    # The probe budget is n_sh − ⌈t·n_sh⌉ + 1 in EXACT integer
    # ceiling-division (ADVICE r12: the earlier IEEE-double form
    # floor((1.0-0.8)·n_sh)+1 under-budgeted every doc whose shingle
    # count is a multiple of 5) — mirrors dedup._probe_budget.
    _bn, _bd = dedup_threshold_rational(0.8)
    q["dedup_containment_audit"] = f"""
WITH {SHINGLE_CTE},
postings AS (
  SELECT doc_id, unnest(sh) AS s FROM docs
),
freq AS (SELECT s, count(*) AS df FROM postings GROUP BY s),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM docs),
ranked AS (
  SELECT p.doc_id, (f.df > 2) AS probe_capped,
    row_number() OVER (PARTITION BY p.doc_id
      ORDER BY (f.df > 2) ASC, f.df ASC, p.s ASC) AS rn,
    z.n_sh
  FROM postings p JOIN freq f USING (s) JOIN sizes z USING (doc_id)
),
probes AS (
  SELECT * FROM ranked
  WHERE rn <= n_sh - (({_bn} * n_sh + {_bd - 1}) // {_bd}) + 1
)
SELECT
  (SELECT count(DISTINCT doc_id) FROM docs) AS docs_total,
  (SELECT count(DISTINCT doc_id) FROM probes WHERE probe_capped)
    AS docs_at_risk"""

    # r7: winnowing fingerprints + shared-passage pairs (Schleimer/
    # Wilkes/Aiken 2003). k=4-gram 60-bit md5-prefix hashes, w=8
    # windows, LEFTMOST-minimum selection; short docs winnow one
    # truncated window (list slicing truncates identically in both
    # engines); the pair query caps degenerate gram-hash buckets at
    # 1000 and thresholds shared fingerprints at 2.
    _winnow_fp_cte = """
norm AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
hashed AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 4 THEN
      list_transform(generate_series(1, len(toks) - 4 + 1),
        i -> CAST(concat('0x',
          substr(md5(array_to_string(toks[i:i+3], ' ')), 1, 15))
          AS BIGINT))
    ELSE [] END AS hs
  FROM tok
),
fp AS (
  SELECT DISTINCT doc_id,
    CAST(i - 1 + list_position(hs[i:i+7], list_min(hs[i:i+7]))
         AS BIGINT) AS pos,
    list_min(hs[i:i+7]) AS gram_hash
  FROM hashed,
    unnest(generate_series(1, greatest(len(hs) - 8 + 1, 1))) AS u(i)
  WHERE len(hs) > 0
)"""
    q["text_winnow_fingerprints"] = f"""
WITH {_winnow_fp_cte}
SELECT doc_id, pos, gram_hash FROM fp"""

    q["text_shared_passages"] = f"""
WITH {_winnow_fp_cte},
posting AS (SELECT DISTINCT doc_id, gram_hash FROM fp),
capped AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY gram_hash) AS bucket_n
    FROM posting
  ) WHERE bucket_n <= 1000
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  count(DISTINCT a.gram_hash) AS shared_fps
FROM capped a JOIN capped b
  ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING count(DISTINCT a.gram_hash) >= 2"""

    # span-level view: matched fingerprints with their positions, for
    # pairs that meet the same min_shared bar (cap here is
    # position-grain — same value at fixture scale)
    q["text_shared_passage_spans"] = f"""
WITH {_winnow_fp_cte},
capped AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY gram_hash) AS bucket_n FROM fp
  ) WHERE bucket_n <= 1000
),
spans AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.gram_hash,
    a.pos AS pos_a, b.pos AS pos_b
  FROM capped a JOIN capped b
    ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
),
q AS (
  SELECT doc_a, doc_b FROM spans
  GROUP BY doc_a, doc_b HAVING count(DISTINCT gram_hash) >= 2
)
SELECT s.doc_a, s.doc_b, s.gram_hash, s.pos_a, s.pos_b
FROM spans s JOIN q USING (doc_a, doc_b)"""



    # 64-bit token hash = first 16 md5 hex chars, reproduced from two
    # unsigned 32-bit halves (DuckDB can't cast 16 hex chars to BIGINT):
    # hi = chars 1-8 (bits 63..32), lo = chars 9-16 (bits 31..0) — the
    # same bits Spark's signed conv(md5[1:16], 16, -10) reads.
    bit_sums = ",\n    ".join(
        "sum(CASE WHEN ({src} // {p}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}".format(
            src="lo" if b < 32 else "hi", p=2 ** (b % 32), b=b
        )
        for b in range(SIMHASH_BITS)
    )
    # bit 63's weight is Long.MIN_VALUE (signed two's complement) — the
    # ascending + chain keeps every partial sum inside BIGINT range
    fp_terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN "
        + ("(-9223372036854775807 - 1)" if b == 63 else str(2**b))
        + " ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    chunk_mod = 2**SIMHASH_CHUNK_BITS
    q["dedup_simhash_pairs"] = f"""
WITH {NORM_CTE},
tokens AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS token FROM norm
),
hashed AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT) AS hi,
    CAST(concat('0x', substr(md5(token), 9, 8)) AS BIGINT) AS lo
  FROM tokens
),
bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM hashed GROUP BY doc_id
),
fps AS (
  SELECT doc_id, CAST({fp_terms} AS BIGINT) AS simhash FROM bits
),
chunks AS (
  SELECT doc_id, simhash, c.chunk_id,
    CAST(((CAST(simhash AS HUGEINT)
           + CASE WHEN simhash < 0 THEN 18446744073709551616 ELSE 0 END)
          // CAST(pow(2, {SIMHASH_CHUNK_BITS} * c.chunk_id) AS HUGEINT))
         % {chunk_mod} AS BIGINT) AS chunk_val
  FROM fps, (SELECT unnest(generate_series(0, 3)) AS chunk_id) c
),
sized AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY chunk_id, chunk_val) AS bucket_n
    FROM chunks
  ) WHERE bucket_n <= {HAMMING_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.simhash AS fp_a, b.simhash AS fp_b
  FROM sized a JOIN sized b
    ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= {SIMHASH_MAX_HAMMING}"""

    # Multi-table LSH near-dup (mirrors similarity.embedding_neardup_pairs_lsh
    # at the DENSITY-ADAPTIVE width of similarity.choose_neardup_bits, r12):
    # sign every vector against the shared md5-derived plane family (8 tables
    # × up to 16 bits = 128 planes; width-b table t uses planes t·b..t·b+b−1,
    # exactly _plane_matrix's layout), measure each ladder width's candidate
    # mass Σ C(n_bucket, 2), pick the coarsest width within the per-vector
    # budget (finest as fallback), then bucket-join + exact cosine verify at
    # that width; DISTINCT pairs across tables. At width 8 the plane/bucket
    # math reduces to the pre-r12 static oracle exactly.
    _plane_w = (
        "((CAST(concat('0x', substr(md5('plane:' || CAST(p AS STRING) || ':' "
        "|| CAST(d AS STRING)), 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0)"
    )
    _ladder_sql = ", ".join(str(b) for b in NEARDUP_BITS_LADDER)
    _max_planes = max(NEARDUP_BITS_LADDER) * NEARDUP_TABLES
    _nd_frontier_cte = f"""e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
nd_signs AS (
  SELECT vec_id, p,
    CASE WHEN list_sum(list_transform(generate_series(0, 63), d ->
      emb[d+1] * {_plane_w})) > 0 THEN 1 ELSE 0 END AS bit
  FROM e, (SELECT unnest(generate_series(0, {_max_planes - 1})) AS p) ps
),
nd_bk AS (
  SELECT vec_id, w.b AS bits, p // w.b AS tbl,
    CAST(sum(bit * CAST(pow(2, p % w.b) AS BIGINT)) AS BIGINT) AS bucket
  FROM nd_signs, (SELECT unnest([{_ladder_sql}]) AS b) w
  WHERE p < w.b * {NEARDUP_TABLES}
  GROUP BY vec_id, w.b, p // w.b
),
nd_mass AS (
  SELECT bits, sum((n * (n - 1)) // 2) AS candidate_mass FROM (
    SELECT bits, tbl, bucket, count(*) AS n FROM nd_bk GROUP BY 1, 2, 3
  ) GROUP BY bits
),
nd_pick AS (
  SELECT coalesce(
    (SELECT min(bits) FROM nd_mass
      WHERE candidate_mass
        <= {NEARDUP_CANDIDATE_BUDGET} * (SELECT count(*) FROM e)),
    (SELECT max(bits) FROM nd_mass)) AS bits
)"""
    q["ann_neardup_frontier"] = f"""
WITH {_nd_frontier_cte}
SELECT m.bits,
  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_vecs,
  CAST(m.candidate_mass AS BIGINT) AS candidate_mass,
  round(CAST(m.candidate_mass AS DOUBLE)
    / (SELECT count(*) FROM e), 6) AS mass_per_vec,
  m.candidate_mass
    <= {NEARDUP_CANDIDATE_BUDGET} * (SELECT count(*) FROM e)
    AS within_budget,
  m.bits = (SELECT bits FROM nd_pick) AS chosen
FROM nd_mass m ORDER BY m.bits"""
    q["dedup_embedding_cosine"] = f"""
WITH {_nd_frontier_cte},
buckets AS (
  SELECT vec_id, tbl, bucket FROM nd_bk
  WHERE bits = (SELECT bits FROM nd_pick)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
  round(list_cosine_similarity(ea.emb, eb.emb), 6) AS cosine
FROM cand c
JOIN e ea ON c.vec_a = ea.vec_id
JOIN e eb ON c.vec_b = eb.vec_id
WHERE round(list_cosine_similarity(ea.emb, eb.emb), 6) >= {COSINE_THRESHOLD}"""

    # r12: semantic split leakage — the adaptive pair graph with the
    # deterministic-split tag (same bucket math as sampling_split,
    # vec_id == doc_id is the fixture convention)
    from .pipelines.sampling import DEFAULT_WEIGHTS, SPLIT_BUCKETS

    _tr_end = int(DEFAULT_WEIGHTS["train"] * SPLIT_BUCKETS)
    _val_end = _tr_end + int(DEFAULT_WEIGHTS["val"] * SPLIT_BUCKETS)
    q["emb_split_leakage"] = f"""
WITH pairs AS MATERIALIZED (SELECT * FROM ({q["dedup_embedding_cosine"]}) p),
esp AS (
  SELECT vec_id,
    CASE WHEN bucket < {_tr_end} THEN 'train'
         WHEN bucket < {_val_end} THEN 'val'
         ELSE 'test' END AS split
  FROM (
    SELECT vec_id,
      CAST(concat('0x', substr(md5('split:' || CAST(vec_id AS VARCHAR)),
        1, 15)) AS BIGINT) % {SPLIT_BUCKETS} AS bucket
    FROM embeddings
  )
)
SELECT
  CASE WHEN sa.split = 'train' THEN p.vec_b ELSE p.vec_a END AS eval_vec,
  CASE WHEN sa.split = 'train' THEN sb.split ELSE sa.split END
    AS eval_split,
  CASE WHEN sa.split = 'train' THEN p.vec_a ELSE p.vec_b END AS train_vec,
  p.cosine
FROM pairs p
JOIN esp sa ON p.vec_a = sa.vec_id
JOIN esp sb ON p.vec_b = sb.vec_id
WHERE (sa.split = 'train') <> (sb.split = 'train')"""

    # --- similarity search ---
    q["ann_cosine_topk"] = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, v.vec_id,
    round(list_cosine_similarity(q.q_emb, v.emb), 6) AS cosine
  FROM queries q, e v WHERE v.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""

    plane_w = (
        "((CAST(concat('0x', substr(md5('plane:' || CAST(p AS STRING) || ':' "
        "|| CAST(d AS STRING)), 1, 15)) AS BIGINT) % 2001 - 1000) / 1000.0)"
    )
    bucket_expr = f"""
  CAST(list_sum(list_transform(generate_series(0, 7), p ->
    CASE WHEN list_sum(list_transform(generate_series(0, 63), d ->
      emb[d+1] * {plane_w})) > 0
    THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)) AS BIGINT)"""
    q["ann_lsh_buckets"] = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
)
SELECT vec_id, {bucket_expr} AS bucket FROM e"""

    q["ann_lsh_pairs"] = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
tagged AS (
  SELECT vec_id, emb, {bucket_expr} AS bucket FROM e
)
SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
  round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
FROM tagged a JOIN tagged b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.3"""

    # --- text analysis ---
    q["text_token_stats"] = """
SELECT doc_id,
  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
    AS BIGINT) AS regex_tokens,
  CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
    AS BIGINT) AS distinct_tokens,
  round(CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
    AS DOUBLE) / len(regexp_split_to_array(trim(text), '\\s+')), 6)
    AS distinct_ratio
FROM documents"""

    q["text_quality"] = """
WITH base AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS nonpunct,
    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      t -> t IN ('the','a','of','to','and','is'))) AS BIGINT) AS stop_hits
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
  round(CAST(n_chars - nonpunct AS DOUBLE) / n_chars, 6) AS punct_ratio,
  round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
  round((CAST(n_chars AS DOUBLE) - n_tokens + 1) / n_tokens, 6)
    AS mean_token_len,
  round(
    least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
    + least(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1) * 5, 1.0) * 0.4
    + (1 - least(CAST(n_chars - nonpunct AS DOUBLE) / n_chars * 10, 1.0))
      * 0.2, 6) AS quality_score
FROM base"""

    markers = {
        "en": ("the", "a", "of", "to", "and", "is"),
        "es": ("el", "la", "de", "que", "los", "una"),
        "fr": ("le", "la", "les", "des", "une", "est"),
        "zh": ("的", "是", "了", "在", "我", "有"),
    }
    score_cols = ",\n    ".join(
        "CAST(len(list_filter(list_transform(regexp_split_to_array(trim(text),"
        f" '\\s+'), t -> lower(t)), t -> t IN {markers[lang]!r})) AS BIGINT)"
        f" AS score_{lang}"
        for lang in markers
    )
    pred_cases = "\n    ".join(
        f"WHEN score_{lang} = best AND best > 0 THEN '{lang}'"
        for lang in markers
    )
    q["text_language_id"] = f"""
WITH scored AS (
  SELECT doc_id, lang AS declared_lang,
    {score_cols}
  FROM documents
),
with_best AS (
  SELECT *, greatest(score_en, score_es, score_fr, score_zh) AS best
  FROM scored
)
SELECT doc_id, declared_lang,
  CASE
    {pred_cases}
    ELSE 'und' END AS predicted_lang,
  score_en, score_es, score_fr, score_zh
FROM with_best"""

    q["text_fingerprints"] = f"""
WITH {NORM_CTE},
tokarr AS (SELECT doc_id, t, string_split(t, ' ') AS toks FROM norm)
SELECT doc_id,
  md5(t) AS content_md5,
  md5(array_to_string(list_sort(list_distinct(toks)), ' '))
    AS bag_fingerprint,
  list_min(list_transform(
    list_transform(generate_series(0, greatest(len(toks) - 5, 0)),
      i -> array_to_string(toks[i+1:i+5], ' ')),
    s -> md5(s))) AS rolling_min_hash
FROM tokarr"""

    # --- dataset assembly: hash splits / stratified sample / chunking ---
    from .pipelines.sampling import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        DEFAULT_WEIGHTS,
        SPLIT_BUCKETS,
    )

    train_end = int(DEFAULT_WEIGHTS["train"] * SPLIT_BUCKETS)
    val_end = train_end + int(DEFAULT_WEIGHTS["val"] * SPLIT_BUCKETS)
    step = CHUNK_TOKENS - CHUNK_OVERLAP
    q["sampling_split"] = f"""
WITH b AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)),
      1, 15)) AS BIGINT) % {SPLIT_BUCKETS} AS bucket
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(bucket AS BIGINT) AS bucket,
  CASE WHEN bucket < {train_end} THEN 'train'
       WHEN bucket < {val_end} THEN 'val'
       ELSE 'test' END AS split
FROM b"""

    # r6: split-leakage audit — all cross-split pairs brute-forced; the
    # Spark side composes the deterministic split with the banded screen
    q["split_leakage"] = f"""
WITH {SHINGLE_CTE},
sp AS (
  SELECT doc_id,
    CASE WHEN bucket < {train_end} THEN 'train'
         WHEN bucket < {val_end} THEN 'val'
         ELSE 'test' END AS split
  FROM (
    SELECT doc_id,
      CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)),
        1, 15)) AS BIGINT) % {SPLIT_BUCKETS} AS bucket
    FROM documents
  )
)
SELECT de.doc_id AS eval_doc, se.split AS eval_split,
  dt.doc_id AS train_doc,
  round(CAST(len(list_filter(de.sh, x -> list_contains(dt.sh, x)))
    AS DOUBLE) / (len(de.sh) + len(dt.sh)
    - len(list_filter(de.sh, x -> list_contains(dt.sh, x)))), 6)
    AS jaccard
FROM docs de
JOIN sp se ON de.doc_id = se.doc_id AND se.split <> 'train'
JOIN docs dt ON dt.doc_id <> de.doc_id
JOIN sp st ON dt.doc_id = st.doc_id AND st.split = 'train'
WHERE CAST(len(list_filter(de.sh, x -> list_contains(dt.sh, x)))
    AS DOUBLE) / (len(de.sh) + len(dt.sh)
    - len(list_filter(de.sh, x -> list_contains(dt.sh, x)))) >= 0.5"""


    q["sampling_stratified"] = f"""
WITH b AS (
  SELECT doc_id, lang, source,
    CAST(concat('0x', substr(md5('strat:' || CAST(doc_id AS VARCHAR)),
      1, 15)) AS BIGINT) % {SPLIT_BUCKETS} AS bucket
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
  CAST(bucket AS BIGINT) AS bucket
FROM b WHERE bucket < {int(0.2 * SPLIT_BUCKETS)}"""

    # fused curation pipeline: quality gate → exact-dedup keeper window →
    # split tag; same quality formula as text_quality, same bucket math as
    # sampling_split, same fingerprint as dedup_exact_keep
    q["curation_pipeline"] = f"""
WITH base AS (
  SELECT doc_id, text,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
      AS n_tokens,
    CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS nonpunct,
    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      t -> t IN ('the','a','of','to','and','is'))) AS BIGINT) AS stop_hits
  FROM documents
),
scored AS (
  SELECT doc_id, n_tokens,
    round(
      least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
      + least(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1) * 5, 1.0)
        * 0.4
      + (1 - least(CAST(n_chars - nonpunct AS DOUBLE) / n_chars * 10, 1.0))
        * 0.2, 6) AS quality_score,
    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
    CAST(concat('0x', substr(md5('split:' || CAST(doc_id AS VARCHAR)),
      1, 15)) AS BIGINT) % {SPLIT_BUCKETS} AS bucket
  FROM base
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM scored WHERE quality_score >= 0.5
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE WHEN bucket < {train_end} THEN 'train'
       WHEN bucket < {val_end} THEN 'val'
       ELSE 'test' END AS split,
  n_tokens, quality_score
FROM ranked WHERE rn = 1"""

    # curriculum ordering: same quality formula, total order by ROUNDED
    # quality desc, n_tokens asc, doc_id — the rank oracle is the plain
    # global window the Spark side deliberately avoids planning
    q["sampling_curriculum"] = """
WITH base AS (
  SELECT doc_id, text,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
      AS n_tokens,
    CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS nonpunct,
    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      t -> t IN ('the','a','of','to','and','is'))) AS BIGINT) AS stop_hits
  FROM documents WHERE text IS NOT NULL
),
scored AS (
  SELECT doc_id, n_tokens,
    round(
      least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
      + least(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1) * 5, 1.0)
        * 0.4
      + (1 - least(CAST(n_chars - nonpunct AS DOUBLE) / n_chars * 10, 1.0))
        * 0.2, 6) AS quality_score
  FROM base
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, quality_score, n_tokens,
  CAST(row_number() OVER (
    ORDER BY quality_score DESC, n_tokens ASC, doc_id ASC
  ) AS BIGINT) AS curriculum_rank
FROM scored"""

    # per-source corpus health: same quality formula as text_quality,
    # same fingerprint as dedup_exact, rolled up per source
    q["source_quality_summary"] = """
WITH base AS (
  SELECT doc_id, source, lang,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
      AS n_tokens,
    CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT)
      AS nonpunct,
    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      t -> t IN ('the','a','of','to','and','is'))) AS BIGINT) AS stop_hits,
    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
scored AS (
  SELECT doc_id, source, lang, fingerprint,
    round(
      least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
      + least(CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1) * 5, 1.0)
        * 0.4
      + (1 - least(CAST(n_chars - nonpunct AS DOUBLE) / n_chars * 10, 1.0))
        * 0.2, 6) AS quality_score
  FROM base
),
flagged AS (
  SELECT *, CASE WHEN count(*) OVER (PARTITION BY fingerprint) > 1
    THEN 1 ELSE 0 END AS is_dup
  FROM scored
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(avg(quality_score), 6) AS mean_quality,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(sum(is_dup) AS BIGINT) AS dup_docs,
  round(sum(is_dup) * 1.0 / count(*), 6) AS dup_frac
FROM flagged GROUP BY source"""

    q["doc_chunks"] = f"""
WITH toksrc AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
d2 AS (
  SELECT doc_id, toks,
    CASE WHEN len(toks) <= {CHUNK_TOKENS} THEN 1
         ELSE CAST(ceil((len(toks) - {CHUNK_TOKENS}) / {step}.0) AS BIGINT)
              + 1 END AS n_chunks
  FROM toksrc
)
SELECT CAST(d2.doc_id AS BIGINT) AS doc_id,
  CAST(t.i AS BIGINT) AS chunk_id,
  CAST(len(toks[t.i*{step}+1 : t.i*{step}+{CHUNK_TOKENS}]) AS BIGINT)
    AS n_tokens,
  array_to_string(toks[t.i*{step}+1 : t.i*{step}+{CHUNK_TOKENS}], ' ')
    AS chunk_text,
  md5(array_to_string(toks[t.i*{step}+1 : t.i*{step}+{CHUNK_TOKENS}], ' '))
    AS chunk_md5
FROM d2, unnest(generate_series(0, n_chunks - 1)) AS t(i)"""

    # --- relational / events ---
    q["tpch_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
    AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
    AS DOUBLE) AS sum_disc_price,
  CAST(count(*) AS BIGINT) AS count_order,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
    AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""

    q["tpch_big_order_revenue"] = """
WITH cust AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
ords AS (
  SELECT o_orderkey, o_orderpriority
  FROM orders JOIN cust ON o_custkey = c_custkey
  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
),
rev AS (
  SELECT l_orderkey,
    CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      AS d_rev
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_orderkey, o_orderpriority,
  round(CAST(sum(d_rev) AS DOUBLE), 2) AS revenue
FROM ords JOIN rev ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderpriority
HAVING CAST(sum(d_rev) AS DOUBLE) > 300000"""

    q["tpch_local_supplier_volume"] = """
WITH nations AS (
  SELECT n_nationkey, n_name
  FROM region JOIN nation ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
),
cust AS (
  SELECT c_custkey, n_nationkey AS c_nation, n_name
  FROM customer JOIN nations ON c_nationkey = n_nationkey
),
supp AS (
  SELECT s_suppkey, s_nationkey AS s_nation
  FROM supplier JOIN nations ON s_nationkey = n_nationkey
),
ords AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
)
SELECT n_name,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
    AS DOUBLE), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS lineitems
FROM ords
JOIN cust ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supp ON l_suppkey = s_suppkey
WHERE c_nation = s_nation
GROUP BY n_name"""

    q["events_daily_rollup"] = """
SELECT CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
    / 86400) AS BIGINT) AS day,
  event_type,
  CAST(count(*) AS BIGINT) AS events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
FROM events GROUP BY 1, 2"""

    # multimodal header parse: the synth payload is
    # 'IMG1' + %04d width + %04d height + utf-8 body, so every extracted
    # field is a closed-form function of the source row — the oracle
    # checks the encode → binary substring → cast round-trip end to end
    q["media_header_meta"] = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio'
       ELSE 'video' END AS media_type,
  'IMG1' AS magic,
  CAST(n_chars % 64 + 16 AS BIGINT) AS width,
  CAST(n_chars % 48 + 16 AS BIGINT) AS height,
  CAST(12 + octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents"""

    # media perceptual-hash near-dup: the synth payload body IS the
    # document text, so the 64-bit positional aHash (segment mean vs
    # global mean over body code points, cross-multiplied to stay
    # integer-exact) is a closed-form function of `text` — the oracle
    # recomputes it character-relationally and verifies the pair set
    # all-pairs (DuckDB-cheap at fixture scale, and stronger than
    # mirroring the Spark side's bucketed pigeonhole join: it also
    # witnesses the pigeonhole's recall). Segment 63's weight is
    # Long.MIN_VALUE — 1<<63 overflows DuckDB's checked BIGINT shift.
    q["media_phash_pairs"] = """
WITH chars AS (
  SELECT doc_id,
    unnest(list_filter(string_split(text, ''), c -> c <> '')) AS ch,
    unnest(generate_series(1,
      len(list_filter(string_split(text, ''), c -> c <> '')))) AS p
  FROM documents
),
totals AS (
  SELECT doc_id, count(*) AS n, sum(ord(ch)) AS total
  FROM chars GROUP BY doc_id
),
seg AS (
  SELECT c.doc_id, ((p - 1) * 64) // t.n AS s,
    sum(ord(ch)) AS ssum, count(*) AS slen
  FROM chars c JOIN totals t USING (doc_id)
  GROUP BY c.doc_id, s
),
bits AS (
  SELECT seg.doc_id,
    CAST(sum(CASE WHEN ssum * t.n > t.total * slen
      THEN (CASE WHEN s = 63 THEN (-9223372036854775807 - 1)
            ELSE (1::BIGINT << CAST(s AS INT)) END)
      ELSE 0 END) AS BIGINT) AS phash
  FROM seg JOIN totals t USING (doc_id) GROUP BY seg.doc_id
),
ph AS (
  SELECT d.doc_id, coalesce(b.phash, 0) AS phash
  FROM documents d LEFT JOIN bits b USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3"""

    q["events_funnel"] = """
WITH e AS (
  SELECT user_id, event_type,
    CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS BIGINT)
      AS t
  FROM events
),
s1 AS (SELECT user_id, min(t) AS t FROM e
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.t >= s1.t
         AND e.t <= s1.t + 86400 GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.t) AS t FROM e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.t >= s2.t
         AND e.t <= s2.t + 86400 GROUP BY 1),
counts AS (
  SELECT 1 AS step_idx, 'view' AS step, count(*) AS users FROM s1
  UNION ALL
  SELECT 2, 'click', count(*) FROM s2
  UNION ALL
  SELECT 3, 'purchase', count(*) FROM s3
)
SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
  CAST(users AS BIGINT) AS users,
  round(users * 1.0 / lag(users) OVER (ORDER BY step_idx), 6)
    AS conv_from_prev,
  round(users * 1.0 / first_value(users) OVER (ORDER BY step_idx), 6)
    AS conv_from_first
FROM counts"""

    q["events_retention"] = """
WITH daily AS (
  SELECT DISTINCT user_id,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT) AS day
  FROM events
),
first AS (SELECT user_id, min(day) AS cohort_day FROM daily GROUP BY 1),
sizes AS (SELECT cohort_day, count(*) AS cohort_size FROM first GROUP BY 1),
ret AS (
  SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
    count(DISTINCT d.user_id) AS retained
  FROM daily d JOIN first f USING (user_id)
  WHERE d.day - f.cohort_day IN (1, 7)
  GROUP BY 1, 2
)
SELECT r.cohort_day, CAST(r.day_offset AS BIGINT) AS day_offset,
  CAST(s.cohort_size AS BIGINT) AS cohort_size,
  CAST(r.retained AS BIGINT) AS retained,
  round(r.retained * 1.0 / s.cohort_size, 6) AS retention_rate
FROM ret r JOIN sizes s USING (cohort_day)"""

    q["text_ngram_freq"] = f"""
WITH {NORM_CTE},
tokarr AS (SELECT doc_id, lang, string_split(t, ' ') AS toks FROM norm),
grams AS (
  SELECT lang,
    unnest(list_transform(
      generate_series(0, greatest(len(toks) - 2, 0)),
      i -> array_to_string(toks[i+1:i+2], ' '))) AS ngram
  FROM tokarr
)
SELECT lang, ngram, CAST(count(*) AS BIGINT) AS occurrences
FROM grams GROUP BY lang, ngram HAVING count(*) >= 10"""

    # corpus-typicality: mean log2 corpus frequency of a doc's 2-grams
    q["text_typicality"] = """
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
grams AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(toks) - 1),
      i -> array_to_string(toks[i:i+1], ' '))) AS gram
  FROM tok
),
freq AS (SELECT gram, count(*) AS n FROM grams GROUP BY 1)
SELECT g.doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  round(avg(log2(f.n)), 6) AS typicality
FROM grams g JOIN freq f USING (gram)
GROUP BY g.doc_id"""

    # Gopher-style repetition metrics: complete n-grams only (slice window
    # never runs past the token array), n = 2 and 3, per-doc conditional agg
    q["text_repetition"] = """
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
grams AS (
  SELECT doc_id, 2 AS n,
    unnest(list_transform(generate_series(1, len(toks) - 1),
      i -> array_to_string(toks[i:i+1], ' '))) AS gram
  FROM tok
  UNION ALL
  SELECT doc_id, 3,
    unnest(list_transform(generate_series(1, len(toks) - 2),
      i -> array_to_string(toks[i:i+2], ' ')))
  FROM tok
),
counts AS (
  SELECT doc_id, n, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3
)
SELECT doc_id,
  CAST(sum(CASE WHEN n = 2 THEN c END) AS BIGINT) AS n2_total,
  round(max(CASE WHEN n = 2 THEN c END) * 1.0
    / sum(CASE WHEN n = 2 THEN c END), 6) AS top_2gram_frac,
  round(1 - count(CASE WHEN n = 2 THEN 1 END) * 1.0
    / sum(CASE WHEN n = 2 THEN c END), 6) AS dup_2gram_frac,
  CAST(sum(CASE WHEN n = 3 THEN c END) AS BIGINT) AS n3_total,
  round(max(CASE WHEN n = 3 THEN c END) * 1.0
    / sum(CASE WHEN n = 3 THEN c END), 6) AS top_3gram_frac,
  round(1 - count(CASE WHEN n = 3 THEN 1 END) * 1.0
    / sum(CASE WHEN n = 3 THEN c END), 6) AS dup_3gram_frac
FROM counts GROUP BY doc_id"""

    # benchmark decontamination: distinct 3-gram shingles vs the
    # deterministic probe set (doc_id % 97 == 0), self-matches excluded
    q["text_contamination"] = """
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
sh AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
      i -> array_to_string(toks[i:i+2], ' ')))) AS gram
  FROM tok
),
probes AS (SELECT doc_id AS probe_id, gram FROM sh WHERE doc_id % 97 = 0),
hits AS (
  SELECT s.doc_id,
    count(DISTINCT s.gram) AS hit_grams,
    count(DISTINCT p.probe_id) AS probe_docs
  FROM sh s JOIN probes p USING (gram)
  WHERE s.doc_id <> p.probe_id
  GROUP BY s.doc_id
),
tot AS (SELECT doc_id, count(*) AS total_grams FROM sh GROUP BY 1)
SELECT h.doc_id,
  CAST(hit_grams AS BIGINT) AS hit_grams,
  CAST(probe_docs AS BIGINT) AS probe_docs,
  round(hit_grams * 1.0 / total_grams, 6) AS contamination_frac
FROM hits h JOIN tot USING (doc_id)"""

    # per-document TF-IDF top-3 (tf × ln(N/df), row_number tie-break on
    # token asc) — window semantics identical across engines
    q["text_tfidf"] = """
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
terms AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS token FROM norm
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM terms GROUP BY 1, 2),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
    tf.tf * ln(n.n_docs * 1.0 / dfreq.df) AS tfidf
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, token,
  CAST(tf AS BIGINT) AS tf, round(tfidf, 6) AS tfidf
FROM ranked WHERE rank <= 3"""

    # symmetric int8 quantization witness: identical clamp/round chain,
    # accumulation in double with left-fold order on both engines
    q["emb_quantize_int8"] = """
WITH x AS (
  SELECT vec_id,
    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xe
  FROM embeddings
),
s AS (
  SELECT vec_id, xe,
    list_max(list_transform(xe, v -> abs(v))) / 127.0 AS scale
  FROM x
),
c AS (
  SELECT vec_id, xe, scale,
    list_transform(xe,
      v -> greatest(-127, least(127, CAST(round(v / scale) AS INTEGER))))
      AS codes
  FROM s
)
SELECT vec_id,
  round(scale, 6) AS scale,
  CAST(list_sum(codes) AS BIGINT) AS code_sum,
  md5(array_to_string(codes, ',')) AS codes_md5,
  round(
    sqrt(list_sum(list_transform(
      list_zip(xe, codes),
      p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale))))
    / sqrt(list_sum(list_transform(xe, v -> v * v))), 6) AS rel_error
FROM c"""

    # PII redaction: patterns restricted to the Java-regex ∩ RE2 common
    # subset (no backrefs/lookaround) so Spark and DuckDB agree literally.
    # Replacement chain mirrors pipelines/text.py declaration order.
    from .pipelines.text import REDACTION_PATTERNS

    count_cols = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat in REDACTION_PATTERNS.items()
    )
    red_expr = "text"
    for name, pat in REDACTION_PATTERNS.items():
        red_expr = (
            f"regexp_replace({red_expr}, '{pat}', '<{name.upper()}>', 'g')"
        )
    q["text_redact_pii"] = f"""
SELECT doc_id,
  {count_cols},
  md5({red_expr}) AS redacted_md5
FROM documents"""

    q["events_anomalous_days"] = """
WITH daily AS (
  SELECT event_type,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT) AS day,
    CAST(count(*) AS BIGINT) AS events
  FROM events GROUP BY 1, 2
),
trailed AS (
  SELECT *, avg(events) OVER (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS trailing_avg
  FROM daily
)
SELECT event_type, day, events,
  round(trailing_avg, 6) AS trailing_avg,
  round(events / trailing_avg, 6) AS volume_ratio
FROM trailed
WHERE trailing_avg IS NOT NULL AND round(events / trailing_avg, 6) > 1.3"""

    q["events_sessionize"] = """
WITH marked AS (
  SELECT user_id, event_id, ts,
    CASE WHEN date_diff('second',
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
        > 86400 THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id, ts,
    CAST(sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT)
      AS session_id
  FROM marked
)
SELECT user_id, session_id,
  CAST(count(*) AS BIGINT) AS events,
  CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
FROM sessions GROUP BY user_id, session_id"""

    q["events_top_users"] = """
WITH per_user AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS events,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
    CAST(count(DISTINCT event_type) AS BIGINT) AS distinct_types
  FROM events GROUP BY user_id
),
q AS (SELECT quantile_cont(events, 0.95) AS q95 FROM per_user)
SELECT user_id, events, round(total_value, 2) AS total_value, distinct_types
FROM per_user, q WHERE events > q95"""

    # as-of attribution: Spark side is union + window carry-forward;
    # the oracle is DuckDB's NATIVE ASOF LEFT JOIN — two entirely
    # different algorithms agreeing on every row is the point.
    # v is pre-deduped to max(event_id) per (user_id, ts): DuckDB's ASOF
    # is documented nondeterministic when the right side is not unique
    # on the ordering key, while the Spark carry-forward deterministically
    # resolves same-instant ties to the max event_id — the dedup pins the
    # oracle to that same deterministic answer without changing any row
    # where (user_id, ts) is already unique.
    q["events_asof_attribution"] = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
),
v AS (
  SELECT max(event_id) AS view_id, user_id, ts FROM events
  WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.purchase_id, p.user_id,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', p.ts)
    AS BIGINT) AS purchase_ts_sec,
  v.view_id,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', v.ts)
    AS BIGINT) AS view_ts_sec,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', p.ts)
    - date_diff('second', TIMESTAMP '1970-01-01 00:00:00', v.ts)
    AS BIGINT) AS gap_sec
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND v.ts <= p.ts"""

    # exact per-type value quantiles (anchor for approx_percentile)
    q["events_value_quantiles"] = """
SELECT event_type,
  round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
  round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
  round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS p99,
  round(min(CAST(value AS DOUBLE)), 6) AS vmin,
  round(max(CAST(value AS DOUBLE)), 6) AS vmax
FROM events GROUP BY event_type"""

    # exact per-type user reach (anchor for the HLL sketch variant)
    q["events_user_reach"] = """
SELECT event_type,
  CAST(count(*) AS BIGINT) AS events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
FROM events GROUP BY event_type"""

    # C4-style line dedup over 5-token segment "lines": corpus
    # distinct-doc frequency per line, kept-line md5 witness in original
    # order (parallel unnest = posexplode; string_agg ORDER BY pos =
    # array_sort(collect_list(struct(pos, line))))
    q["text_line_dedup"] = """
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
seg AS (
  SELECT doc_id,
    regexp_extract_all(t, '\\S+( \\S+){0,4}') AS lines
  FROM norm
),
lined AS (
  SELECT doc_id,
    unnest(generate_series(1, len(lines))) AS pos,
    unnest(lines) AS line
  FROM seg
),
freq AS (SELECT line, count(DISTINCT doc_id) AS nd FROM lined GROUP BY 1)
SELECT l.doc_id,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_lines,
  round(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    AS dup_line_frac,
  md5(coalesce(string_agg(l.line, chr(10) ORDER BY l.pos)
    FILTER (WHERE f.nd < 2), '')) AS kept_md5
FROM lined l JOIN freq f USING (line)
GROUP BY l.doc_id"""

    # token-length histogram in fixed 16-token buckets per language
    q["text_length_histogram"] = """
WITH norm AS (SELECT doc_id, lang,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
sized AS (
  SELECT lang, len(string_split(t, ' ')) AS n_tokens FROM norm
)
SELECT lang,
  CAST(n_tokens - n_tokens % 16 AS BIGINT) AS bucket_lo,
  CAST(count(*) AS BIGINT) AS docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(min(n_tokens) AS BIGINT) AS min_tokens,
  CAST(max(n_tokens) AS BIGINT) AS max_tokens
FROM sized GROUP BY 1, 2"""

    # per-language vocabulary statistics (types, hapax, TTR)
    q["text_vocab_stats"] = """
WITH norm AS (SELECT doc_id, lang,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
freq AS (
  SELECT lang, unnest(string_split(t, ' ')) AS token FROM norm
),
counts AS (SELECT lang, token, count(*) AS c FROM freq GROUP BY 1, 2)
SELECT lang,
  CAST(sum(c) AS BIGINT) AS total_tokens,
  CAST(count(*) AS BIGINT) AS distinct_types,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_types,
  round(count(*) * 1.0 / sum(c), 6) AS type_token_ratio,
  round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    AS hapax_frac
FROM counts GROUP BY lang"""

    # deterministic fractional upsampling plan: same salted-md5 bucket
    # family, base repeats + literal fractional thresholds
    from .pipelines.sampling import (
        UPSAMPLE_DEFAULT_RATE,
        UPSAMPLE_RATES,
        UPSAMPLE_SALT,
    )

    base_case = "CASE source " + " ".join(
        f"WHEN '{s_}' THEN {int(r)}" for s_, r in UPSAMPLE_RATES.items()
    ) + f" ELSE {int(UPSAMPLE_DEFAULT_RATE)} END"
    frac_case = "CASE source " + " ".join(
        f"WHEN '{s_}' THEN {int(round((r - int(r)) * 10000))}"
        for s_, r in UPSAMPLE_RATES.items()
    ) + (" ELSE "
         f"{int(round((UPSAMPLE_DEFAULT_RATE - int(UPSAMPLE_DEFAULT_RATE)) * 10000))}"
         " END")
    q["sampling_upsample_plan"] = f"""
WITH b AS (
  SELECT doc_id, source,
    CAST(concat('0x', substr(md5('{UPSAMPLE_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS bucket
  FROM documents
)
SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket,
  CAST(({base_case})
    + CASE WHEN bucket < ({frac_case}) THEN 1 ELSE 0 END AS BIGINT)
    AS repeats
FROM b"""

    # deterministic source-mix audit: same salted-md5 bucket as the
    # split/stratified oracles, per-source rate thresholds exact over
    # SPLIT_BUCKETS
    from .pipelines.sampling import (
        MIX_DEFAULT_RATE,
        MIX_RATES,
        MIX_SALT,
        SPLIT_BUCKETS as _MB,
    )

    rate_case = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in MIX_RATES.items()
    ) + f" ELSE {MIX_DEFAULT_RATE} END"
    thr_case = "CASE source " + " ".join(
        f"WHEN '{s}' THEN {int(round(r * _MB))}"
        for s, r in MIX_RATES.items()
    ) + f" ELSE {int(round(MIX_DEFAULT_RATE * _MB))} END"
    q["sampling_source_mix"] = f"""
WITH b AS (
  SELECT doc_id, source, n_chars,
    CAST(concat('0x', substr(md5('{MIX_SALT}:' || CAST(doc_id AS VARCHAR)),
      1, 15)) AS BIGINT) % {_MB} AS bucket,
    {rate_case} AS rate
  FROM documents
),
k AS (
  SELECT *, CASE WHEN bucket < ({thr_case}) THEN 1 ELSE 0 END AS keep
  FROM b
)
SELECT source,
  round(CAST(max(rate) AS DOUBLE), 6) AS target_rate,
  CAST(count(*) AS BIGINT) AS total_docs,
  CAST(sum(keep) AS BIGINT) AS kept_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(n_chars * keep) AS BIGINT) AS kept_chars,
  round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS kept_frac
FROM k GROUP BY source"""

    # temperature-scaled source weights (τ=0.7): share^τ sampling probs
    # + min-share-normalized acceptance rates; doubles rounded to 6 —
    # pow() agreement beyond that is not part of the contract
    q["sampling_temperature_weights"] = """
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS docs
  FROM documents GROUP BY source
),
t AS (
  SELECT CAST(sum(docs) AS DOUBLE) AS total,
    sum(pow(CAST(docs AS DOUBLE), 0.7)) AS pow_sum,
    CAST(min(docs) AS DOUBLE) AS min_docs
  FROM counts
)
SELECT source, docs,
  round(docs / total, 6) AS share,
  round(pow(CAST(docs AS DOUBLE), 0.7) / pow_sum, 6) AS sample_prob,
  round(least(pow((docs / total) / (min_docs / total), 0.7 - 1.0), 1.0), 6)
    AS accept_rate
FROM counts, t"""

    # corpus-trained unigram LM document scores (perplexity-filter proxy):
    # add-one smoothing, identical norm/tokenization as text_vocab_stats
    q["text_unigram_logprob"] = """
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS token FROM norm
),
freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
tot AS (
  SELECT CAST(sum(c) AS DOUBLE) AS T, CAST(count(*) AS DOUBLE) AS V
  FROM freq
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  round(avg(ln((c + 1.0) / (T + V))), 6) AS avg_logprob,
  round(min(ln((c + 1.0) / (T + V))), 6) AS min_logprob
FROM toks JOIN freq USING (token), tot
GROUP BY doc_id"""

    # Q4-shape: EXISTS semi-join, one order-date quarter
    q["tpch_order_priority"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
  )
GROUP BY o_orderpriority"""

    # dataset card: whole-corpus scalars reusing the exact-dedup
    # fingerprint and gopher-rule expressions
    q["dataset_card"] = """
WITH norm AS (SELECT doc_id, source, lang, n_chars,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents),
m AS (
  SELECT doc_id, source, lang, n_chars,
    len(string_split(t, ' ')) AS n_tok,
    length(t) AS nc,
    length(t) - (len(string_split(t, ' ')) - 1) AS nonspace,
    length(t) - length(regexp_replace(t, '[^A-Za-z0-9 ]', '', 'g'))
      AS symbols,
    len(list_filter(string_split(t, ' '),
      x -> x IN ('the','a','of','to','and','is'))) AS stop_hits,
    len(list_distinct(string_split(t, ' '))) AS distinct_toks,
    md5(t) AS fingerprint
  FROM norm
),
k AS (
  SELECT *, CASE WHEN n_tok >= 10 AND n_tok <= 100000
    AND nonspace >= n_tok * 2 AND nonspace <= n_tok * 12
    AND symbols * 10 <= nc * 3
    AND stop_hits >= 1
    AND distinct_toks * 5 >= n_tok THEN 1 ELSE 0 END AS keep
  FROM m
)
SELECT
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
  round(avg(CAST(n_tok AS DOUBLE)), 6) AS mean_tokens,
  CAST(count(DISTINCT fingerprint) AS BIGINT) AS distinct_fingerprints,
  CAST(count(*) - count(DISTINCT fingerprint) AS BIGINT) AS dup_docs,
  CAST(sum(keep) AS BIGINT) AS gopher_keep_docs,
  round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS gopher_keep_frac
FROM k"""

    # bigram LM (conditional upgrade of the unigram proxy): add-one
    # over the unigram vocab, same norm/tokenization
    q["text_bigram_logprob"] = """
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
ta AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
db AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(toks) - 1),
      i -> toks[i])) AS w1,
    unnest(list_transform(generate_series(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM ta WHERE len(toks) >= 2
),
bf AS (SELECT bg, count(*) AS cb FROM db GROUP BY bg),
uf AS (
  SELECT token, count(*) AS cu FROM (
    SELECT unnest(string_split(t, ' ')) AS token FROM norm
  ) GROUP BY token
),
v AS (SELECT count(*) AS V FROM uf)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_bigrams,
  round(avg(ln((cb + 1.0) / (cu + V))), 6) AS avg_logprob,
  round(min(ln((cb + 1.0) / (cu + V))), 6) AS min_logprob
FROM db JOIN bf USING (bg) JOIN uf ON db.w1 = uf.token, v
GROUP BY doc_id"""

    # BM25 against the pinned query terms; same norm/tokenization
    from .pipelines.text import BM25_B, BM25_K1, BM25_QUERY_TERMS

    _terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    q["text_bm25"] = f"""
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
lengths AS (
  SELECT doc_id, len(string_split(t, ' ')) AS dl FROM norm
),
toks AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS token FROM norm
),
matches AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN ({_terms}) GROUP BY 1, 2
),
stats AS (
  SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM lengths
),
dfs AS (SELECT token, count(DISTINCT doc_id) AS df FROM matches GROUP BY 1)
SELECT m.doc_id,
  CAST(count(*) AS BIGINT) AS matched_terms,
  round(sum(
    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    * CAST(tf AS DOUBLE) * {BM25_K1 + 1.0}
    / (CAST(tf AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B}
        + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))
  ), 6) AS bm25
FROM matches m
JOIN dfs USING (token)
JOIN lengths USING (doc_id), stats
GROUP BY m.doc_id"""

    # Gopher-style rule flags: integer cross-multiplied thresholds over
    # the shared normalized tokenization
    q["text_gopher_flags"] = """
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
m AS (
  SELECT doc_id,
    len(string_split(t, ' ')) AS n_tok,
    length(t) AS n_chars,
    length(t) - (len(string_split(t, ' ')) - 1) AS nonspace,
    length(t) - length(regexp_replace(t, '[^A-Za-z0-9 ]', '', 'g'))
      AS symbols,
    len(list_filter(string_split(t, ' '),
      x -> x IN ('the','a','of','to','and','is'))) AS stop_hits,
    len(list_distinct(string_split(t, ' '))) AS distinct_toks
  FROM norm
)
SELECT doc_id,
  (n_tok >= 10 AND n_tok <= 100000) AS word_count_ok,
  (nonspace >= n_tok * 2 AND nonspace <= n_tok * 12) AS mean_word_len_ok,
  (symbols * 10 <= n_chars * 3) AS symbol_ratio_ok,
  (stop_hits >= 1) AS has_stopwords,
  (distinct_toks * 5 >= n_tok) AS diversity_ok,
  CAST(
    CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 0 ELSE 1 END
    + CASE WHEN nonspace >= n_tok * 2 AND nonspace <= n_tok * 12
        THEN 0 ELSE 1 END
    + CASE WHEN symbols * 10 <= n_chars * 3 THEN 0 ELSE 1 END
    + CASE WHEN stop_hits >= 1 THEN 0 ELSE 1 END
    + CASE WHEN distinct_toks * 5 >= n_tok THEN 0 ELSE 1 END
    AS BIGINT) AS n_failed,
  (CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 0 ELSE 1 END
    + CASE WHEN nonspace >= n_tok * 2 AND nonspace <= n_tok * 12
        THEN 0 ELSE 1 END
    + CASE WHEN symbols * 10 <= n_chars * 3 THEN 0 ELSE 1 END
    + CASE WHEN stop_hits >= 1 THEN 0 ELSE 1 END
    + CASE WHEN distinct_toks * 5 >= n_tok THEN 0 ELSE 1 END) = 0
    AS keep
FROM m"""

    # chi-square contingency of (lang x source)
    q["corpus_lang_source_assoc"] = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS observed
  FROM documents GROUP BY 1, 2
),
lm AS (SELECT lang, sum(observed) AS lang_total FROM cells GROUP BY 1),
sm AS (SELECT source, sum(observed) AS src_total FROM cells GROUP BY 1),
t AS (SELECT sum(observed) AS total FROM cells)
SELECT lang, source, observed,
  round(CAST(lang_total AS DOUBLE) * src_total / total, 6) AS expected,
  round(pow(observed - CAST(lang_total AS DOUBLE) * src_total / total, 2)
    / (CAST(lang_total AS DOUBLE) * src_total / total), 6) AS chi2_term
FROM cells JOIN lm USING (lang) JOIN sm USING (source), t"""

    # PSI drift between the train/val hash splits over 16-token length
    # buckets (Laplace-smoothed shares); split thresholds interpolated
    # from the SAME weights dict sampling_split uses
    from .pipelines.sampling import DEFAULT_WEIGHTS, SPLIT_BUCKETS as _SB

    _train_end = int(DEFAULT_WEIGHTS["train"] * _SB)
    _val_end = _train_end + int(DEFAULT_WEIGHTS["val"] * _SB)
    q["corpus_split_drift_psi"] = f"""
WITH norm AS (SELECT doc_id,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents),
tagged AS (
  SELECT doc_id,
    CASE WHEN CAST(concat('0x', substr(md5('split:'
        || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % {_SB}
        < {_train_end}
      THEN 'train'
      WHEN CAST(concat('0x', substr(md5('split:'
        || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % {_SB}
        < {_val_end}
      THEN 'val' ELSE 'test' END AS split,
    len(string_split(t, ' ')) - len(string_split(t, ' ')) % 16
      AS len_bucket
  FROM norm
),
counts AS (
  SELECT split, len_bucket, count(*) AS n FROM tagged
  WHERE split IN ('train', 'val') GROUP BY 1, 2
),
a AS (SELECT len_bucket, n AS n_train FROM counts WHERE split = 'train'),
b AS (SELECT len_bucket, n AS n_val FROM counts WHERE split = 'val'),
j AS (
  SELECT coalesce(a.len_bucket, b.len_bucket) AS len_bucket,
    coalesce(n_train, 0) AS n_train, coalesce(n_val, 0) AS n_val
  FROM a FULL OUTER JOIN b ON a.len_bucket = b.len_bucket
),
t AS (
  SELECT sum(n_train) AS t_train, sum(n_val) AS t_val,
    count(*) AS n_buckets
  FROM j
)
SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
  CAST(n_train AS BIGINT) AS n_train, CAST(n_val AS BIGINT) AS n_val,
  round(
    ((n_train + 1.0) / (t_train + n_buckets)
      - (n_val + 1.0) / (t_val + n_buckets))
    * ln(((n_train + 1.0) / (t_train + n_buckets))
       / ((n_val + 1.0) / (t_val + n_buckets))), 6) AS psi_term
FROM j, t"""

    # NTILE decile segmentation: totally-ordered input (exact DECIMAL
    # totals desc, user asc) makes bucket assignment engine-identical
    q["events_user_deciles"] = """
WITH totals AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS events,
    sum(CAST(value AS DECIMAL(18,2))) AS d_total
  FROM events GROUP BY user_id
),
bucketed AS (
  SELECT *, ntile(10) OVER (ORDER BY d_total DESC, user_id ASC) AS decile
  FROM totals
)
SELECT CAST(decile AS BIGINT) AS decile,
  CAST(count(*) AS BIGINT) AS users,
  CAST(sum(events) AS BIGINT) AS events,
  CAST(sum(d_total) AS DOUBLE) AS total_value,
  CAST(min(d_total) AS DOUBLE) AS min_value,
  CAST(max(d_total) AS DOUBLE) AS max_value
FROM bucketed GROUP BY decile"""

    # fuzzy name self-join: the oracle brute-forces all-pairs
    # levenshtein over the dim-sized distinct-name set; the Spark side
    # goes through SymSpell deletion-neighborhood candidates
    q["fuzzy_name_pairs"] = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_a, b.name AS name_b,
  CAST(levenshtein(a.name, b.name) AS BIGINT) AS distance
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2"""

    # schema-on-read over the JSON props column: the oracle parses with
    # a regex where Spark uses from_json — independent parsers, same
    # values
    q["events_props_stats"] = """
WITH parsed AS (
  SELECT event_type,
    CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS events,
  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS parse_errors,
  CAST(sum(k) AS BIGINT) AS k_sum,
  CAST(min(k) AS BIGINT) AS k_min,
  CAST(max(k) AS BIGINT) AS k_max,
  round(avg(k), 6) AS k_avg
FROM parsed GROUP BY event_type"""

    # long->wide pivot with a pinned type list (conditional aggregation
    # in both engines)
    q["events_type_day_pivot"] = """
SELECT CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
    / 86400) AS BIGINT) AS day,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
    AS click_events,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
    AS error_events,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS purchase_events,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
    AS signup_events,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
    AS view_events
FROM events GROUP BY 1"""

    # window-frame pair: ROWS cumulative + RANGE trailing-7d (peer rows
    # in-frame by SQL-standard RANGE semantics — engine-identical)
    q["events_running_totals"] = """
SELECT user_id, event_id,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
    AS BIGINT) AS ts_sec,
  CAST(count(*) OVER rw AS BIGINT) AS running_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER rw AS DOUBLE)
    AS running_value,
  CAST(count(*) OVER gw AS BIGINT) AS trailing_7d_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER gw AS DOUBLE)
    AS trailing_7d_value
FROM events
WINDOW
  rw AS (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  gw AS (PARTITION BY user_id
    ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)"""

    # Q11-shape: HAVING over a global aggregate, threshold cross-
    # multiplied in DECIMAL (exact at every scale)
    q["tpch_important_parts"] = """
WITH per_part AS (
  SELECT l_partkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS d_value
  FROM lineitem GROUP BY l_partkey
),
tot AS (
  SELECT sum(d_value) AS d_total, count(*) AS n_parts FROM per_part
)
SELECT l_partkey,
  CAST(d_value AS DOUBLE) AS part_value,
  round(CAST(d_value / d_total AS DOUBLE), 6) AS value_share
FROM per_part, tot
WHERE d_value * n_parts * 10 > d_total * 11"""

    # Q18-shape: aggregate-then-rejoin (HAVING output drives the join)
    q["tpch_large_quantity_orders"] = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS d_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c_name, o_orderkey,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
    AS BIGINT) AS o_orderdate_sec,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(d_qty AS DOUBLE) AS total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey"""

    # Q17-shape: correlated scalar subquery decorrelated, DECIMAL
    # cross-multiplied per-part threshold
    q["tpch_small_quantity_revenue"] = """
WITH per_part AS (
  SELECT l_partkey AS p_key,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
    count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
    / CAST(7 AS DECIMAL(18,2)) AS DOUBLE), 2) AS avg_yearly,
  CAST(count(*) AS BIGINT) AS small_lineitems
FROM lineitem JOIN per_part ON l_partkey = p_key
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty"""

    # Q22-shape: NOT-EXISTS anti-join over a global-average predicate
    # (positive balances only), DECIMAL cross-multiplied
    q["tpch_idle_rich_customers"] = """
WITH t AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal,
    count(*) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
  CAST(count(*) AS BIGINT) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, t
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > sum_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderpriority = '1-URGENT'
      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  )
GROUP BY c_nationkey"""

    # Q13-shape: left-outer join + double aggregation (zero-order
    # customers MUST appear as the c_count = 0 row)
    q["tpch_customer_distribution"] = """
WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count"""

    # Q16-shape: anti-join exclusion + count-distinct suppliers over the
    # observed lineitem part↔supplier bridge
    q["tpch_brand_supplier_stats"] = """
WITH complaint AS (
  SELECT l_suppkey FROM lineitem GROUP BY l_suppkey
  HAVING sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 3 > count(*)
),
bridge AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_suppkey NOT IN (SELECT l_suppkey FROM complaint)
)
SELECT p_brand, p_size,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN bridge ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_size < 30
GROUP BY p_brand, p_size"""

    # window-rank top-k inside each group; DECIMAL totals make the rank
    # key exact so the (total desc, user asc) tie-break is engine-stable
    q["events_topk_per_type"] = """
WITH totals AS (
  SELECT event_type, user_id,
    CAST(count(*) AS BIGINT) AS events,
    sum(CAST(value AS DECIMAL(18,2))) AS d_total
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, user_id, events, d_total,
    row_number() OVER (
      PARTITION BY event_type ORDER BY d_total DESC, user_id ASC
    ) AS rank
  FROM totals
)
SELECT event_type, CAST(rank AS INTEGER) AS rank, user_id, events,
  CAST(d_total AS DOUBLE) AS total_value
FROM ranked WHERE rank <= 3"""

    # hierarchical ROLLUP (leaf / per-type subtotal / grand total in one
    # pass); sentinel-coalesced keys + explicit grouping level for
    # hash-stable comparison. Spark GROUPING_ID bit order: first rollup
    # column = most significant bit — identical to DuckDB's GROUPING().
    q["events_rollup"] = """
SELECT
  coalesce(event_type, '(all)') AS event_type,
  CAST(coalesce(CAST(floor(date_diff('second',
      TIMESTAMP '1970-01-01 00:00:00', ts) / 86400) AS BIGINT), -1)
    AS BIGINT) AS day,
  CAST(GROUPING(event_type) * 2 + GROUPING(
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT)) AS BIGINT) AS grouping_level,
  CAST(count(*) AS BIGINT) AS events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (event_type,
  CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
    / 86400) AS BIGINT))"""

    # range (interval) join: clicks in the hour before each purchase.
    # The oracle states the inequality join directly; the Spark plan is
    # the bucketized equi-join — two different algorithms, same rows.
    # INTERVAL arithmetic on TIMESTAMP is microsecond-exact in both.
    q["events_preceding_window_join"] = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events
  WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts AS c_ts, CAST(value AS DECIMAL(18,2)) AS c_value
  FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id, p.user_id,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', p.p_ts)
    AS BIGINT) AS purchase_ts_sec,
  CAST(count(c.c_ts) AS BIGINT) AS clicks_1h,
  CAST(coalesce(sum(c.c_value), 0) AS DOUBLE) AS click_value_1h
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
  AND c.c_ts > p.p_ts - INTERVAL 1 HOUR
  AND c.c_ts <= p.p_ts
GROUP BY 1, 2, 3"""

    # Q15-shape: view + HAVING = MAX(view); DECIMAL revenue so the
    # equality against the max is exact in both engines
    q["tpch_top_supplier"] = """
WITH per_supp AS (
  SELECT l_suppkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS d_rev,
    count(*) AS lineitems
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT l_suppkey AS s_suppkey, s_name,
  CAST(round(d_rev, 2) AS DOUBLE) AS total_revenue,
  CAST(lineitems AS BIGINT) AS lineitems
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE d_rev = (SELECT max(d_rev) FROM per_supp)"""

    # Q2-shape: correlated MIN stated directly as a correlated subquery
    # (the Spark side decorrelates into agg + window argmin — two
    # different algorithms). Pure MIN of DECIMAL, no division; ties to
    # the lowest suppkey.
    q["tpch_min_cost_supplier"] = """
WITH supp AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
offers AS (
  SELECT l_partkey, l_suppkey, s_name, n_name,
    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS d_cost
  FROM lineitem JOIN supp ON l_suppkey = s_suppkey
  GROUP BY 1, 2, 3, 4
)
SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, s_name, n_name,
  CAST(d_cost AS DOUBLE) AS min_cost
FROM offers o
WHERE (d_cost, l_suppkey) = (
  SELECT (min(d_cost), min(i.l_suppkey)) FROM offers i
  WHERE i.l_partkey = o.l_partkey
    AND i.d_cost = (SELECT min(d_cost) FROM offers m
                    WHERE m.l_partkey = o.l_partkey)
)"""

    # Q21-shape: the literal double correlation — EXISTS another
    # supplier in the order, NOT EXISTS another LATE supplier (the
    # Spark side folds both into one per-order aggregate)
    q["tpch_waiting_orders"] = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
    (l_shipdate > o_orderdate + INTERVAL 180 DAY) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT l1.l_suppkey AS s_suppkey, s_name,
  CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.is_late
  AND EXISTS (
    SELECT 1 FROM li l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM li l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late
  )
GROUP BY 1, 2"""

    # Q14-shape: conditional aggregation share per month; sums DECIMAL,
    # only the final share divides (then round 6 — the value_share
    # pattern)
    q["tpch_promo_share"] = """
SELECT
  CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR)
    AS ship_month,
  CAST(round(sum(CASE WHEN p_type = 'PROMO'
    THEN CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
    ELSE CAST(0 AS DECIMAL(38,4)) END), 2) AS DOUBLE) AS promo_revenue,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
    AS DOUBLE) AS total_revenue,
  round(CAST(sum(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS DOUBLE), 6) AS promo_share,
  CAST(count(*) AS BIGINT) AS lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1"""

    # native session_window's semantics stated as gaps-and-islands with
    # EXACT microsecond interval comparisons (new session iff
    # ts >= prev_ts + gap; window end = last_ts + gap)
    q["events_session_window"] = """
WITH marked AS (
  SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS d_value,
    CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        + INTERVAL 12 HOUR THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts, d_value,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', min(ts))
    AS BIGINT) AS session_start_sec,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
    max(ts) + INTERVAL 12 HOUR) AS BIGINT) AS session_end_sec,
  CAST(count(*) AS BIGINT) AS events,
  CAST(sum(d_value) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, sid"""

    # GROUPING SETS + grouping-id bitmask (first column most
    # significant in both engines)
    q["events_grouping_sets"] = """
SELECT event_type,
  CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
    / 86400) AS BIGINT) AS day_idx,
  CAST(GROUPING(event_type,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT)) AS BIGINT) AS gid,
  CAST(count(*) AS BIGINT) AS events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY GROUPING SETS ((1, 2), (1), (2), ())"""

    # exact heavy hitters: integer cross-multiplied share threshold
    q["events_heavy_hitters"] = """
WITH per_user AS (
  SELECT user_id, count(*) AS events FROM events GROUP BY user_id
),
t AS (SELECT count(*) AS n_total FROM events)
SELECT user_id, CAST(events AS BIGINT) AS events,
  round(CAST(events AS DOUBLE) / n_total, 6) AS share
FROM per_user, t
WHERE events * 1000 > 8 * n_total"""

    # Z-order codes: the SAME generated bit-interleave expression the
    # Spark side runs (sinks/layout.py morton_expr — one source of
    # truth, two engines)
    from .sinks.layout import morton_expr

    q["events_zorder_codes"] = f"""
SELECT event_id, ux, dy, {morton_expr("ux", "dy")} AS zkey
FROM (
  SELECT event_id,
    user_id % 65536 AS ux,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT) % 65536 AS dy
  FROM events
) b"""

    # Q3-shape: segment-filtered unshipped revenue per order
    q["tpch_shipping_priority"] = """
SELECT l_orderkey,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
    AS BIGINT) AS o_orderdate_sec,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
    AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-07-01 00:00:00'
GROUP BY 1, 2"""

    # Q6-shape: single selective scan, no joins
    q["tpch_forecast_revenue"] = """
SELECT
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue_delta,
  CAST(count(*) AS BIGINT) AS lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24"""

    # Q7-shape: both-directions bi-nation volume by ship year
    q["tpch_nation_volume"] = """
WITH nat AS (
  SELECT n_nationkey, n_name FROM nation
  WHERE n_name IN ('NATION_3', 'NATION_7')
)
SELECT s.n_name AS supp_nation, c.n_name AS cust_nation,
  CAST(year(l_shipdate) AS BIGINT) AS l_year,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
    AS DOUBLE) AS volume,
  CAST(count(*) AS BIGINT) AS lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nat s ON s_nationkey = s.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nat c ON c_nationkey = c.n_nationkey
WHERE s.n_name <> c.n_name
GROUP BY 1, 2, 3"""

    # Q9-shape: substring-filtered 5-table star, (nation, order-year)
    q["tpch_product_profit"] = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
    AS DOUBLE) AS amount,
  CAST(count(*) AS BIGINT) AS lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2"""

    # Q10-shape: returned-revenue per customer for one quarter
    q["tpch_returned_items"] = """
SELECT c_custkey, c_name, n_name,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
    AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS returned_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY 1, 2, 3"""

    # Q19-shape: OR-of-ANDs bracket predicate
    q["tpch_disjunctive_revenue"] = """
SELECT
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
    AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE
  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
    AND l_quantity BETWEEN 1 AND 15)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
    AND l_quantity BETWEEN 10 AND 25)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 15 AND 50
    AND l_quantity BETWEEN 20 AND 35)"""

    # Q20-shape: nested aggregate threshold, DECIMAL cross-multiplied
    q["tpch_excess_promo_suppliers"] = """
WITH per_sp AS (
  SELECT l_suppkey, l_partkey,
    sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        THEN CAST(l_quantity AS DECIMAL(18,2))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_1996,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_all
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
  GROUP BY 1, 2
)
SELECT l_suppkey AS s_suppkey, s_name,
  CAST(count(*) AS BIGINT) AS hot_parts,
  CAST(round(sum(qty_1996), 2) AS DOUBLE) AS qty_1996_total
FROM per_sp JOIN supplier ON l_suppkey = s_suppkey
WHERE qty_1996 * 2 > qty_all
GROUP BY 1, 2"""

    # co-purchase degree: oracle derives edges via SELF-JOIN on order
    # baskets (the Spark side explodes collected baskets — two different
    # algorithms, same graph)
    q["graph_part_degree"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    CAST(count(*) AS BIGINT) AS weight
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS (
  SELECT part_a AS part, weight FROM pairs
  UNION ALL
  SELECT part_b AS part, weight FROM pairs
)
SELECT part, CAST(count(*) AS BIGINT) AS degree,
  CAST(sum(weight) AS BIGINT) AS total_weight
FROM b GROUP BY part"""

    # triangles via three keyed self-joins of the a<b edge list (each
    # triangle counted once); wedges = Σ C(deg,2); one division, round 6
    q["graph_clustering"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS triangles
  FROM e ab JOIN e bc ON ab.part_b = bc.part_a
  JOIN e ac ON ac.part_a = ab.part_a AND ac.part_b = bc.part_b
),
deg AS (
  SELECT part, count(*) AS d FROM (
    SELECT part_a AS part FROM e
    UNION ALL SELECT part_b AS part FROM e
  ) GROUP BY part
),
w AS (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS wedges FROM deg)
SELECT triangles, wedges,
  round(3.0 * triangles / wedges, 6) AS global_clustering
FROM tri, w"""

    # per-node clustering: triangles attributed to all three vertices,
    # wedge capacity C(d,2), degree-<2 nodes excluded in both engines
    q["graph_local_clustering"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT ab.part_a AS a, ab.part_b AS b, bc.part_b AS c
  FROM e ab JOIN e bc ON ab.part_b = bc.part_a
  JOIN e ac ON ac.part_a = ab.part_a AND ac.part_b = bc.part_b
),
per_node AS (
  SELECT part, count(*) AS triangles FROM (
    SELECT a AS part FROM tri
    UNION ALL SELECT b AS part FROM tri
    UNION ALL SELECT c AS part FROM tri
  ) GROUP BY part
),
deg AS (
  SELECT part, count(*) AS degree FROM (
    SELECT part_a AS part FROM e
    UNION ALL SELECT part_b AS part FROM e
  ) GROUP BY part
)
SELECT d.part, CAST(d.degree AS BIGINT) AS degree,
  CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
  round(CAST(coalesce(p.triangles, 0) AS DOUBLE)
    / ((d.degree * (d.degree - 1)) // 2), 6) AS local_clustering
FROM deg d LEFT JOIN per_node p ON d.part = p.part
WHERE d.degree >= 2"""

    # association rules a→b: exact integer counts, ratios divide last
    q["graph_association_rules"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    CAST(count(*) AS BIGINT) AS weight
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
),
directed AS (
  SELECT part_a AS antecedent, part_b AS consequent, weight FROM pairs
  UNION ALL
  SELECT part_b AS antecedent, part_a AS consequent, weight FROM pairs
),
per_part AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM baskets GROUP BY 1
),
t AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS total_orders
  FROM baskets
)
SELECT antecedent, consequent, weight AS cooccur_orders,
  a.n_orders AS orders_a, b.n_orders AS orders_b,
  round(CAST(weight AS DOUBLE) / a.n_orders, 6) AS confidence,
  round(CAST(weight * total_orders AS DOUBLE)
    / (a.n_orders * b.n_orders), 6) AS lift
FROM directed
JOIN per_part a ON antecedent = a.l_partkey
JOIN per_part b ON consequent = b.l_partkey
CROSS JOIN t"""

    # Q8-shape: conditional-aggregation market share per order year
    q["tpch_market_share"] = """
WITH rnat AS (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
j AS (
  SELECT year(o_orderdate) AS o_year, n_name AS supp_nation,
    CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN rnat ON c_nationkey = rnat.n_nationkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT CAST(o_year AS BIGINT) AS o_year,
  CAST(round(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
    ELSE CAST(0 AS DECIMAL(38,4)) END), 2) AS DOUBLE) AS nation_revenue,
  CAST(round(sum(rev), 2) AS DOUBLE) AS total_revenue,
  round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
      ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
    / CAST(sum(rev) AS DOUBLE), 6) AS market_share,
  CAST(count(*) AS BIGINT) AS lineitems
FROM j GROUP BY 1"""

    # ANALYZE-style exact column stats + fixed-width histogram; the
    # bucket arithmetic is the IDENTICAL double expression order
    # ((v - vmin) * 8.0 / (vmax - vmin)) in both engines
    def _colstats(c: str) -> str:
        return f"""
SELECT '{c}' AS "column",
  CAST(CASE WHEN vmax = vmin THEN 0
    ELSE least(7, floor(({c} - vmin) * 8.0 / (vmax - vmin))) END
    AS BIGINT) AS bucket,
  CAST(count(*) AS BIGINT) AS rows,
  round(CAST(vmin AS DOUBLE), 6) AS vmin,
  round(CAST(vmax AS DOUBLE), 6) AS vmax,
  CAST(ndv AS BIGINT) AS ndv,
  round(CAST(nulls AS DOUBLE) / n, 6) AS null_frac
FROM (SELECT * FROM lineitem WHERE {c} IS NOT NULL) li
CROSS JOIN (
  SELECT min({c}) AS vmin, max({c}) AS vmax, count(*) AS n,
    sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nulls,
    count(DISTINCT {c}) AS ndv
  FROM lineitem
) s
GROUP BY 1, 2, vmin, vmax, n, nulls, ndv"""

    q["table_column_stats"] = "\nUNION ALL\n".join(
        _colstats(c)
        for c in ("l_quantity", "l_extendedprice", "l_discount")
    )

    # §2.6 analytic-function battery: one user-keyed window
    q["events_window_functions"] = """
SELECT user_id, event_id,
  round(percent_rank() OVER vw, 6) AS value_pct_rank,
  round(cume_dist() OVER vw, 6) AS value_cume_dist,
  first_value(event_id) OVER fw AS first_event_id,
  last_value(event_id) OVER fw AS last_event_id,
  nth_value(event_id, 2) OVER fw AS second_event_id,
  CAST(date_diff('second', ts, lead(ts) OVER sw) AS BIGINT)
    AS gap_to_next_sec
FROM events
WINDOW
  vw AS (PARTITION BY user_id ORDER BY value, event_id),
  sw AS (PARTITION BY user_id ORDER BY ts, event_id),
  fw AS (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""

    # §2.7 set operations: INTERSECT / EXCEPT ALL / UNION
    q["events_set_ops"] = """
WITH p AS (SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase'),
e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT 'purchase_and_error' AS cohort, user_id
FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
UNION ALL
SELECT 'purchase_only', user_id
FROM (SELECT user_id FROM p EXCEPT ALL SELECT user_id FROM e)
UNION ALL
SELECT 'purchase_or_error', user_id
FROM (SELECT user_id FROM p UNION SELECT user_id FROM e)"""

    # TWAP: interval-weighted mean for irregular samples; the last
    # sample per type (no successor) is excluded on both sides
    q["events_time_weighted_avg"] = """
WITH wgt AS (
  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS d_value,
    CAST(date_diff('second', ts, lead(ts) OVER (
      PARTITION BY event_type ORDER BY ts, event_id)) AS BIGINT) AS dt
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS samples,
  CAST(sum(dt) AS BIGINT) AS total_sec,
  round(CAST(sum(d_value * dt) / sum(dt) AS DOUBLE), 6)
    AS time_weighted_value,
  round(CAST(sum(d_value) / count(*) AS DOUBLE), 6) AS plain_avg
FROM wgt WHERE dt IS NOT NULL
GROUP BY event_type"""

    # daily grid + LOCF gap fill (generate_series vs sequence/explode —
    # different grid generators, same series)
    q["events_daily_locf"] = """
WITH base AS (
  SELECT event_type,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT) AS day,
    CAST(value AS DECIMAL(18,2)) AS v, ts, event_id
  FROM events
),
daily AS (
  SELECT event_type, day, v AS close_value FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type, day
      ORDER BY ts DESC, event_id DESC) AS rn
    FROM base
  ) WHERE rn = 1
),
spans AS (
  SELECT event_type, min(day) AS d0, max(day) AS d1 FROM base
  GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(d0, d1)) AS day FROM spans
)
SELECT g.event_type, g.day,
  CAST(last_value(d.close_value IGNORE NULLS) OVER (
    PARTITION BY g.event_type ORDER BY g.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS value,
  CAST(CASE WHEN d.close_value IS NULL THEN 1 ELSE 0 END AS BIGINT)
    AS gap_filled
FROM grid g LEFT JOIN daily d
  ON g.event_type = d.event_type AND g.day = d.day"""

    # equi-depth histogram via ntile over a TOTAL order (deterministic)
    q["events_equi_depth_hist"] = """
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
  CAST(count(*) AS BIGINT) AS rows,
  round(min(value), 6) AS lo, round(max(value), 6) AS hi
FROM (
  SELECT event_type, value,
    ntile(8) OVER (PARTITION BY event_type ORDER BY value, event_id)
      AS bucket
  FROM events
)
GROUP BY 1, 2"""

    # first-order Markov transition matrix: exact bigram counts,
    # probability divides last
    q["events_type_transitions"] = """
WITH bg AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS transitions
  FROM (
    SELECT event_type AS from_type,
      lead(event_type) OVER (PARTITION BY user_id
        ORDER BY ts, event_id) AS to_type
    FROM events
  )
  WHERE to_type IS NOT NULL
  GROUP BY 1, 2
),
t AS (
  SELECT from_type, CAST(sum(transitions) AS BIGINT) AS n_from
  FROM bg GROUP BY 1
)
SELECT bg.from_type, bg.to_type, bg.transitions, t.n_from,
  round(CAST(bg.transitions AS DOUBLE) / t.n_from, 6) AS p
FROM bg JOIN t ON bg.from_type = t.from_type"""

    # robust MAD anomaly flags; exact interpolated medians both engines
    q["events_mad_anomalies"] = """
WITH daily AS (
  SELECT event_type,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT) AS day,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, quantile_cont(x, 0.5) AS med FROM daily GROUP BY 1
),
mad AS (
  SELECT d.event_type, quantile_cont(abs(d.x - m.med), 0.5) AS mad,
    any_value(m.med) AS med
  FROM daily d JOIN med m ON d.event_type = m.event_type
  GROUP BY 1
)
SELECT d.event_type, d.day,
  round(d.x, 6) AS value,
  round(a.med, 6) AS median,
  round(a.mad, 6) AS mad,
  round(abs(d.x - a.med) / (1.4826 * a.mad), 6) AS robust_z,
  CAST(CASE WHEN abs(d.x - a.med) > 2.0 * 1.4826 * a.mad
    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM daily d JOIN mad a ON d.event_type = a.event_type"""

    # Zipf fit: log-log regression over deterministic vocabulary ranks
    q["text_zipf_fit"] = """
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
    FROM documents
  )
  WHERE w <> ''
  GROUP BY w
),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, w ASC) AS rank
  FROM words
)
SELECT CAST(count(*) AS BIGINT) AS n_types,
  CAST(sum(freq) AS BIGINT) AS n_tokens,
  round(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
    AS zipf_slope,
  round(regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
    AS r2
FROM ranked"""

    # embedding split drift: per-dim centroids via list indexing
    # (Spark posexplodes — two different element-extraction algorithms)
    q["emb_split_centroid_drift"] = """
WITH per_dim AS (
  SELECT CASE WHEN vec_id % 10 < 8 THEN 'train' ELSE 'val' END AS split,
    g.i AS dim,
    sum(CAST(embedding[g.i + 1] AS DOUBLE)) / count(*) AS mu
  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i) g
  GROUP BY 1, 2
),
j AS (
  SELECT t.dim, t.mu AS mu_t, v.mu AS mu_v
  FROM (SELECT dim, mu FROM per_dim WHERE split = 'train') t
  JOIN (SELECT dim, mu FROM per_dim WHERE split = 'val') v
    ON t.dim = v.dim
)
SELECT CAST(count(*) AS BIGINT) AS dims,
  round(sqrt(sum((mu_t - mu_v) * (mu_t - mu_v))), 6) AS l2_drift,
  round(sum(mu_t * mu_v)
    / (sqrt(sum(mu_t * mu_t)) * sqrt(sum(mu_v * mu_v))), 6)
    AS centroid_cosine
FROM j"""

    # Daily-count autocorrelation: integer-exact co-moments (BIGINT
    # sums promote to HUGEINT) then ONE double formula, like Spark's
    # decimal(38,0) sums — no float accumulates across rows
    q["events_daily_acf"] = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1
),
pairs AS (
  SELECT l.lag, x.c AS x, y.c AS y
  FROM daily x
  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l
  JOIN daily y ON x.day - l.lag = y.day
),
m AS (
  SELECT lag, count(*) AS n_pairs,
    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
    sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
  round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
FROM m"""

    # Day-of-week seasonal index: weekday slot is epoch_day % 7 (pure
    # integer arithmetic — NOT dayofweek(), whose week origin differs
    # across engines); means are exact-integer rationals divided once
    q["events_dow_seasonality"] = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1
),
overall AS (SELECT avg(c) AS overall_avg FROM daily)
SELECT day % 7 AS dow_slot, CAST(count(*) AS BIGINT) AS n_days,
  round(avg(c), 6) AS avg_events,
  round(avg(c) / any_value(overall_avg), 6) AS seasonal_index
FROM daily, overall
GROUP BY day % 7"""

    # Kaplan–Meier user-lifetime survival: cumulative exp-sum-ln
    # product over the bounded lifetime grain; sum order pinned by the
    # lifetime ordering in both engines
    q["events_survival_km"] = """
WITH per_user AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
  FROM events GROUP BY user_id
),
horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
lives AS (
  SELECT CAST(datediff('day', f, l) AS BIGINT) AS t,
    CASE WHEN datediff('day', l, h) >= 1 THEN 1 ELSE 0 END AS observed
  FROM per_user, horizon
),
grain AS (
  SELECT t, sum(observed) AS d_events,
    sum(1 - observed) AS c_censored
  FROM lives GROUP BY t
),
n AS (SELECT count(*) AS n_total FROM lives),
ar AS (
  SELECT g.t, g.d_events, g.c_censored, n.n_total
    - coalesce(sum(g.d_events + g.c_censored) OVER (
        ORDER BY g.t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS n_risk
  FROM grain g, n
),
s AS (
  SELECT *, sum(CASE WHEN d_events > 0
      THEN ln(1.0 - CAST(d_events AS DOUBLE) / n_risk)
      ELSE 0.0 END) OVER (
      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS log_surv
  FROM ar
)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
  CAST(d_events AS BIGINT) AS d_events,
  CAST(c_censored AS BIGINT) AS c_censored,
  round(exp(log_surv), 6) AS survival
FROM s WHERE d_events > 0"""

    # Rocchio nearest-label-centroid classification: per-dim avg
    # centroids via list indexing (Spark posexplodes), cosine argmax
    # with ties to the LARGEST label — row_number (cosine DESC, cand
    # DESC) mirrors Spark's max-of-struct order
    q["emb_label_centroids"] = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings
),
cent AS (
  SELECT label, g.i AS dim,
    sum(emb[g.i + 1]) / count(*) AS mu
  FROM e, (SELECT unnest(generate_series(0, 63)) AS i) g
  GROUP BY 1, 2
),
centv AS (
  SELECT label, list(mu ORDER BY dim) AS c FROM cent GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label, cv.label AS cand,
    round(list_cosine_similarity(e.emb, cv.c), 6) AS cosine
  FROM e CROSS JOIN centv cv
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, cand DESC) AS rn
  FROM scored
)
SELECT vec_id, label, cand AS predicted_label, cosine,
  (cand = label) AS correct
FROM ranked WHERE rn = 1"""

    # dynamic-gap session windows: interval-UNION semantics — a new
    # session starts iff ts >= the running max of prior proposed ends
    q["events_session_window_dynamic"] = """
WITH g AS (
  SELECT user_id, event_type, ts,
    CAST(value AS DECIMAL(18,2)) AS d_value,
    ts + CASE WHEN event_type = 'click' THEN INTERVAL 2 HOUR
      ELSE INTERVAL 12 HOUR END AS pend
  FROM events
),
mk AS (
  SELECT *, CASE WHEN max(pend) OVER (
      PARTITION BY user_id, event_type ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) <= ts
    THEN 1 ELSE 0 END AS new_session
  FROM g
),
sess AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id, event_type ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM mk
)
SELECT user_id, event_type,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', min(ts))
    AS BIGINT) AS session_start_sec,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', max(pend))
    AS BIGINT) AS session_end_sec,
  CAST(count(*) AS BIGINT) AS events,
  CAST(sum(d_value) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, event_type, sid"""

    # salted two-phase aggregate: the oracle is the DIRECT single-pass
    # aggregate — associativity is the claim under test
    q["events_top_users_salted"] = """
SELECT user_id,
  CAST(count(*) AS BIGINT) AS events,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
    AS total_value
FROM events GROUP BY user_id"""

    # deterministic pseudonymization: identical md5 both engines
    q["events_pseudonymized"] = """
SELECT event_id,
  md5('pepper-42:' || CAST(user_id AS VARCHAR)) AS user_token,
  ts, event_type, value
FROM events"""

    # winsorized stats: exact interpolated percentiles, least/greatest
    # clipping, one conditional pass
    q["events_winsorized_stats"] = """
WITH q AS (
  SELECT event_type,
    quantile_cont(value, 0.01) AS p01,
    quantile_cont(value, 0.99) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_type,
  CAST(count(*) AS BIGINT) AS n,
  round(any_value(q.p01), 6) AS p01,
  round(any_value(q.p99), 6) AS p99,
  round(avg(e.value), 6) AS mean_raw,
  round(avg(least(greatest(e.value, q.p01), q.p99)), 6)
    AS mean_winsorized,
  CAST(sum(CASE WHEN e.value < q.p01 OR e.value > q.p99
    THEN 1 ELSE 0 END) AS BIGINT) AS clipped_rows
FROM events e JOIN q ON e.event_type = q.event_type
GROUP BY e.event_type"""

    # k-anonymity audit over the (event_type, day) quasi-identifier
    q["events_k_anonymity"] = """
WITH classes AS (
  SELECT event_type,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT) AS day,
    count(*) AS class_size
  FROM events GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS qi_classes,
  CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
    AS classes_below_k,
  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
    AS BIGINT) AS rows_below_k,
  CAST(min(class_size) AS BIGINT) AS min_class_size
FROM classes"""

    # two-proportion z: exact integer counts, divisions once at the end
    q["events_ab_test"] = """
WITH per_user AS (
  SELECT user_id % 2 AS grp,
    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
g AS (
  SELECT
    sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
    sum(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS conv_a,
    sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
    sum(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS conv_b
  FROM per_user
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
  CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
  round(CASE WHEN n_a > 0 THEN CAST(conv_a AS DOUBLE) / n_a END, 6)
    AS rate_a,
  round(CASE WHEN n_b > 0 THEN CAST(conv_b AS DOUBLE) / n_b END, 6)
    AS rate_b,
  round(CASE WHEN n_a > 0 AND n_b > 0
      AND (conv_a + conv_b) > 0 AND (conv_a + conv_b) < (n_a + n_b)
    THEN
      (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
      / sqrt(
          (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
          * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
          * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)
        ) END, 6) AS z_stat
FROM g"""

    # inter-event gap regularity (bot heuristic): population stddev +
    # exact median; the CV ratio divides rounded values on BOTH sides
    q["events_bot_scores"] = """
WITH gaps AS (
  SELECT user_id,
    CAST(date_diff('second',
      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
      AS DOUBLE) AS gap
  FROM events
),
per_user AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS gaps,
    round(avg(gap), 6) AS mean_gap_sec,
    round(stddev_pop(gap), 6) AS stddev_gap_sec,
    round(quantile_cont(gap, 0.5), 6) AS median_gap_sec
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, gaps, mean_gap_sec, stddev_gap_sec, median_gap_sec,
  round(stddev_gap_sec / mean_gap_sec, 6) AS gap_cv,
  CAST(CASE WHEN stddev_gap_sec / mean_gap_sec < 0.3 AND gaps >= 10
    THEN 1 ELSE 0 END AS BIGINT) AS bot_flag
FROM per_user"""

    # fulfillment latency percentiles per priority (exact day diffs)
    q["tpch_fulfillment_latency"] = """
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS lineitems,
  round(quantile_cont(CAST(date_diff('day', o_orderdate, l_shipdate)
    AS DOUBLE), 0.5), 6) AS p50_days,
  round(quantile_cont(CAST(date_diff('day', o_orderdate, l_shipdate)
    AS DOUBLE), 0.9), 6) AS p90_days,
  CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
    AS max_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority"""

    # HHI concentration: exact DECIMAL sums, one division
    q["tpch_supplier_hhi"] = """
WITH per_supp AS (
  SELECT n_name, l_suppkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS d_rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name,
  CAST(count(*) AS BIGINT) AS suppliers,
  round(CAST(sum(d_rev * d_rev) AS DOUBLE)
    / (CAST(sum(d_rev) AS DOUBLE) * CAST(sum(d_rev) AS DOUBLE)), 6)
    AS hhi,
  CAST(round(sum(d_rev), 2) AS DOUBLE) AS total_revenue
FROM per_supp GROUP BY n_name"""

    # Gini coefficient via the exact rank-weighted identity
    q["events_value_gini"] = """
WITH totals AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS d_total
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT d_total,
    row_number() OVER (ORDER BY d_total ASC, user_id ASC) AS i
  FROM totals
)
SELECT CAST(count(*) AS BIGINT) AS users,
  CAST(round(sum(d_total), 2) AS DOUBLE) AS total_value,
  round(
    2.0 * CAST(sum(i * d_total) AS DOUBLE)
      / (count(*) * CAST(sum(d_total) AS DOUBLE))
    - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini
FROM ranked"""

    # cohort retention triangle: first-touch week × week offset
    q["events_cohort_retention"] = """
WITH wk AS (
  SELECT user_id,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 604800) AS BIGINT) AS week
  FROM events
),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, week FROM wk),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
  FROM first GROUP BY cohort_week
),
cells AS (
  SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
    CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
  FROM active a JOIN first f ON a.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT c.cohort_week, c.week_offset, c.active_users, s.cohort_users,
  round(CAST(c.active_users AS DOUBLE) / s.cohort_users, 6) AS retention
FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week"""

    # DAU/MAU stickiness scalar
    q["events_stickiness"] = """
WITH daily AS (
  SELECT CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
      ts) / 86400) AS BIGINT) AS day,
    count(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
),
m AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS mau FROM events)
SELECT CAST(count(*) AS BIGINT) AS days,
  round(avg(dau), 6) AS avg_dau,
  mau,
  round(avg(dau) / mau, 6) AS stickiness
FROM daily, m GROUP BY mau"""

    # p-chart control limits per brand vs the global return rate
    q["tpch_return_rate_control"] = """
WITH j AS (
  SELECT p_brand,
    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
per_brand AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(ret) AS BIGINT) AS returns
  FROM j GROUP BY p_brand
),
o AS (SELECT count(*) AS n_all, sum(ret) AS ret_all FROM j)
SELECT p_brand, n, returns,
  round(CAST(returns AS DOUBLE) / n, 6) AS return_rate,
  round(CAST(ret_all AS DOUBLE) / n_all, 6) AS global_rate,
  round(CAST(ret_all AS DOUBLE) / n_all
    - 3 * sqrt((CAST(ret_all AS DOUBLE) / n_all)
      * (1 - CAST(ret_all AS DOUBLE) / n_all) / n), 6) AS lcl,
  round(CAST(ret_all AS DOUBLE) / n_all
    + 3 * sqrt((CAST(ret_all AS DOUBLE) / n_all)
      * (1 - CAST(ret_all AS DOUBLE) / n_all) / n), 6) AS ucl,
  CAST(CASE WHEN CAST(returns AS DOUBLE) / n
      > CAST(ret_all AS DOUBLE) / n_all
        + 3 * sqrt((CAST(ret_all AS DOUBLE) / n_all)
          * (1 - CAST(ret_all AS DOUBLE) / n_all) / n)
    OR CAST(returns AS DOUBLE) / n
      < CAST(ret_all AS DOUBLE) / n_all
        - 3 * sqrt((CAST(ret_all AS DOUBLE) / n_all)
          * (1 - CAST(ret_all AS DOUBLE) / n_all) / n)
    THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
FROM per_brand, o"""

    # decile lift table over value-ranked users
    q["events_decile_lift"] = """
WITH per_user AS (
  SELECT user_id,
    sum(CAST(value AS DECIMAL(18,2))) AS d_total,
    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      >= 14 THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT converted,
    ntile(10) OVER (ORDER BY d_total DESC, user_id ASC) AS decile
  FROM per_user
),
o AS (SELECT count(*) AS n_all, sum(converted) AS conv_all FROM ranked)
SELECT CAST(decile AS BIGINT) AS decile,
  CAST(count(*) AS BIGINT) AS users,
  CAST(sum(converted) AS BIGINT) AS converters,
  round(CAST(sum(converted) AS DOUBLE) / count(*), 6)
    AS conversion_rate,
  round((CAST(sum(converted) AS DOUBLE) / count(*))
    / (CAST(conv_all AS DOUBLE) / n_all), 6) AS lift
FROM ranked, o GROUP BY decile, n_all, conv_all"""

    # r6: global rank-based quantile normalization (feature transform);
    # the Spark side ranks via exact_global_rank, the oracle via the
    # window the rewrite is provably identical to
    q["events_quantile_norm"] = """
WITH r AS (
  SELECT event_id, value,
    row_number() OVER (ORDER BY value, event_id) AS rn,
    count(*) OVER () AS n
  FROM events
)
SELECT event_id, value,
  CASE WHEN n > 1
    THEN round(CAST(rn - 1 AS DOUBLE) / (n - 1), 6)
    ELSE 0.0 END AS value_pct,
  CAST(ntile(100) OVER (ORDER BY value, event_id) AS BIGINT) AS centile
FROM r"""

    # r6: deterministic per-user event cap (frequent-key downweighting);
    # salted-md5 keep order shared with the Spark side verbatim
    # r7: A-ES weighted WOR sample — key = u^(1/w), u = (60-bit md5 of
    # salt:doc_id + 1)/2^60; order by the UNROUNDED key (the rounded
    # display key would tie heavily near 1.0), ties by doc_id
    q["sampling_weighted"] = """
WITH keyed AS (
  SELECT doc_id, n_chars AS weight,
    pow((CAST(concat('0x',
          substr(md5(concat('aes-v1:', CAST(doc_id AS VARCHAR))), 1, 15))
        AS BIGINT) + 1) / 1152921504606846976.0,
      1.0 / greatest(n_chars, 1)) AS k
  FROM documents
)
SELECT doc_id, weight, round(k, 6) AS sample_key
FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 100"""

    # r7: DSIR (Xie et al. 2023) — hashed-unigram importance weights and
    # the Gumbel-top-k resample. The Gumbel key adds noise to the
    # ROUNDED log_ratio (the published column), so the selection cut is
    # engine-stable.
    _dsir_cte = """
norm AS (
  SELECT doc_id, source,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
toks AS (
  SELECT doc_id, source, unnest(string_split(t, ' ')) AS token FROM norm
),
bt AS (
  SELECT doc_id, source,
    CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) % 4096 AS b
  FROM toks
),
lm AS (
  SELECT b,
    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
    sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS cr
  FROM bt GROUP BY b
),
tot AS (
  SELECT CAST(sum(ct) AS DOUBLE) AS tt, CAST(sum(cr) AS DOUBLE) AS tr
  FROM lm
),
ld AS (
  SELECT b, ln((ct + 1.0) / (tt + 4096)) - ln((cr + 1.0) / (tr + 4096))
    AS logdiff
  FROM lm, tot
),
w AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_tokens,
    round(sum(logdiff), 6) AS log_ratio
  FROM bt JOIN ld USING (b)
  GROUP BY doc_id, source
)"""
    q["sampling_dsir_weights"] = f"""
WITH {_dsir_cte}
SELECT doc_id, source, n_tokens, log_ratio FROM w"""

    q["sampling_dsir_topk"] = f"""
WITH {_dsir_cte},
keyed AS (
  SELECT doc_id, source, log_ratio,
    log_ratio + (-ln(-ln(
      (CAST(concat('0x',
         substr(md5(concat('dsir-v1:', CAST(doc_id AS VARCHAR))), 1, 15))
       AS BIGINT) + 1) / 1152921504606846976.0))) AS k
  FROM w
)
SELECT doc_id, source, log_ratio
FROM keyed ORDER BY k DESC, doc_id ASC LIMIT 100"""

    # r7: multinomial NB provenance classifier over the DSIR feature
    # space; argmax on the ROUNDED score, ties to the lexicographically
    # largest source (Spark's max-of-struct order)
    q["source_classifier_nb"] = """
WITH norm AS (
  SELECT doc_id, source,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
toks AS (
  SELECT doc_id, source, unnest(string_split(t, ' ')) AS token FROM norm
),
bt AS (
  SELECT doc_id, source,
    CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) % 4096 AS b
  FROM toks
),
lm AS (SELECT b, source AS s, count(*) AS c FROM bt GROUP BY b, source),
src_tot AS (SELECT source AS s, count(*) AS tot FROM bt GROUP BY source),
doc_counts AS (
  SELECT source AS s, count(*) AS docs FROM documents GROUP BY source
),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
bdim AS (SELECT DISTINCT b FROM lm),
dense AS (
  SELECT bd.b, st.s,
    ln((coalesce(l.c, 0) + 1.0) / (st.tot + 4096)) AS lp
  FROM bdim bd CROSS JOIN src_tot st
  LEFT JOIN lm l ON l.b = bd.b AND l.s = st.s
),
prior AS (SELECT dc.s, ln(dc.docs / n) AS lprior FROM doc_counts dc, nd),
scores AS (
  SELECT bt.doc_id, bt.source, d.s, sum(d.lp) AS ll
  FROM bt JOIN dense d USING (b)
  GROUP BY bt.doc_id, bt.source, d.s
),
final AS (
  SELECT doc_id, source, s,
    round(ll + p.lprior, 6) AS log_score,
    row_number() OVER (PARTITION BY doc_id
      ORDER BY round(ll + p.lprior, 6) DESC, s DESC) AS rn
  FROM scores JOIN prior p USING (s)
)
SELECT doc_id, source, s AS predicted_source, log_score,
  (s = source) AS correct
FROM final WHERE rn = 1"""

    q["sampling_user_cap"] = """
WITH ranked AS (
  SELECT user_id, event_id,
    row_number() OVER (
      PARTITION BY user_id
      ORDER BY md5('cap-v1:' || CAST(event_id AS VARCHAR)) ASC,
        event_id ASC
    ) AS keep_rank
  FROM events
)
SELECT user_id, event_id, CAST(keep_rank AS BIGINT) AS keep_rank
FROM ranked WHERE keep_rank <= 20"""

    q["sampling_user_cap_summary"] = """
WITH ranked AS (
  SELECT user_id,
    row_number() OVER (
      PARTITION BY user_id
      ORDER BY md5('cap-v1:' || CAST(event_id AS VARCHAR)) ASC,
        event_id ASC
    ) AS keep_rank
  FROM events
),
totals AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS events FROM events
  GROUP BY user_id
),
kept AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS kept FROM ranked
  WHERE keep_rank <= 20 GROUP BY user_id
)
SELECT t.user_id, t.events, k.kept,
  CAST(t.events - k.kept AS BIGINT) AS dropped
FROM totals t JOIN kept k ON t.user_id = k.user_id"""

    # Q12-shape: join + CASE-WHEN conditional aggregation over a
    # derived latency bucket (synthetic lineitem has no shipmode)
    q["tpch_shipmode_priority"] = """
SELECT CAST(floor(date_diff('day', CAST(o_orderdate AS DATE),
    CAST(l_shipdate AS DATE)) / 30.0) AS BIGINT) AS latency_bucket,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY latency_bucket"""

    # RFM segmentation: three independent total-order NTILE(5) scores
    # rolled up to the (r, f, m) cube
    q["events_rfm_segments"] = """
WITH per_user AS (
  SELECT user_id, CAST(max(ts) AS DATE) AS last_day,
    CAST(count(*) AS BIGINT) AS frequency,
    sum(CAST(value AS DECIMAL(18,2))) AS d_monetary
  FROM events GROUP BY user_id
),
anch AS (SELECT max(last_day) AS anchor_day FROM per_user),
scored AS (
  SELECT user_id, frequency, d_monetary,
    CAST(date_diff('day', last_day, anchor_day) AS BIGINT)
      AS recency_days
  FROM per_user, anch
),
b AS (
  SELECT *,
    ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS r_score,
    ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) AS f_score,
    ntile(5) OVER (ORDER BY d_monetary DESC, user_id ASC) AS m_score
  FROM scored
)
SELECT CAST(r_score AS BIGINT) AS r_score,
  CAST(f_score AS BIGINT) AS f_score,
  CAST(m_score AS BIGINT) AS m_score,
  CAST(count(*) AS BIGINT) AS users,
  round(avg(recency_days), 6) AS avg_recency_days,
  round(avg(frequency), 6) AS avg_frequency,
  round(avg(CAST(d_monetary AS DOUBLE)), 6) AS avg_monetary
FROM b GROUP BY r_score, f_score, m_score"""

    # token-budget epoch planner: temperature mixture in token units
    q["sampling_epoch_mix"] = """
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS docs,
    CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
      AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(tokens) AS DOUBLE) AS total_tokens,
    sum(pow(tokens, 0.5)) AS pow_sum
  FROM counts
)
SELECT source, docs, tokens,
  round(tokens / total_tokens, 6) AS token_share,
  round(pow(tokens, 0.5) / pow_sum, 6) AS mix_weight,
  round(pow(tokens, 0.5) / pow_sum * 1000000.0, 2) AS token_alloc,
  round(pow(tokens, 0.5) / pow_sum * 1000000.0 / tokens, 6) AS epochs
FROM counts, tot"""

    # --- r8 wave: privacy, bootstrap, attribution, encoding audit ---

    # distinct-l-diversity over the same (event_type, day) QI as the
    # k-anonymity gate; sensitive attribute = user_id
    q["events_l_diversity"] = """
WITH classes AS (
  SELECT event_type,
    CAST(floor(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
      / 86400) AS BIGINT) AS day,
    count(*) AS class_size,
    count(DISTINCT user_id) AS l_distinct
  FROM events GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS qi_classes,
  CAST(sum(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
    AS classes_below_l,
  CAST(sum(CASE WHEN l_distinct < 3 THEN class_size ELSE 0 END)
    AS BIGINT) AS rows_below_l,
  CAST(min(l_distinct) AS BIGINT) AS min_l
FROM classes"""

    # deterministic-Laplace DP counts: salted @HASH64 → uniform in
    # (−½, ½) → inverse Laplace CDF; b = 1/ε = 10, identical doubles
    q["events_dp_noisy_counts"] = """
WITH c AS (
  SELECT event_type, count(*) AS true_count FROM events GROUP BY 1
),
n AS (
  SELECT event_type, true_count,
    (CAST(concat('0x', substr(md5('dp-42:' || event_type), 1, 15))
      AS BIGINT) / 1152921504606846976.0 - 0.5) AS u
  FROM c
)
SELECT event_type, CAST(true_count AS BIGINT) AS true_count,
  round(-10.0 * sign(u) * ln(greatest(1.0 - 2.0 * abs(u), 1e-15)), 6)
    AS noise,
  round(true_count
    + (-10.0 * sign(u) * ln(greatest(1.0 - 2.0 * abs(u), 1e-15))), 6)
    AS noisy_count
FROM n"""

    # Poisson bootstrap: ONE md5 per row (mod prime P < 2^30), then a
    # per-replicate uniform from a SQUARED multiply-mod chain
    # (x = seed·A + rep·12345 + 12345 mod P; u = (x² mod P · A + rep)
    # mod P / P) — mirrors relational.bootstrap_value_ci
    # token-for-token. The squaring injects the seed×rep cross term
    # (r9 advisor HIGH fix: the affine chain made every row share one
    # global rep offset — a shift family, not independent resamples)
    q["events_bootstrap_ci"] = """
WITH reps AS (SELECT unnest(generate_series(0, 99)) AS rep),
seeded AS (
  SELECT event_type, value,
    (CAST(concat('0x', substr(md5('boot-42:'
        || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % 1073741789) AS seed
  FROM events
),
xs AS (
  SELECT e.event_type, e.value, r.rep,
    (e.seed * 1103515245 + r.rep * 12345 + 12345) % 1073741789 AS x
  FROM seeded e, reps r
),
w AS (
  SELECT event_type, value, rep,
    (((x * x) % 1073741789) * 1103515245 + rep) % 1073741789
      / 1073741789.0 AS u
  FROM xs
),
pw AS (
  SELECT event_type, rep, value,
    CASE WHEN u < 0.36787944117144233 THEN 0
         WHEN u < 0.7357588823428847 THEN 1
         WHEN u < 0.9196986029286058 THEN 2
         WHEN u < 0.9810118431238463 THEN 3
         WHEN u < 0.9963401531726563 THEN 4
         WHEN u < 0.9994058151824183 THEN 5
         WHEN u < 0.999916758850712 THEN 6
         WHEN u < 0.9999897508033253 THEN 7
         WHEN u < 0.999998874797402 THEN 8
         ELSE 9 END AS wgt
  FROM w
),
per_rep AS (
  SELECT event_type, rep,
    sum(wgt * value) / CAST(sum(wgt) AS DOUBLE) AS mean_r
  FROM pw GROUP BY 1, 2 HAVING sum(wgt) > 0
),
ci AS (
  SELECT event_type,
    quantile_cont(mean_r, 0.025) AS ci_lo,
    quantile_cont(mean_r, 0.975) AS ci_hi
  FROM per_rep GROUP BY 1
),
base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    avg(value) AS mean_value
  FROM events GROUP BY 1
)
SELECT b.event_type, b.n, round(b.mean_value, 6) AS mean_value,
  round(ci.ci_lo, 6) AS ci_lo, round(ci.ci_hi, 6) AS ci_hi
FROM base b JOIN ci ON b.event_type = ci.event_type"""

    # multi-touch attribution: purchases credit their user's preceding
    # 7-day touches under first/last/linear/position models
    q["events_attribution_models"] = """
WITH conv AS (
  SELECT user_id AS cu, event_id AS conv_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id AS cu, event_type AS channel, ts AS touch_ts,
    event_id AS touch_id
  FROM events WHERE event_type != 'purchase'
),
path AS (
  SELECT c.conv_id, t.channel, t.touch_ts, t.touch_id
  FROM conv c JOIN touches t ON c.cu = t.cu
  WHERE t.touch_ts < c.conv_ts
    AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
),
ranked AS (
  SELECT conv_id, channel,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY touch_ts ASC, touch_id ASC) AS rn_a,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY touch_ts DESC, touch_id DESC) AS rn_d,
    count(*) OVER (PARTITION BY conv_id) AS n
  FROM path
)
SELECT channel,
  CAST(sum(CASE WHEN rn_a = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS conversions_first,
  CAST(sum(CASE WHEN rn_d = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS conversions_last,
  round(sum(1.0 / n), 6) AS credit_linear,
  round(sum(CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
    WHEN rn_a = 1 OR rn_d = 1 THEN 0.4
    ELSE 0.2 / (n - 2) END), 6) AS credit_position
FROM ranked GROUP BY channel"""

    # encoding-anomaly audit: length-difference counting, RE2/Java
    # char classes agree on these code-point ranges
    q["text_mojibake"] = """
WITH counts AS (
  SELECT doc_id, length(text) AS nc,
    length(text) - length(regexp_replace(text, '�', '', 'g'))
      AS repl,
    length(text) - length(regexp_replace(text,
      '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]', '', 'g'))
      AS ctrl,
    length(regexp_replace(text, '[\\x00-\\x7f]', '', 'g')) AS nonascii
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, CAST(nc AS BIGINT) AS n_chars_text,
  CAST(repl AS BIGINT) AS repl_chars,
  CAST(ctrl AS BIGINT) AS ctrl_chars,
  CAST(nonascii AS BIGINT) AS nonascii_chars,
  round((3.0 * repl + 1.0 * ctrl + 0.1 * nonascii)
    / CAST(greatest(nc, 1) AS DOUBLE), 6) AS mojibake_score
FROM counts"""

    # MinHash estimator calibration on the LSH candidate population:
    # signature-agreement estimate vs exact Jaccard, decile-binned
    q["dedup_minhash_calibration"] = f"""
WITH {SHINGLE_CTE},
sig AS (
  SELECT doc_id, sh,
    list_transform(generate_series(0, {NUM_HASHES - 1}),
      h -> list_min(list_transform(sh,
        s -> md5(CAST(h AS STRING) || ':' || s)))) AS sig
  FROM docs
),
bands AS (
  SELECT doc_id, b.band_id,
    md5(array_to_string(
      sig[b.band_id*{ROWS_PER_BAND}+1 : b.band_id*{ROWS_PER_BAND}+{ROWS_PER_BAND}],
      '|')) AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {NUM_BANDS - 1})) AS band_id) b
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY band_id, band_key) AS bucket_n
  FROM bands
),
keep AS (SELECT * FROM sized WHERE bucket_n <= 1000),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b
  FROM keep a JOIN keep bb
    ON a.band_id = bb.band_id AND a.band_key = bb.band_key
   AND a.doc_id < bb.doc_id
),
pairs AS (
  SELECT
    round(CAST(len(list_filter(generate_series(1, {NUM_HASHES}),
      i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / {NUM_HASHES}, 6) AS est,
    {_JACCARD} AS exact
  FROM cand c
  JOIN docs da ON c.doc_a = da.doc_id
  JOIN docs db ON c.doc_b = db.doc_id
  JOIN sig sa ON c.doc_a = sa.doc_id
  JOIN sig sb ON c.doc_b = sb.doc_id
)
SELECT least(floor(exact * 10), 9) / 10.0 AS exact_bin,
  CAST(count(*) AS BIGINT) AS n_pairs,
  round(avg(est), 6) AS avg_est,
  round(avg(exact), 6) AS avg_exact,
  round(avg(abs(est - exact)), 6) AS mae
FROM pairs GROUP BY 1"""

    # clickstream paths: first-5-type session paths, thresholded
    q["events_session_paths"] = """
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN date_diff('second',
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
        > 86400 THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
    sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS session_id
  FROM marked
),
paths AS (
  SELECT user_id, session_id,
    array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '>')
      AS path,
    count(*) AS n_events
  FROM sess GROUP BY user_id, session_id
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS total_sessions FROM paths)
SELECT path, CAST(count(*) AS BIGINT) AS sessions,
  round(avg(n_events), 6) AS avg_events,
  round(count(*) / total_sessions, 6) AS share
FROM paths, tot GROUP BY path, total_sessions
HAVING count(*) >= 5"""

    # whale concentration: top-1/10/20%-of-users value shares; ranks
    # stated as the plain desc window (the Spark side uses
    # exact_global_rank — same ranks, no single-partition sort)
    q["events_pareto_share"] = """
WITH totals AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS d_total
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT d_total,
    row_number() OVER (ORDER BY d_total DESC, user_id ASC) AS i,
    count(*) OVER () AS n
  FROM totals
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
  CAST(round(sum(d_total), 2) AS DOUBLE) AS total_value,
  CAST(max(ceil(0.01 * n)) AS BIGINT) AS top1pct_users,
  round(CAST(sum(CASE WHEN i <= ceil(0.01 * n) THEN d_total END)
    AS DOUBLE) / CAST(sum(d_total) AS DOUBLE), 6) AS top1pct_share,
  round(CAST(sum(CASE WHEN i <= ceil(0.10 * n) THEN d_total END)
    AS DOUBLE) / CAST(sum(d_total) AS DOUBLE), 6) AS top10pct_share,
  round(CAST(sum(CASE WHEN i <= ceil(0.20 * n) THEN d_total END)
    AS DOUBLE) / CAST(sum(d_total) AS DOUBLE), 6) AS top20pct_share
FROM ranked"""

    # exact MIPS baseline: unnormalized dot top-k, rounded-score rank
    q["emb_mips_topk"] = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, v.vec_id,
    round(list_dot_product(q.q_emb, v.emb), 6) AS dot
  FROM queries q, e v WHERE v.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY dot DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, dot, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""

    # capped attribution (r9, VERDICT r8 next #2): identical to
    # events_attribution_models but each user's touch stream is first
    # truncated to the most recent 50 touches (deterministic
    # (ts, event_id) order) — the bot-skew guard that bounds the
    # conversion × touch fan-out at purchases × cap per user
    q["events_attribution_capped"] = """
WITH conv AS (
  SELECT user_id AS cu, event_id AS conv_id, ts AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT cu, channel, touch_ts, touch_id FROM (
    SELECT user_id AS cu, event_type AS channel, ts AS touch_ts,
      event_id AS touch_id,
      row_number() OVER (PARTITION BY user_id
        ORDER BY ts DESC, event_id DESC) AS u_rn
    FROM events WHERE event_type != 'purchase'
  ) WHERE u_rn <= 50
),
path AS (
  SELECT c.conv_id, t.channel, t.touch_ts, t.touch_id
  FROM conv c JOIN touches t ON c.cu = t.cu
  WHERE t.touch_ts < c.conv_ts
    AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
),
ranked AS (
  SELECT conv_id, channel,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY touch_ts ASC, touch_id ASC) AS rn_a,
    row_number() OVER (PARTITION BY conv_id
      ORDER BY touch_ts DESC, touch_id DESC) AS rn_d,
    count(*) OVER (PARTITION BY conv_id) AS n
  FROM path
)
SELECT channel,
  CAST(sum(CASE WHEN rn_a = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS conversions_first,
  CAST(sum(CASE WHEN rn_d = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS conversions_last,
  round(sum(1.0 / n), 6) AS credit_linear,
  round(sum(CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
    WHEN rn_a = 1 OR rn_d = 1 THEN 0.4
    ELSE 0.2 / (n - 2) END), 6) AS credit_position
FROM ranked GROUP BY channel"""

    # --- r9 wave: the two deterministic day-grain recurrences move
    # from rows-only to oracle-able via recursive CTEs over the
    # ordered daily frame (VERDICT r8 next #3). Each iteration of the
    # recursion advances every event_type one day (rn → rn + 1), so
    # the recursion depth is the longest per-type day series; the
    # recurrence arithmetic mirrors the Spark fold token-for-token
    # (literals 0.3/0.7, 0.1/0.9, 0.5; left-assoc order preserved).

    # Holt linear-trend smoothing: l1 = x1, b1 = NULL; rn 2 sets
    # l2 = x2, b2 = x2 - x1; rn >= 3 applies the update. Final row per
    # type (rn = days) carries level/trend and the h=1/h=7 forecasts.
    q["events_holt_forecast"] = """
WITH RECURSIVE daily AS (
  SELECT event_type,
    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
ord AS (
  SELECT event_type, x,
    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
),
rec AS (
  SELECT event_type, rn, x AS l, CAST(NULL AS DOUBLE) AS b
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.rn,
    CASE WHEN r.rn = 1 THEN o.x
         ELSE 0.3 * o.x + 0.7 * (r.l + r.b) END AS l,
    CASE WHEN r.rn = 1 THEN o.x - r.l
         ELSE 0.1 * (0.3 * o.x + 0.7 * (r.l + r.b) - r.l)
              + 0.9 * r.b END AS b
  FROM rec r JOIN ord o
    ON o.event_type = r.event_type AND o.rn = r.rn + 1
),
finals AS (
  SELECT event_type, max(rn) AS days FROM rec GROUP BY 1
)
SELECT r.event_type, CAST(f.days AS BIGINT) AS days,
  round(r.l, 6) AS level, round(r.b, 6) AS trend,
  round(r.l + r.b, 6) AS forecast_1,
  round(r.l + 7 * r.b, 6) AS forecast_7
FROM rec r JOIN finals f
  ON r.event_type = f.event_type AND r.rn = f.days"""

    # EWMA + one-sided CUSUM: ewma1 = x1; ewma_t = 0.3·x_t +
    # 0.7·ewma_{t-1}; cusum_t = max(0, cusum_{t-1} + x_t - mu -
    # 0.5·sigma) with cusum_0 = 0 and per-type mu/sigma_pop over the
    # daily series. Every (type, day) row is emitted.
    q["events_ewma_cusum"] = """
WITH RECURSIVE daily AS (
  SELECT event_type,
    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, avg(x) AS mu, stddev_pop(x) AS sigma
  FROM daily GROUP BY 1
),
ord AS (
  SELECT d.event_type, d.day, d.x, s.mu, s.sigma,
    row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
  FROM daily d JOIN stats s USING (event_type)
),
rec AS (
  SELECT event_type, day, x, mu, sigma, rn,
    x AS ewma,
    greatest(0.0, 0.0 + x - mu - 0.5 * sigma) AS cusum
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.x, o.mu, o.sigma, o.rn,
    0.3 * o.x + 0.7 * r.ewma AS ewma,
    greatest(0.0, r.cusum + o.x - o.mu - 0.5 * o.sigma) AS cusum
  FROM rec r JOIN ord o
    ON o.event_type = r.event_type AND o.rn = r.rn + 1
)
SELECT event_type, day, round(x, 6) AS value,
  round(ewma, 6) AS ewma, round(cusum, 6) AS cusum
FROM rec"""

    # r9: Flesch / FK readability — regexp-countable proxies, floors
    # mirrored (greatest 1 on words/sentences)
    q["text_readability"] = """
WITH c AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
    len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
  FROM documents WHERE text IS NOT NULL
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(n_sentences AS BIGINT) AS n_sentences,
  CAST(n_syllables AS BIGINT) AS n_syllables,
  round(206.835
    - 1.015 * (CAST(greatest(n_words, 1) AS DOUBLE)
               / CAST(greatest(n_sentences, 1) AS DOUBLE))
    - 84.6 * (CAST(n_syllables AS DOUBLE)
              / CAST(greatest(n_words, 1) AS DOUBLE)), 6)
    AS flesch_reading_ease,
  round(0.39 * (CAST(greatest(n_words, 1) AS DOUBLE)
                / CAST(greatest(n_sentences, 1) AS DOUBLE))
    + 11.8 * (CAST(n_syllables AS DOUBLE)
              / CAST(greatest(n_words, 1) AS DOUBLE))
    - 15.59, 6) AS fk_grade
FROM c"""

    # r9: Benford first-digit audit — the digit comes from integer
    # micro-units rendered as decimal text (no float log10 anywhere).
    # micros >= 1, not value > 0: sub-5e-7 values round to 0
    # micro-units whose digit-0 group has no Benford expectation
    q["events_benford_audit"] = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(value * 1000000.0, 0) AS BIGINT)
      AS VARCHAR), 1, 1) AS INT) AS digit
  FROM events WHERE CAST(round(value * 1000000.0, 0) AS BIGINT) >= 1
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
t AS (SELECT sum(n) AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
  round(n / CAST(total AS DOUBLE), 6) AS share,
  round(log10(1.0 + 1.0 / digit), 6) AS benford_expected,
  round(n / CAST(total AS DOUBLE) - log10(1.0 + 1.0 / digit), 6)
    AS excess
FROM c, t"""

    # r9: t-closeness over the (event_type, day) QI — total-variation
    # distance between class and global value-bin distributions; the
    # class × bin grid is completed so absent bins contribute |0 - gs|
    q["events_t_closeness"] = """
WITH rng AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
b AS (
  SELECT event_type,
    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    CAST(CASE WHEN vmax = vmin THEN 0
      ELSE least(floor((value - vmin) / ((vmax - vmin) / 8.0)), 7)
      END AS INT) AS bin
  FROM events, rng
),
class_bin AS (
  SELECT event_type, day, bin, count(*) AS cn FROM b GROUP BY 1, 2, 3
),
class_tot AS (
  SELECT event_type, day, count(*) AS ct FROM b GROUP BY 1, 2
),
gshare AS (
  SELECT bin, count(*) / CAST((SELECT count(*) FROM b) AS DOUBLE) AS gs
  FROM b GROUP BY bin
),
grid AS (SELECT * FROM class_tot, gshare),
tvd AS (
  SELECT g.event_type, g.day,
    sum(abs(coalesce(cb.cn, 0) / CAST(g.ct AS DOUBLE) - g.gs)) / 2.0
      AS tvd
  FROM grid g LEFT JOIN class_bin cb
    ON g.event_type = cb.event_type AND g.day = cb.day
      AND g.bin = cb.bin
  GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS qi_classes,
  CAST(sum(CASE WHEN tvd > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
    AS classes_above_t,
  round(max(tvd), 6) AS max_tvd,
  round(avg(tvd), 6) AS avg_tvd
FROM tvd"""

    # r9: Matryoshka truncation audit — cosine at 64/32/16 dims, ranks
    # tie-broken (rounded score desc, vec_id asc), top-5 overlap + MAE
    q["emb_matryoshka_audit"] = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, v.vec_id,
    round(list_dot_product(q.q_emb, v.emb)
      / (sqrt(list_dot_product(q.q_emb, q.q_emb))
         * sqrt(list_dot_product(v.emb, v.emb))), 6) AS c_full,
    round(list_dot_product(q.q_emb[1:32], v.emb[1:32])
      / (sqrt(list_dot_product(q.q_emb[1:32], q.q_emb[1:32]))
         * sqrt(list_dot_product(v.emb[1:32], v.emb[1:32]))), 6)
      AS c_half,
    round(list_dot_product(q.q_emb[1:16], v.emb[1:16])
      / (sqrt(list_dot_product(q.q_emb[1:16], q.q_emb[1:16]))
         * sqrt(list_dot_product(v.emb[1:16], v.emb[1:16]))), 6)
      AS c_quarter
  FROM queries q, e v WHERE v.vec_id != q.query_id
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY query_id
      ORDER BY c_full DESC, vec_id ASC) AS r_full,
    row_number() OVER (PARTITION BY query_id
      ORDER BY c_half DESC, vec_id ASC) AS r_half,
    row_number() OVER (PARTITION BY query_id
      ORDER BY c_quarter DESC, vec_id ASC) AS r_quarter
  FROM scored
)
SELECT query_id,
  CAST(sum(CASE WHEN r_full <= 5 AND r_half <= 5 THEN 1 ELSE 0 END)
    AS BIGINT) AS overlap_half,
  CAST(sum(CASE WHEN r_full <= 5 AND r_quarter <= 5 THEN 1 ELSE 0 END)
    AS BIGINT) AS overlap_quarter,
  round(avg(abs(c_full - c_half)), 6) AS mae_half,
  round(avg(abs(c_full - c_quarter)), 6) AS mae_quarter
FROM ranked GROUP BY query_id"""

    # r9: Mann-Kendall S + Kendall tau + Theil-Sen slope over the
    # daily count series — all-pairs join on the DAY grain, exact
    # integer statistics, interpolated median slope (quantile_cont)
    q["events_theil_sen"] = """
WITH daily AS (
  SELECT event_type,
    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
    CAST(sign(CAST(b.c - a.c AS DOUBLE)) AS BIGINT) AS s,
    (b.c - a.c) / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.day > a.day
),
stats AS (
  SELECT event_type, sum(s) AS mk_s, count(*) AS n_pairs,
    quantile_cont(slope, 0.5) AS sen_slope
  FROM pairs GROUP BY 1
),
days AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
SELECT d.event_type, CAST(d.n_days AS BIGINT) AS n_days,
  CAST(s.mk_s AS BIGINT) AS mk_s,
  round(s.mk_s / CAST(s.n_pairs AS DOUBLE), 6) AS kendall_tau,
  round(s.sen_slope, 6) AS sen_slope
FROM days d JOIN stats s ON d.event_type = s.event_type"""

    # r9: per-state transition entropy — exact bigram counts, entropy
    # over the |types|² grain, perplexity 2^H
    q["events_transition_entropy"] = """
WITH seq AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id
      ORDER BY ts, event_id) AS to_type
  FROM events
),
bigrams AS (
  SELECT from_type, to_type, count(*) AS c FROM seq
  WHERE to_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(c) AS n_from FROM bigrams GROUP BY 1),
ent AS (
  SELECT b.from_type,
    CAST(count(*) AS BIGINT) AS n_next_types,
    CAST(max(t.n_from) AS BIGINT) AS n_from,
    -sum((b.c / CAST(t.n_from AS DOUBLE))
         * log2(b.c / CAST(t.n_from AS DOUBLE))) AS h
  FROM bigrams b JOIN tot t ON b.from_type = t.from_type
  GROUP BY 1
)
SELECT from_type, n_next_types, n_from,
  round(h, 6) AS entropy_bits,
  round(pow(2.0, h), 6) AS perplexity
FROM ent"""

    # r9: inter-arrival gaps per type — user-keyed lead window, exact
    # integer seconds, interpolated percentiles
    q["events_interarrival_stats"] = """
WITH g AS (
  SELECT event_type,
    date_diff('second', ts,
      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      AS gap
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
  round(sum(gap) / CAST(count(*) AS DOUBLE), 6) AS mean_gap_sec,
  round(quantile_cont(gap, 0.5), 6) AS p50_gap_sec,
  round(quantile_cont(gap, 0.9), 6) AS p90_gap_sec,
  round(quantile_cont(gap, 0.99), 6) AS p99_gap_sec
FROM g WHERE gap IS NOT NULL GROUP BY event_type"""

    # r9: reciprocal-rank fusion of the cosine and MIPS full rankings
    q["emb_rrf_fusion"] = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
queries AS (
  SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, v.vec_id,
    round(list_dot_product(q.q_emb, v.emb)
      / (sqrt(list_dot_product(q.q_emb, q.q_emb))
         * sqrt(list_dot_product(v.emb, v.emb))), 6) AS cos,
    round(list_dot_product(q.q_emb, v.emb), 6) AS dot
  FROM queries q, e v WHERE v.vec_id != q.query_id
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY query_id
      ORDER BY cos DESC, vec_id ASC) AS r_cos,
    row_number() OVER (PARTITION BY query_id
      ORDER BY dot DESC, vec_id ASC) AS r_dot
  FROM scored
),
fused AS (
  SELECT query_id, vec_id,
    round(1.0 / (60 + r_cos) + 1.0 / (60 + r_dot), 6) AS rrf_score
  FROM ranked
),
final AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY rrf_score DESC, vec_id ASC) AS rank
  FROM fused
)
SELECT query_id, vec_id, rrf_score, CAST(rank AS BIGINT) AS rank
FROM final WHERE rank <= 5"""

    # r9: Chao1 + Good-Turing richness — same norm/tokenization as
    # text_vocab_stats; exact integer f1/f2/D/N inputs
    q["text_vocab_richness"] = """
WITH norm AS (SELECT doc_id, lang,
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t FROM documents),
freq AS (
  SELECT lang, unnest(string_split(t, ' ')) AS token FROM norm
),
counts AS (SELECT lang, token, count(*) AS c FROM freq GROUP BY 1, 2),
per_lang AS (
  SELECT lang, count(*) AS d, sum(c) AS n,
    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
  FROM counts GROUP BY lang
)
SELECT lang, CAST(d AS BIGINT) AS distinct_types,
  CAST(n AS BIGINT) AS total_tokens,
  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
  round(CASE WHEN f2 > 0 THEN d + f1 * f1 / (2.0 * f2)
             ELSE d + f1 * (f1 - 1) / 2.0 END, 6) AS chao1_estimate,
  round(f1 / CAST(n AS DOUBLE), 6) AS gt_unseen_mass
FROM per_lang"""

    # r9: the two end-to-end dedup CLUSTER queries move from rows-only
    # to oracle-able — connected components as a recursive
    # transitive-closure CTE (UNION set semantics iterate to fixpoint;
    # (node, label) pair volume is quadratic per component, bounded by
    # the near-dup cluster sizes) over the SAME verified pair SQL the
    # pair queries already gate (reused as subqueries).
    q["dedup_fuzzy_clusters"] = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT * FROM ({q["dedup_minhash_lsh"]}) p
),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT doc_id AS v, doc_id AS lab FROM documents
  UNION
  SELECT u.dst AS v, r.lab FROM reach r JOIN und u ON u.src = r.v
)
SELECT v AS doc_id, min(lab) AS cluster, (v = min(lab)) AS keep
FROM reach GROUP BY v"""

    q["dedup_semantic_components"] = f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  SELECT * FROM ({q["dedup_embedding_cosine"]}) p
),
und AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION
  SELECT vec_b AS src, vec_a AS dst FROM pairs
),
reach AS (
  SELECT vec_id AS v, vec_id AS lab FROM embeddings
  UNION
  SELECT u.dst AS v, r.lab FROM reach r JOIN und u ON u.src = r.v
)
SELECT v AS vec_id, min(lab) AS component, (v = min(lab)) AS keep
FROM reach GROUP BY v"""

    # r9: DSIR weight effective-sample-size — per-source log-sum-exp
    # normalized weights off the shared DSIR CTE
    q["sampling_ess"] = f"""
WITH {_dsir_cte},
mx AS (SELECT source, max(log_ratio) AS mx FROM w GROUP BY 1),
shifted AS (
  SELECT w.source, exp(w.log_ratio - m.mx) AS wt
  FROM w JOIN mx m ON w.source = m.source
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  round((sum(wt) * sum(wt)) / sum(wt * wt), 6) AS ess,
  round(((sum(wt) * sum(wt)) / sum(wt * wt)) / count(*), 6) AS ess_frac
FROM shifted GROUP BY source"""

    # r9: LSH recall@5 audit — exact vs bucket-restricted rankings off
    # one scored frame; reuses the ann_lsh_buckets bucket expression
    q["ann_lsh_recall"] = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
tagged AS MATERIALIZED (
  SELECT vec_id, emb, {bucket_expr} AS bucket FROM e
),
queries AS (
  SELECT vec_id AS query_id, emb AS q_emb, bucket AS q_bucket
  FROM tagged WHERE vec_id < 10
),
scored AS MATERIALIZED (
  SELECT q.query_id, v.vec_id, v.bucket, q.q_bucket,
    round(list_cosine_similarity(q.q_emb, v.emb), 6) AS cosine
  FROM queries q, tagged v WHERE v.vec_id != q.query_id
),
exact_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, vec_id ASC) AS r
    FROM scored) t WHERE r <= 5
),
lsh AS MATERIALIZED (
  SELECT * FROM scored WHERE bucket = q_bucket
),
lsh_top AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, vec_id ASC) AS r
    FROM lsh) t WHERE r <= 5
),
cands AS (SELECT query_id, count(*) AS n_candidates FROM lsh GROUP BY 1),
hits AS (
  SELECT x.query_id, count(*) AS hits
  FROM exact_top x JOIN lsh_top l
    ON x.query_id = l.query_id AND x.vec_id = l.vec_id
  GROUP BY 1
)
SELECT q.query_id,
  CAST(coalesce(c.n_candidates, 0) AS BIGINT) AS n_candidates,
  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
  round(coalesce(h.hits, 0) / 5.0, 6) AS recall_at_k
FROM queries q
LEFT JOIN cands c ON q.query_id = c.query_id
LEFT JOIN hits h ON q.query_id = h.query_id"""

    # r10: ann_tune frontier — (bits, tables) sweep over the SAME
    # md5-derived plane family; per-vector sign lists once, config
    # retrieval = any-table slice equality, pick = cheapest config
    # meeting target (fallback max recall). Mirrors similarity.ann_tune.
    from .pipelines.similarity import ANN_TUNE_CONFIGS

    _cfg_values = ", ".join(f"({b}, {t})" for b, t in ANN_TUNE_CONFIGS)
    _max_planes = max(b * t for b, t in ANN_TUNE_CONFIGS)
    q["ann_tune_frontier"] = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
signs AS MATERIALIZED (
  SELECT vec_id, emb,
    list_transform(generate_series(0, {_max_planes - 1}), p ->
      CASE WHEN list_sum(list_transform(generate_series(0, 63), d ->
        emb[d+1] * {plane_w})) > 0 THEN 1 ELSE 0 END) AS sg
  FROM e
),
queries AS (
  SELECT vec_id AS query_id, emb AS q_emb, sg AS q_sg
  FROM signs WHERE vec_id < 10
),
ranked AS MATERIALIZED (
  SELECT query_id, vec_id, q_sg, sg,
    row_number() OVER (PARTITION BY query_id
      ORDER BY round(list_cosine_similarity(q_emb, emb), 6) DESC,
               vec_id ASC) AS rn
  FROM (SELECT q.query_id, v.vec_id, q.q_emb, v.emb, q.q_sg, v.sg
        FROM queries q, signs v WHERE v.vec_id != q.query_id) t
),
cfgs AS (SELECT * FROM (VALUES {_cfg_values}) AS c(bits, tables)),
pc AS (
  SELECT c.bits, c.tables, r.query_id, r.rn,
    len(list_filter(generate_series(0, c.tables - 1), t ->
      list_slice(r.q_sg, t * c.bits + 1, (t + 1) * c.bits)
        = list_slice(r.sg, t * c.bits + 1, (t + 1) * c.bits))) > 0
      AS matched
  FROM ranked r, cfgs c
),
per_q AS (
  SELECT bits, tables, query_id,
    sum(CASE WHEN matched THEN 1 ELSE 0 END) AS n_cand,
    sum(CASE WHEN matched AND rn <= 5 THEN 1 ELSE 0 END) AS hits
  FROM pc GROUP BY 1, 2, 3
),
fr AS (
  SELECT bits, tables, CAST(count(*) AS BIGINT) AS n_queries,
    round(avg(n_cand), 6) AS avg_candidates,
    round(avg(hits / 5.0), 6) AS avg_recall
  FROM per_q GROUP BY 1, 2
),
fl AS (SELECT *, (avg_recall >= 0.8) AS meets_target FROM fr)
SELECT CAST(bits AS INT) AS bits, CAST(tables AS INT) AS tables,
  n_queries, avg_candidates, avg_recall, meets_target,
  (row_number() OVER (ORDER BY meets_target DESC,
     CASE WHEN meets_target THEN avg_candidates ELSE 1e18 END ASC,
     avg_recall DESC, avg_candidates ASC, bits ASC, tables ASC) = 1)
    AS chosen
FROM fl"""

    # r9: k-center greedy coreset moves from rows-only to oracle-able —
    # the k = 16 farthest-point picks UNROLL as chained (state, pick)
    # CTE pairs, exactly like the pagerank unroll. Distances round to
    # 6 BEFORE every argmax on both engines (the operator's documented
    # stability contract), so picks agree across engines.
    _kc_parts = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        "AS emb FROM embeddings)",
        "s1 AS MATERIALIZED (SELECT vec_id, emb, CAST(NULL AS DOUBLE) "
        "AS mind FROM e)",
        "p1 AS MATERIALIZED (SELECT vec_id, CAST(NULL AS DOUBLE) "
        "AS radius, emb FROM e ORDER BY vec_id ASC LIMIT 1)",
    ]
    for _i in range(2, 17):
        _d = (
            f"round(1.0 - list_cosine_similarity(s.emb, p{_i - 1}.emb), 6)"
        )
        _kc_parts.append(
            f"s{_i} AS MATERIALIZED (SELECT s.vec_id, s.emb, "
            f"least(coalesce(s.mind, {_d}), {_d}) AS mind "
            f"FROM s{_i - 1} s, p{_i - 1} "
            f"WHERE s.vec_id != p{_i - 1}.vec_id)"
        )
        _kc_parts.append(
            f"p{_i} AS MATERIALIZED (SELECT vec_id, mind AS radius, emb FROM s{_i} "
            f"ORDER BY mind DESC, vec_id ASC LIMIT 1)"
        )
    _kc_sel = "\nUNION ALL\n".join(
        f"SELECT CAST({_i} AS BIGINT) AS pick_order, vec_id, "
        f"round(radius, 6) AS radius FROM p{_i}"
        for _i in range(1, 17)
    )
    q["emb_kcenter_coreset"] = (
        "WITH " + ",\n".join(_kc_parts) + "\n" + _kc_sel
    )

    # r9: curation_semantic moves from rows-only to oracle-able — the
    # full chain composes the curation_pipeline SQL with the (now
    # oracle-expressible) semantic-keeper closure
    q["curation_semantic"] = f"""
WITH RECURSIVE base AS (SELECT * FROM ({q["curation_pipeline"]}) b),
pairs AS (SELECT * FROM ({q["dedup_embedding_cosine"]}) p),
und AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION
  SELECT vec_b AS src, vec_a AS dst FROM pairs
),
reach AS (
  SELECT vec_id AS v, vec_id AS lab FROM embeddings
  UNION
  SELECT u.dst AS v, r.lab FROM reach r JOIN und u ON u.src = r.v
),
keepers AS (
  SELECT v AS doc_id FROM reach GROUP BY v HAVING v = min(lab)
)
SELECT base.* FROM base JOIN keepers USING (doc_id)"""

    # r9: next-fit packing moves from rows-only to oracle-able — the
    # per-group sequential bin recurrence is one recursion step per
    # chunk rank over the reused doc_chunks SQL (depth = max chunks
    # per group)
    _pack_over = "r.bin_fill > 0 AND r.bin_fill + o.n_tokens > 256"
    _pack_rec = f"""
ord AS (
  SELECT grp, doc_id, chunk_id, n_tokens,
    row_number() OVER (PARTITION BY grp
      ORDER BY doc_id, chunk_id) AS rn
  FROM grouped
),
rec AS (
  SELECT grp, doc_id, chunk_id, n_tokens, rn,
    CAST(0 AS BIGINT) AS bin_id,
    CAST(n_tokens AS BIGINT) AS bin_fill
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.grp, o.doc_id, o.chunk_id, o.n_tokens, o.rn,
    CASE WHEN {_pack_over} THEN r.bin_id + 1 ELSE r.bin_id END,
    CASE WHEN {_pack_over} THEN CAST(o.n_tokens AS BIGINT)
         ELSE r.bin_fill + o.n_tokens END
  FROM rec r JOIN ord o ON o.grp = r.grp AND o.rn = r.rn + 1
)
SELECT grp AS "group", bin_id, doc_id, chunk_id, n_tokens, bin_fill
FROM rec"""
    q["doc_chunks_packed"] = f"""
WITH RECURSIVE chunks AS (SELECT * FROM ({q["doc_chunks"]}) c),
grouped AS (
  SELECT CAST(doc_id AS VARCHAR) AS grp, doc_id, chunk_id, n_tokens
  FROM chunks
),
{_pack_rec}"""

    q["doc_chunks_packed_by_source"] = f"""
WITH RECURSIVE chunks AS (SELECT * FROM ({q["doc_chunks"]}) c),
grouped AS (
  SELECT d.source AS grp, c.doc_id, c.chunk_id, c.n_tokens
  FROM chunks c JOIN documents d ON c.doc_id = d.doc_id
),
{_pack_rec}"""

    # r9: weighted PageRank moves from rows-only to oracle-able — the
    # 10 power iterations UNROLL as chained aggregate CTEs (standard
    # SQL forbids aggregation in a recursive term; the iteration count
    # is a fixed constant, so unrolling is exact). Teleport term
    # written (1.0 - 0.85) / n so both engines compute the identical
    # IEEE double; per-vertex inflow double-sum order differs across
    # engines by ~1e-13 — absorbed by the round-6 output grain.
    _pr_iters = "".join(
        f""",
r{i + 1} AS (
  SELECT t.dst AS part,
    (1.0 - 0.85) / (SELECT n FROM nv) + 0.85 * sum(r{i}.rank * t.p)
      AS rank
  FROM trans t JOIN r{i} ON t.src = r{i}.part
  GROUP BY t.dst
)"""
        for i in range(10)
    )
    q["graph_pagerank"] = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    count(*) AS weight
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
directed AS (
  SELECT part_a AS src, part_b AS dst, weight FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst, weight FROM pairs
),
outw AS MATERIALIZED (
  SELECT src, sum(weight) AS w_out FROM directed GROUP BY 1
),
nv AS MATERIALIZED (SELECT count(*) AS n FROM outw),
trans AS MATERIALIZED (
  SELECT d.src, d.dst, d.weight / CAST(o.w_out AS DOUBLE) AS p
  FROM directed d JOIN outw o ON d.src = o.src
),
r0 AS (SELECT src AS part, 1.0 / (SELECT n FROM nv) AS rank FROM outw)
{_pr_iters}
SELECT part, round(rank, 6) AS rank FROM r10"""

    # r10: fixed-round k-core (graph.kcore_bounded) — 8 peel rounds
    # UNROLL as chained (degree, low, edge-filter) CTE triples; a peel
    # round over an already-converged graph removes nothing, so early
    # convergence is exact. Spark raises if peeling is still active
    # after round 8 (loud driver error, never a quiet partial-core
    # hash mismatch).
    _kcb_parts = [
        "baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM "
        "lineitem)",
        "e0 AS MATERIALIZED (SELECT a.l_partkey AS part_a, "
        "b.l_partkey AS part_b FROM baskets a JOIN baskets b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2)",
    ]
    # round count + peel threshold come from operators.graph (ADVICE
    # r13 #4: shared constants, never hardcoded on one side)
    for _i in range(1, KCORE_ROUNDS + 1):
        _kcb_parts.append(
            f"d{_i} AS MATERIALIZED (SELECT p, count(*) AS d FROM "
            f"(SELECT part_a AS p FROM e{_i - 1} UNION ALL "
            f"SELECT part_b AS p FROM e{_i - 1}) GROUP BY 1)"
        )
        _kcb_parts.append(
            f"low{_i} AS MATERIALIZED (SELECT p FROM d{_i} "
            f"WHERE d < {KCORE_K})"
        )
        _kcb_parts.append(
            f"e{_i} AS MATERIALIZED (SELECT part_a, part_b FROM "
            f"e{_i - 1} WHERE part_a NOT IN (SELECT p FROM low{_i}) "
            f"AND part_b NOT IN (SELECT p FROM low{_i}))"
        )
    q["graph_kcore_bounded"] = (
        "WITH "
        + ",\n".join(_kcb_parts)
        + f"""
SELECT part, CAST(count(*) AS BIGINT) AS core_degree FROM (
  SELECT part_a AS part FROM e{KCORE_ROUNDS}
  UNION ALL SELECT part_b AS part FROM e{KCORE_ROUNDS}
) GROUP BY part"""
    )

    # r14: rich-club coefficient — the k ladder is the nine degree
    # deciles via the exact rank statistic (q·n + 9) // 10 (1-indexed
    # ascending, deduplicated), mirroring rich_club's histogram
    # derivation; both counts come off the degree / edge-min-degree
    # histograms
    q["graph_rich_club"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
rc_e AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM baskets a JOIN baskets b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
rc_deg AS MATERIALIZED (
  SELECT p, count(*) AS d FROM (
    SELECT part_a AS p FROM rc_e UNION ALL SELECT part_b FROM rc_e
  ) GROUP BY p
),
rc_n AS (SELECT count(*) AS n FROM rc_deg),
rc_ranked AS (
  SELECT d, row_number() OVER (ORDER BY d) AS rn FROM rc_deg
),
rc_ladder AS MATERIALIZED (
  SELECT DISTINCT r.d AS k
  FROM (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS q) qs
  CROSS JOIN rc_n
  JOIN rc_ranked r ON r.rn = (qs.q * rc_n.n + 9) // 10
),
rc_m AS MATERIALIZED (
  SELECT least(da.d, db.d) AS mdeg FROM rc_e e
  JOIN rc_deg da ON e.part_a = da.p
  JOIN rc_deg db ON e.part_b = db.p
)
SELECT l.k,
  CAST((SELECT count(*) FROM rc_deg WHERE d > l.k) AS BIGINT)
    AS n_nodes,
  CAST((SELECT count(*) FROM rc_m WHERE mdeg > l.k) AS BIGINT)
    AS n_edges,
  round(CASE WHEN (SELECT count(*) FROM rc_deg WHERE d > l.k) >= 2
    THEN 2.0 * (SELECT count(*) FROM rc_m WHERE mdeg > l.k)
      / (CAST((SELECT count(*) FROM rc_deg WHERE d > l.k) AS DOUBLE)
        * ((SELECT count(*) FROM rc_deg WHERE d > l.k) - 1.0))
    END, 6) AS phi
FROM rc_ladder l"""

    # r13/r14: bounded k-truss (graph.ktruss_bounded) — KTRUSS_ROUNDS
    # support-peel rounds unrolled (shared constant, ADVICE r13 #4); a
    # peel round over the converged truss removes nothing, so early
    # convergence is exact (Spark raises if the last round still
    # peeled). Triangles enumerate once each via id-ordering (x<y<z):
    # (x,y)⋈(x,z) with y<z closed by (y,z); every credit pair is
    # already ascending, so support groups directly on the oriented
    # edge key. r14: every round LEFT-joins the support frame with
    # coalesce(sup, 0) — support ≥ need for ALL k (ADVICE r13 #1) —
    # and the peel threshold is DERIVED, not fixture-pinned: need =
    # lower-median of the round-0 per-edge support (zeros included),
    # the rank statistic rn = (n+1)//2 over sup ascending, mirroring
    # ktruss_bounded's k=None histogram derivation. Final support is
    # recomputed ON the fixpoint set — identical to the converged
    # round's support in Spark.
    def _kt_round(i: int) -> list[str]:
        return [
            f"t{i} AS MATERIALIZED (SELECT ab.part_a AS x, "
            f"ab.part_b AS y, ac.part_b AS z FROM te{i} ab "
            f"JOIN te{i} ac ON ab.part_a = ac.part_a "
            f"AND ab.part_b < ac.part_b "
            f"JOIN te{i} yz ON yz.part_a = ab.part_b "
            f"AND yz.part_b = ac.part_b)",
            f"s{i} AS MATERIALIZED (SELECT part_a, part_b, "
            f"count(*) AS sup FROM ("
            f"SELECT x AS part_a, y AS part_b FROM t{i} "
            f"UNION ALL SELECT x AS part_a, z AS part_b FROM t{i} "
            f"UNION ALL SELECT y AS part_a, z AS part_b FROM t{i}"
            f") GROUP BY 1, 2)",
            f"sz{i} AS MATERIALIZED (SELECT e.part_a, e.part_b, "
            f"coalesce(s.sup, 0) AS sup FROM te{i} e "
            f"LEFT JOIN s{i} s USING (part_a, part_b))",
        ] + (
            [
                "kneed AS MATERIALIZED (SELECT sup AS need FROM ("
                "SELECT sup, row_number() OVER (ORDER BY sup) AS rn, "
                "count(*) OVER () AS n FROM sz0) "
                "WHERE rn = (n + 1) // 2)"
            ]
            if i == 0
            else []
        ) + [
            f"te{i + 1} AS MATERIALIZED (SELECT part_a, part_b "
            f"FROM sz{i} WHERE sup >= (SELECT need FROM kneed))",
        ]

    _kt_parts = [
        "baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM "
        "lineitem)",
        "te0 AS MATERIALIZED (SELECT a.l_partkey AS part_a, "
        "b.l_partkey AS part_b FROM baskets a JOIN baskets b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2)",
    ]
    for _i in range(KTRUSS_ROUNDS):
        _kt_parts.extend(_kt_round(_i))
    _kt_n = KTRUSS_ROUNDS
    q["graph_ktruss_bounded"] = (
        "WITH "
        + ",\n".join(_kt_parts)
        + f""",
tf AS MATERIALIZED (SELECT ab.part_a AS x, ab.part_b AS y,
  ac.part_b AS z FROM te{_kt_n} ab
  JOIN te{_kt_n} ac ON ab.part_a = ac.part_a AND ab.part_b < ac.part_b
  JOIN te{_kt_n} yz ON yz.part_a = ab.part_b AND yz.part_b = ac.part_b),
sf AS (SELECT part_a, part_b, count(*) AS sup FROM (
  SELECT x AS part_a, y AS part_b FROM tf
  UNION ALL SELECT x AS part_a, z AS part_b FROM tf
  UNION ALL SELECT y AS part_a, z AS part_b FROM tf) GROUP BY 1, 2)
SELECT e.part_a, e.part_b, CAST(coalesce(s.sup, 0) AS BIGINT) AS support
FROM te{_kt_n} e LEFT JOIN sf s USING (part_a, part_b)"""
    )

    # r9: Hill tail index over the top-(k+1) document lengths —
    # deterministic rank (n_chars desc, doc_id asc), exact-integer
    # order statistics, identical ln-ratio doubles
    q["text_hill_tail_index"] = """
WITH ranked AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
    row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
),
xk1 AS (SELECT x AS x_tail FROM ranked WHERE rn = 101),
tot AS (SELECT sum(CAST(n_chars AS BIGINT)) AS total_chars FROM documents),
agg AS (
  SELECT CAST(100 AS BIGINT) AS k,
    CAST(max(x_tail) AS BIGINT) AS x_tail,
    round(100.0 / sum(ln(CAST(x AS DOUBLE) / CAST(x_tail AS DOUBLE))), 6)
      AS alpha,
    sum(x) AS topk_chars
  FROM ranked, xk1 WHERE rn <= 100
)
SELECT k, x_tail, alpha,
  round(topk_chars / CAST(total_chars AS DOUBLE), 6) AS tail_mass_frac
FROM agg, tot"""

    # r9: stratified k-fold balance — same salted-md5 bucket family as
    # the split assignments (md5('fold-42:' || doc_id), 15 hex chars,
    # mod 5)
    q["sampling_kfold"] = """
WITH cell AS (
  SELECT source,
    (CAST(concat('0x', substr(md5('fold-42:'
        || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5) AS fold,
    count(*) AS n_docs
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, sum(n_docs) AS src_docs FROM cell GROUP BY 1)
SELECT c.source, CAST(c.fold AS BIGINT) AS fold,
  CAST(c.n_docs AS BIGINT) AS n_docs,
  round(c.n_docs / CAST(t.src_docs AS DOUBLE), 6) AS fold_frac
FROM cell c JOIN tot t ON c.source = t.source"""

    # r9: Neyman allocation — N_h·σ_h share of the budget per source;
    # σ from exact integer moments (identical doubles in any engine)
    q["sampling_neyman_allocation"] = """
WITH strata AS (
  SELECT source, count(*) AS n_docs,
    sum(CAST(n_chars AS BIGINT)) AS s1,
    sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS s2
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs,
    sqrt(CAST(s2 AS DOUBLE) / n_docs
      - (CAST(s1 AS DOUBLE) / n_docs) * (CAST(s1 AS DOUBLE) / n_docs))
      AS sigma,
    n_docs * sqrt(CAST(s2 AS DOUBLE) / n_docs
      - (CAST(s1 AS DOUBLE) / n_docs) * (CAST(s1 AS DOUBLE) / n_docs))
      AS wt
  FROM strata
),
t AS (SELECT sum(wt) AS wsum FROM w)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
  round(sigma, 6) AS sigma_chars,
  round(wt, 6) AS weight,
  round(wt / wsum, 6) AS alloc_frac,
  CAST(floor(1000 * wt / wsum) AS BIGINT) AS alloc_n
FROM w, t"""


    # --- r10 inference wave ---

    # exact Shapley over session touch-set bitmasks: v(S) = conversion
    # rate of sessions with EXACTLY set S (0 unobserved); the subset
    # lattice is enumerable because channels are dim-grain (n=4)
    q["events_shapley_attribution"] = """
WITH marked AS (
  SELECT user_id, ts, event_id,
    CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
      WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END AS bit,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER
        (PARTITION BY user_id ORDER BY ts, event_id)) > 86400
      THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess_marked AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
sessions AS (
  SELECT user_id, session_id, bit_or(bit) AS mask,
    max(is_conv) AS converted
  FROM sess_marked GROUP BY user_id, session_id
),
v AS (
  SELECT mask, count(*) AS n_sessions, sum(converted) AS n_conv
  FROM sessions GROUP BY mask
),
masks AS (SELECT unnest(generate_series(0, 15)) AS s),
channels AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2),
    ('signup', 4), ('view', 8)) AS t(channel, bit)
),
lattice AS (
  SELECT c.channel, c.bit, m.s, (m.s | c.bit) AS s_with,
    CASE bit_count(m.s) WHEN 0 THEN 6.0/24.0 WHEN 1 THEN 2.0/24.0
      WHEN 2 THEN 2.0/24.0 WHEN 3 THEN 6.0/24.0 END AS w
  FROM channels c JOIN masks m ON (m.s & c.bit) = 0
),
gains AS (
  SELECT l.channel, l.bit,
    l.w * (coalesce(CAST(v1.n_conv AS DOUBLE) / v1.n_sessions, 0.0)
         - coalesce(CAST(v0.n_conv AS DOUBLE) / v0.n_sessions, 0.0))
      AS term
  FROM lattice l
  LEFT JOIN v v0 ON l.s = v0.mask
  LEFT JOIN v v1 ON l.s_with = v1.mask
),
per_channel AS (
  SELECT channel, bit, sum(term) AS phi FROM gains GROUP BY channel, bit
),
tot AS (SELECT sum(phi) AS phi_total FROM per_channel),
touched AS (
  SELECT p.channel, p.phi,
    coalesce(sum(v.n_sessions), 0) AS sessions_with_channel
  FROM per_channel p LEFT JOIN v ON (v.mask & p.bit) != 0
  GROUP BY p.channel, p.phi
)
SELECT channel, CAST(sessions_with_channel AS BIGINT)
    AS sessions_with_channel,
  round(phi, 6) AS shapley_credit,
  round(CASE WHEN abs(phi_total) > 1e-9 THEN phi / phi_total END, 6)
    AS share
FROM touched, tot"""

    # CUPED: every moment is an exact decimal(38,0) sum of per-user
    # cent totals (the daily_acf recipe); all doubles derived once
    q["events_cuped"] = """
WITH per_user AS (
  SELECT user_id,
    coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
      CAST(round(value * 100) AS DECIMAL(38,0)) END), 0) AS x,
    coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
      CAST(round(value * 100) AS DECIMAL(38,0)) END), 0) AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT
    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b,
    sum(CASE WHEN user_id % 2 = 0 THEN x END) AS sx_a,
    sum(CASE WHEN user_id % 2 = 1 THEN x END) AS sx_b,
    sum(CASE WHEN user_id % 2 = 0 THEN y END) AS sy_a,
    sum(CASE WHEN user_id % 2 = 1 THEN y END) AS sy_b,
    sum(CASE WHEN user_id % 2 = 0 THEN x * y END) AS sxy_a,
    sum(CASE WHEN user_id % 2 = 1 THEN x * y END) AS sxy_b,
    sum(CASE WHEN user_id % 2 = 0 THEN x * x END) AS sxx_a,
    sum(CASE WHEN user_id % 2 = 1 THEN x * x END) AS sxx_b,
    sum(CASE WHEN user_id % 2 = 0 THEN y * y END) AS syy_a,
    sum(CASE WHEN user_id % 2 = 1 THEN y * y END) AS syy_b
  FROM per_user
),
d AS (
  SELECT CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
    CAST(sx_a AS DOUBLE) AS sxa, CAST(sx_b AS DOUBLE) AS sxb,
    CAST(sy_a AS DOUBLE) AS sya, CAST(sy_b AS DOUBLE) AS syb,
    CAST(sxy_a AS DOUBLE) AS sxya, CAST(sxy_b AS DOUBLE) AS sxyb,
    CAST(sxx_a AS DOUBLE) AS sxxa, CAST(sxx_b AS DOUBLE) AS sxxb,
    CAST(syy_a AS DOUBLE) AS syya, CAST(syy_b AS DOUBLE) AS syyb,
    n_a AS n_a_i, n_b AS n_b_i
  FROM m
),
s AS (
  SELECT *,
    na + nb AS n, sxa + sxb AS sx, sya + syb AS sy,
    sxya + sxyb AS sxy, sxxa + sxxb AS sxx
  FROM d
),
t AS (
  SELECT *,
    CASE WHEN n * sxx - sx * sx > 0
      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) ELSE 0.0 END
      AS theta,
    sx / n AS mean_x
  FROM s
),
a AS (
  SELECT *,
    sxa / na AS mxa, sya / na AS mya,
    sxb / nb AS mxb, syb / nb AS myb,
    syya / na - (sya / na) * (sya / na) AS vya,
    syyb / nb - (syb / nb) * (syb / nb) AS vyb,
    sxxa / na - (sxa / na) * (sxa / na) AS vxa,
    sxxb / nb - (sxb / nb) * (sxb / nb) AS vxb,
    sxya / na - (sxa / na) * (sya / na) AS cva,
    sxyb / nb - (sxb / nb) * (syb / nb) AS cvb
  FROM t
),
b AS (
  SELECT *,
    mya - theta * (mxa - mean_x) AS adja,
    myb - theta * (mxb - mean_x) AS adjb,
    vya - 2 * theta * cva + theta * theta * vxa AS vadja,
    vyb - 2 * theta * cvb + theta * theta * vxb AS vadjb
  FROM a
)
SELECT CAST(n_a_i AS BIGINT) AS n_a, CAST(n_b_i AS BIGINT) AS n_b,
  round(theta, 6) AS theta,
  round(mya / 100.0, 6) AS mean_a_raw,
  round(myb / 100.0, 6) AS mean_b_raw,
  round(adja / 100.0, 6) AS mean_a_cuped,
  round(adjb / 100.0, 6) AS mean_b_cuped,
  round(CASE WHEN vya / na + vyb / nb > 0
    THEN (myb - mya) / sqrt(vya / na + vyb / nb) END, 6) AS z_raw,
  round(CASE WHEN vadja / na + vadjb / nb > 0
    THEN (adjb - adja) / sqrt(vadja / na + vadjb / nb) END, 6)
    AS z_cuped,
  round(CASE WHEN na * vya + nb * vyb > 0
    THEN 1 - (na * vadja + nb * vadjb) / (na * vya + nb * vyb) END, 6)
    AS var_reduction
FROM b"""

    # OLS daily trend with inference columns, exact co-moments
    q["events_ols_trend"] = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT)
),
m AS (
  SELECT event_type, count(*) AS days,
    min(day) AS day_min, max(day) AS day_max,
    CAST(sum(CAST(day AS DECIMAL(38,0))) AS DOUBLE) AS sx,
    CAST(sum(CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS sy,
    CAST(sum(CAST(day AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
      AS DOUBLE) AS sxy,
    CAST(sum(CAST(day AS DECIMAL(38,0)) * CAST(day AS DECIMAL(38,0)))
      AS DOUBLE) AS sxx,
    CAST(sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
      AS DOUBLE) AS syy
  FROM daily GROUP BY event_type
),
f AS (
  SELECT *, CAST(days AS DOUBLE) AS n,
    n * sxx - sx * sx AS sxx_c,
    n * syy - sy * sy AS syy_c,
    n * sxy - sx * sy AS sxy_c
  FROM m
),
g AS (
  SELECT *,
    CASE WHEN sxx_c > 0 THEN sxy_c / sxx_c END AS slope
  FROM f
),
h AS (
  SELECT *,
    (sy - slope * sx) / n AS intercept,
    CASE WHEN sxx_c > 0 AND syy_c > 0
      THEN sxy_c * sxy_c / (sxx_c * syy_c) END AS r2,
    CASE WHEN days > 2 AND sxx_c > 0
      THEN sqrt(greatest((syy_c - slope * sxy_c) / n, 0.0)
        / (n - 2) / (sxx_c / n)) END AS se
  FROM g
)
SELECT event_type, CAST(days AS BIGINT) AS days,
  round(slope, 6) AS slope,
  round(intercept + slope * day_min, 6) AS fit_start,
  round(intercept + slope * day_max, 6) AS fit_end,
  round(r2, 6) AS r2,
  round(se, 6) AS slope_se,
  round(CASE WHEN se > 0 THEN slope / se END, 6) AS t_stat
FROM h"""


    # Markov removal-effect attribution: the 12 absorption steps
    # UNROLL as chained aggregate CTEs (the pagerank convention —
    # truncation is part of the query semantics, mirrored by the
    # Spark side's fixed-step driver fold); conv/null absorb via
    # explicit self-loop probability rows
    q["events_markov_attribution"] = """
WITH mmark AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER
        (PARTITION BY user_id ORDER BY ts, event_id)) > 86400
      THEN 1 ELSE 0 END AS new_session
  FROM events
),
msess AS (
  SELECT user_id, ts, event_id, event_type,
    sum(new_session) OVER (PARTITION BY user_id
      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM mmark
),
mranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
    ORDER BY ts, event_id) AS rn
  FROM msess
),
mflag AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' THEN rn END)
    OVER (PARTITION BY user_id, session_id) AS purchase_rn
  FROM mranked
),
mkept AS (
  SELECT * FROM mflag
  WHERE event_type != 'purchase'
    AND (purchase_rn IS NULL OR rn < purchase_rn)
),
mstep AS (
  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id,
      session_id ORDER BY ts, event_id), 'start') AS from_state,
    event_type AS to_state
  FROM mkept
),
mlast AS (
  SELECT event_type AS from_state,
    CASE WHEN purchase_rn IS NOT NULL THEN 'conv' ELSE 'null' END
      AS to_state
  FROM (SELECT *, max(rn) OVER (PARTITION BY user_id, session_id)
      AS last_rn FROM mkept)
  WHERE rn = last_rn
),
mempty AS (
  SELECT 'start' AS from_state,
    CASE WHEN max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      END) = 1 THEN 'conv' ELSE 'null' END AS to_state
  FROM mflag GROUP BY user_id, session_id
  HAVING sum(CASE WHEN event_type != 'purchase'
    AND (purchase_rn IS NULL OR rn < purchase_rn)
    THEN 1 ELSE 0 END) = 0
),
mcounts AS MATERIALIZED (
  SELECT from_state, to_state, count(*) AS cnt
  FROM (SELECT * FROM mstep UNION ALL SELECT * FROM mlast
    UNION ALL SELECT * FROM mempty)
  GROUP BY 1, 2
),
mvariants AS (
  SELECT 'full' AS variant
  UNION
  SELECT s FROM (
    SELECT from_state AS s FROM mcounts
    UNION SELECT to_state FROM mcounts
  ) WHERE s NOT IN ('start', 'conv', 'null')
),
mtvar AS MATERIALIZED (
  SELECT v.variant, c.from_state,
    CASE WHEN c.to_state = v.variant THEN 'null' ELSE c.to_state END
      AS to_state,
    sum(cnt) AS cnt
  FROM mcounts c CROSS JOIN mvariants v
  WHERE c.from_state != v.variant
  GROUP BY 1, 2, 3
),
mprobs AS MATERIALIZED (
  SELECT variant, from_state, to_state,
    CAST(cnt AS DOUBLE)
      / sum(cnt) OVER (PARTITION BY variant, from_state) AS p
  FROM mtvar
  UNION ALL
  SELECT variant, s, s, 1.0
  FROM mvariants, (VALUES ('conv'), ('null')) t(s)
),
mv0 AS (SELECT variant, 'start' AS state, 1.0 AS p FROM mvariants)
,
mv1 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv0.p * pr.p) AS p
  FROM mprobs pr JOIN mv0
    ON pr.variant = mv0.variant AND pr.from_state = mv0.state
  GROUP BY 1, 2
),
mv2 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv1.p * pr.p) AS p
  FROM mprobs pr JOIN mv1
    ON pr.variant = mv1.variant AND pr.from_state = mv1.state
  GROUP BY 1, 2
),
mv3 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv2.p * pr.p) AS p
  FROM mprobs pr JOIN mv2
    ON pr.variant = mv2.variant AND pr.from_state = mv2.state
  GROUP BY 1, 2
),
mv4 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv3.p * pr.p) AS p
  FROM mprobs pr JOIN mv3
    ON pr.variant = mv3.variant AND pr.from_state = mv3.state
  GROUP BY 1, 2
),
mv5 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv4.p * pr.p) AS p
  FROM mprobs pr JOIN mv4
    ON pr.variant = mv4.variant AND pr.from_state = mv4.state
  GROUP BY 1, 2
),
mv6 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv5.p * pr.p) AS p
  FROM mprobs pr JOIN mv5
    ON pr.variant = mv5.variant AND pr.from_state = mv5.state
  GROUP BY 1, 2
),
mv7 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv6.p * pr.p) AS p
  FROM mprobs pr JOIN mv6
    ON pr.variant = mv6.variant AND pr.from_state = mv6.state
  GROUP BY 1, 2
),
mv8 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv7.p * pr.p) AS p
  FROM mprobs pr JOIN mv7
    ON pr.variant = mv7.variant AND pr.from_state = mv7.state
  GROUP BY 1, 2
),
mv9 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv8.p * pr.p) AS p
  FROM mprobs pr JOIN mv8
    ON pr.variant = mv8.variant AND pr.from_state = mv8.state
  GROUP BY 1, 2
),
mv10 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv9.p * pr.p) AS p
  FROM mprobs pr JOIN mv9
    ON pr.variant = mv9.variant AND pr.from_state = mv9.state
  GROUP BY 1, 2
),
mv11 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv10.p * pr.p) AS p
  FROM mprobs pr JOIN mv10
    ON pr.variant = mv10.variant AND pr.from_state = mv10.state
  GROUP BY 1, 2
),
mv12 AS (
  SELECT pr.variant, pr.to_state AS state, sum(mv11.p * pr.p) AS p
  FROM mprobs pr JOIN mv11
    ON pr.variant = mv11.variant AND pr.from_state = mv11.state
  GROUP BY 1, 2
),
mres AS (
  SELECT variant,
    coalesce(sum(CASE WHEN state = 'conv' THEN p END), 0.0) AS pc
  FROM mv12 GROUP BY variant
),
mfull AS (SELECT pc AS p_full FROM mres WHERE variant = 'full'),
meff AS (
  SELECT r.variant AS channel, f.p_full, r.pc AS p_removed,
    CASE WHEN f.p_full > 1e-12 THEN 1 - r.pc / f.p_full END AS re
  FROM mres r, mfull f WHERE r.variant != 'full'
),
mtot AS (SELECT sum(re) AS re_sum FROM meff)
SELECT channel, round(p_full, 6) + 0.0 AS p_conv_full,
  round(p_removed, 6) + 0.0 AS p_conv_removed,
  round(re, 6) + 0.0 AS removal_effect,
  round(CASE WHEN re IS NOT NULL AND abs(re_sum) > 1e-9
    THEN re / re_sum END, 6) + 0.0 AS credit_share
FROM meff, mtot"""


    # link prediction: wedge self-join keyed on the shared neighbor,
    # hub centers excluded (part of the semantics), adjacency removed
    # by anti-join; Jaccard is exact int arithmetic + one division
    q["graph_link_prediction"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS MATERIALIZED (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
both_dir AS MATERIALIZED (
  SELECT part_a AS z, part_b AS p FROM und
  UNION ALL SELECT part_b AS z, part_a AS p FROM und
),
deg AS MATERIALIZED (SELECT z, count(*) AS d FROM both_dir GROUP BY z),
centers AS (
  SELECT b.z, b.p, dg.d FROM both_dir b JOIN deg dg ON b.z = dg.z
  WHERE dg.d <= 500
),
scored AS (
  SELECT a.p AS pa, b.p AS pb, count(*) AS common_neighbors,
    sum(1.0 / ln(a.d)) AS aa_raw
  FROM centers a JOIN centers b ON a.z = b.z AND a.p != b.p
  WHERE a.p < 100
  GROUP BY 1, 2
),
cand AS (
  SELECT s.* FROM scored s
  LEFT JOIN both_dir e ON s.pa = e.z AND s.pb = e.p
  WHERE e.z IS NULL AND s.common_neighbors >= 20
)
SELECT c.pa AS part, c.pb AS candidate,
  CAST(c.common_neighbors AS BIGINT) AS common_neighbors,
  round(CAST(c.common_neighbors AS DOUBLE)
    / (da.d + db.d - c.common_neighbors), 6) AS jaccard,
  round(c.aa_raw, 6) AS adamic_adar
FROM cand c JOIN deg da ON c.pa = da.z JOIN deg db ON c.pb = db.z"""

    # bounded synchronous label propagation: 6 rounds unrolled as
    # chained (vote count + argmax window) CTEs, ties to the smallest
    # label — deterministic, so the round-6 labeling matches exactly
    q["graph_label_propagation"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
lund AS MATERIALIZED (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
lboth AS MATERIALIZED (
  SELECT part_a AS v, part_b AS u FROM lund
  UNION ALL SELECT part_b AS v, part_a AS u FROM lund
),
lv0 AS (SELECT DISTINCT v, v AS label FROM lboth)
,
lv1 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv0 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv2 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv1 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv3 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv2 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv4 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv3 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv5 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv4 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv6 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv5 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
)
SELECT label AS community, CAST(count(*) AS BIGINT) AS n_parts,
  min(v) AS min_part
FROM lv6 GROUP BY label"""



    # r11: degree assortativity — Pearson over symmetrized endpoint
    # degree pairs, exact HUGEINT co-moments, one double expression
    q["graph_assortativity"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
aund AS MATERIALIZED (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
aboth AS (
  SELECT part_a AS v FROM aund UNION ALL SELECT part_b AS v FROM aund
),
adeg AS (SELECT v, count(*) AS d FROM aboth GROUP BY v),
apairs AS (
  SELECT da.d AS x, db.d AS y
  FROM aund e JOIN adeg da ON e.part_a = da.v
  JOIN adeg db ON e.part_b = db.v
  UNION ALL
  SELECT db.d AS x, da.d AS y
  FROM aund e JOIN adeg da ON e.part_a = da.v
  JOIN adeg db ON e.part_b = db.v
),
am AS (
  SELECT count(*) AS n,
    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS sxy,
    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS sxx,
    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS syy
  FROM apairs
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
  round(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
      AND CAST(n AS DOUBLE) * syy - sy * sy > 0
    THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
      / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
        * (CAST(n AS DOUBLE) * syy - sy * sy)) END, 6)
    AS assortativity
FROM am"""

    # r11: Newman modularity of the LPA communities — the same
    # unrolled chain, then TWO exact-integer aggregates (intra edges;
    # sum of squared community degree masses) + one double expression
    q["graph_modularity"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
lund AS MATERIALIZED (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
lboth AS MATERIALIZED (
  SELECT part_a AS v, part_b AS u FROM lund
  UNION ALL SELECT part_b AS v, part_a AS u FROM lund
),
lv0 AS (SELECT DISTINCT v, v AS label FROM lboth)
,
lv1 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv0 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv2 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv1 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv3 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv2 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv4 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv3 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv5 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv4 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
lv6 AS (
  SELECT v, label FROM (
    SELECT b.v, l.label, count(*) AS cnt,
      row_number() OVER (PARTITION BY b.v
        ORDER BY count(*) DESC, l.label ASC) AS rk
    FROM lboth b JOIN lv5 l ON b.u = l.v
    GROUP BY b.v, l.label
  ) WHERE rk = 1
),
md_deg AS (SELECT v, count(*) AS d FROM lboth GROUP BY v),
md_intra AS (
  SELECT count(*) AS n_edges,
    sum(CASE WHEN a.label = b.label THEN 1 ELSE 0 END) AS intra
  FROM lund e JOIN lv6 a ON e.part_a = a.v JOIN lv6 b ON e.part_b = b.v
),
md_degc AS (
  SELECT l.label, sum(d.d) AS deg_c
  FROM md_deg d JOIN lv6 l ON d.v = l.v GROUP BY 1
),
md_sq AS (
  SELECT count(*) AS n_comm,
    sum(CAST(deg_c AS HUGEINT) * CAST(deg_c AS HUGEINT)) AS degsq
  FROM md_degc
)
SELECT CAST(s.n_comm AS BIGINT) AS n_communities,
  CAST(i.n_edges AS BIGINT) AS n_edges,
  CAST(i.intra AS BIGINT) AS intra_edges,
  round(CAST(i.intra AS DOUBLE) / CAST(i.n_edges AS DOUBLE)
    - CAST(s.degsq AS DOUBLE)
      / (4.0 * CAST(i.n_edges AS DOUBLE) * CAST(i.n_edges AS DOUBLE)),
    6) AS modularity
FROM md_intra i CROSS JOIN md_sq s"""

    # DBSCAN-style density profile: exact neighbor counting on the
    # round-6 cosine (the family's determinism convention)
    q["emb_density_cores"] = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
neigh AS (
  SELECT a.vec_id AS va, count(*) AS n_neighbors
  FROM e a JOIN e b ON a.vec_id != b.vec_id
  WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.3
  GROUP BY 1
)
SELECT e.vec_id,
  CAST(coalesce(n.n_neighbors, 0) AS BIGINT) AS n_neighbors,
  coalesce(n.n_neighbors, 0) >= 3 AS is_core
FROM e LEFT JOIN neigh n ON e.vec_id = n.va"""

    # Madow PPS systematic sampling: tick counting is pure HUGEINT
    # floor division (mirrors Spark's decimal `div`) — no float tick
    # positions anywhere
    q["sampling_pps_systematic"] = """
WITH cum AS (
  SELECT doc_id, n_chars,
    sum(CAST(n_chars AS HUGEINT)) OVER (ORDER BY doc_id
      ROWS UNBOUNDED PRECEDING) AS cum,
    sum(CAST(n_chars AS HUGEINT)) OVER () AS w_total
  FROM documents
),
sel AS (
  SELECT *,
    ((400 * cum + w_total) // (2 * w_total))
      - ((400 * (cum - n_chars) + w_total) // (2 * w_total))
      AS multiplicity
  FROM cum
)
SELECT doc_id, n_chars,
  round(CAST(n_chars AS DOUBLE) / CAST(w_total AS DOUBLE), 6)
    AS weight_share,
  CAST(multiplicity AS BIGINT) AS multiplicity
FROM sel WHERE multiplicity >= 1"""

    # per-doc 5-gram novelty: one gram-keyed aggregate recovers
    # corpus-unique grams (doc_n = 1) without a pair join
    q["text_ngram_novelty"] = """
WITH norm AS (
  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t
  FROM documents WHERE text IS NOT NULL
),
tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
grams AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(CASE WHEN len(toks) >= 5 THEN
      list_transform(generate_series(1, len(toks) - 4),
        i -> CAST(concat('0x',
          substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))
          AS BIGINT))
      ELSE [] END) AS g
    FROM tok)
),
pdn AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY 1),
gd AS (
  SELECT g, count(*) AS doc_n, min(doc_id) AS only_doc
  FROM grams GROUP BY 1
),
nov AS (
  SELECT only_doc AS doc_id, count(*) AS novel_grams
  FROM gd WHERE doc_n = 1 GROUP BY 1
)
SELECT n.doc_id,
  CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(coalesce(v.novel_grams, 0) AS BIGINT) AS novel_grams,
  round(CASE WHEN p.n_grams > 0
    THEN CAST(coalesce(v.novel_grams, 0) AS DOUBLE) / p.n_grams END, 6)
    AS novelty
FROM norm n
LEFT JOIN pdn p ON n.doc_id = p.doc_id
LEFT JOIN nov v ON n.doc_id = v.doc_id"""

    # single changepoint by binary segmentation: argmax ranks on the
    # EXACT integer gain numerator (HUGEINT), mirroring Spark's
    # decimal(38,0) ranking; the reported gain divides two
    # identically-derived exact values once
    q["events_changepoint"] = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT event_type, day,
    sum(CAST(c AS HUGEINT)) OVER (PARTITION BY event_type
      ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
    count(*) OVER (PARTITION BY event_type) AS n,
    sum(CAST(c AS HUGEINT)) OVER (PARTITION BY event_type) AS s
  FROM daily
),
cands AS (
  SELECT event_type, day, i, n,
    CAST(CAST(n AS HUGEINT) * (n - i) * cum * cum
      + CAST(n AS HUGEINT) * i * (s - cum) * (s - cum)
      - CAST(i AS HUGEINT) * (n - i) * s * s AS DOUBLE)
      / CAST(CAST(i AS HUGEINT) * (n - i) * n AS DOUBLE) AS gain_raw,
    round(CAST(cum AS DOUBLE) / i, 6) AS mean_before,
    round(CAST(s - cum AS DOUBLE) / (n - i), 6) AS mean_after
  FROM pre WHERE i < n
),
r AS (
  SELECT *, round(gain_raw, 6) AS gain,
    row_number() OVER (PARTITION BY event_type
      ORDER BY gain_raw DESC, day ASC) AS rk
  FROM cands
)
SELECT event_type, CAST(n AS BIGINT) AS days,
  strftime(to_timestamp(day * 86400), '%Y-%m-%d') AS change_day,
  CAST(i AS BIGINT) AS days_before, mean_before, mean_after, gain
FROM r WHERE rk = 1"""


    # split-conformal daily interval: q̂ is an exact integer-rank
    # order statistic over the bounded calibration grain
    q["events_conformal_interval"] = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day)
    AS i
  FROM daily
),
cal AS (SELECT * FROM idx WHERE i <= 20),
tst AS (SELECT * FROM idx WHERE i > 20),
cs AS (
  SELECT event_type, count(*) AS n_cal,
    CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE) / count(*) AS mu
  FROM cal GROUP BY 1
),
resid AS (
  SELECT cal.event_type, cal.day, cs.n_cal, cs.mu,
    abs(CAST(cal.c AS DOUBLE) - cs.mu) AS r,
    row_number() OVER (PARTITION BY cal.event_type
      ORDER BY abs(CAST(cal.c AS DOUBLE) - cs.mu) ASC, cal.day ASC)
      AS rk
  FROM cal JOIN cs ON cal.event_type = cs.event_type
),
qh AS (
  SELECT event_type, r AS q_hat, mu, n_cal FROM resid
  WHERE rk = least(CAST(((n_cal + 1) * 900 + 999) // 1000 AS BIGINT),
                   n_cal)
),
cov AS (
  SELECT t.event_type, q.q_hat, q.mu, q.n_cal,
    count(*) AS n_test,
    sum(CASE WHEN abs(CAST(t.c AS DOUBLE) - q.mu) <= q.q_hat
      THEN 1 ELSE 0 END) AS test_covered
  FROM tst t JOIN qh q ON t.event_type = q.event_type
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, CAST(n_cal AS BIGINT) AS n_cal,
  CAST(n_test AS BIGINT) AS n_test,
  round(mu, 6) AS point, round(q_hat, 6) AS q_hat,
  round(mu - q_hat, 6) AS lo, round(mu + q_hat, 6) AS hi,
  CAST(test_covered AS BIGINT) AS test_covered,
  round(CAST(test_covered AS DOUBLE) / n_test, 6) AS coverage
FROM cov"""


    # lag-1 Granger causality: both fits closed-form from integer-exact
    # decimal co-moments (2x2 Cramer), every double derived once; the
    # singular-design decisions happen on the exact integers
    q["events_granger"] = """
WITH gdaily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
grows AS (
  SELECT y.event_type AS effect, x.event_type AS cause, y.day,
    y.c AS yv, l.c AS yl, x.c AS xl
  FROM gdaily y
  JOIN gdaily l ON l.event_type = y.event_type AND l.day + 1 = y.day
  JOIN gdaily x ON x.day + 1 = y.day AND x.event_type != y.event_type
),
gm AS (
  SELECT cause, effect, count(*) AS n,
    sum(CAST(yv AS HUGEINT)) AS sy,
    sum(CAST(yl AS HUGEINT)) AS sl,
    sum(CAST(xl AS HUGEINT)) AS sx,
    sum(CAST(yv AS HUGEINT) * yl) AS syl,
    sum(CAST(yv AS HUGEINT) * xl) AS syx,
    sum(CAST(yl AS HUGEINT) * xl) AS slx,
    sum(CAST(yl AS HUGEINT) * yl) AS sll,
    sum(CAST(xl AS HUGEINT) * xl) AS sxx,
    sum(CAST(yv AS HUGEINT) * yv) AS syy
  FROM grows GROUP BY 1, 2
),
gc AS (
  SELECT cause, effect, n,
    n * sll - sl * sl AS a11,
    n * sxx - sx * sx AS a22,
    n * slx - sl * sx AS a12,
    n * syl - sy * sl AS b1,
    n * syx - sy * sx AS b2,
    n * syy - sy * sy AS cy
  FROM gm
),
gdet AS (
  SELECT *, a11 * a22 - a12 * a12 AS det FROM gc
),
gfit AS (
  SELECT *,
    CASE WHEN det != 0 THEN
      (CAST(b1 AS DOUBLE) * CAST(a22 AS DOUBLE)
       - CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE)) / CAST(det AS DOUBLE)
    END AS bf,
    CASE WHEN det != 0 THEN
      (CAST(a11 AS DOUBLE) * CAST(b2 AS DOUBLE)
       - CAST(a12 AS DOUBLE) * CAST(b1 AS DOUBLE)) / CAST(det AS DOUBLE)
    END AS cf
  FROM gdet
),
grss AS (
  SELECT *,
    CAST(cy AS DOUBLE) - bf * CAST(b1 AS DOUBLE)
      - cf * CAST(b2 AS DOUBLE) AS rss_f,
    CASE WHEN a11 != 0 THEN CAST(cy AS DOUBLE)
      - CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE) / CAST(a11 AS DOUBLE)
    END AS rss_r
  FROM gfit
)
SELECT cause, effect, CAST(n AS BIGINT) AS n,
  round(bf, 6) AS beta_self,
  round(cf, 6) AS beta_cross,
  round(CASE WHEN n > 3 AND rss_f > 0
    THEN (rss_r - rss_f) / (rss_f / (CAST(n AS DOUBLE) - 3.0)) END, 6)
    AS f_stat
FROM grss"""


    # PSIS k-hat on the DSIR weights: Hill tail index straight on the
    # LOG weights (no exponentials), k-hat = 1/alpha; sources with
    # <= m docs emit no row (honest absence)
    q["sampling_psis_khat"] = f"""
WITH {_dsir_cte},
kranked AS (
  SELECT source, doc_id, log_ratio,
    row_number() OVER (PARTITION BY source
      ORDER BY log_ratio DESC, doc_id ASC) AS rn
  FROM w
),
ktail AS (
  SELECT source, log_ratio AS lr_tail FROM kranked WHERE rn = 11
),
kagg AS (
  SELECT k.source, t.lr_tail, count(*) AS m_rows,
    sum(k.log_ratio - t.lr_tail) AS s_excess
  FROM kranked k JOIN ktail t ON k.source = t.source
  WHERE k.rn <= 10
  GROUP BY 1, 2
)
SELECT source, CAST(m_rows AS BIGINT) AS m,
  round(lr_tail, 6) AS lr_tail,
  round(CASE WHEN s_excess > 0
    THEN CAST(m_rows AS DOUBLE) / s_excess END, 6) AS alpha,
  round(CASE WHEN s_excess > 0
    THEN s_excess / CAST(m_rows AS DOUBLE) END, 6) AS khat,
  CASE WHEN s_excess > 0
    THEN s_excess / CAST(m_rows AS DOUBLE) <= 0.7 END AS reliable
FROM kagg"""


    # centroid silhouette per label: one dim explode, label×dim
    # centroid aggregate, all |labels| distances per vector in one join
    q["emb_silhouette"] = """
WITH se AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings
),
sdims AS (
  SELECT vec_id, label, d, emb[d + 1] AS v
  FROM se, (SELECT unnest(generate_series(0, 63)) AS d)
),
scent AS (
  SELECT label AS clabel, d, avg(v) AS c FROM sdims GROUP BY 1, 2
),
sdist AS (
  SELECT s.vec_id, s.label, ce.clabel,
    sqrt(sum((s.v - ce.c) * (s.v - ce.c))) AS dist
  FROM sdims s JOIN scent ce ON s.d = ce.d
  GROUP BY 1, 2, 3
),
sv AS (
  SELECT vec_id, label,
    min(CASE WHEN clabel = label THEN dist END) AS a,
    min(CASE WHEN clabel != label THEN dist END) AS b
  FROM sdist GROUP BY 1, 2
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
  round(avg(a), 6) AS mean_a, round(avg(b), 6) AS mean_b,
  round(avg(CASE WHEN greatest(a, b) > 0
    THEN (b - a) / greatest(a, b) ELSE 0.0 END), 6) AS silhouette
FROM sv GROUP BY label"""

    # Dunning log-likelihood keyness (Rayson-Garside 2-term form),
    # ranked on round-6 G2 with token tie-break
    q["text_keyness"] = """
WITH ktoks AS (
  SELECT source, unnest(string_split(
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
kst AS (
  SELECT source, token, count(*) AS a FROM ktoks GROUP BY 1, 2
),
ktok AS (SELECT token, sum(a) AS t_tok FROM kst GROUP BY 1),
ksrc AS (SELECT source, sum(a) AS t_src FROM kst GROUP BY 1),
kall AS (SELECT sum(a) AS t_all FROM kst),
kj AS (
  SELECT s.source, s.token,
    CAST(s.a AS DOUBLE) AS a,
    CAST(t.t_tok - s.a AS DOUBLE) AS b,
    CAST(r.t_src AS DOUBLE) AS ta,
    CAST(g.t_all - r.t_src AS DOUBLE) AS tb,
    CAST(t.t_tok AS DOUBLE) AS ttok,
    CAST(g.t_all AS DOUBLE) AS tall,
    s.a AS a_i, t.t_tok AS t_tok_i
  FROM kst s JOIN ktok t ON s.token = t.token
  JOIN ksrc r ON s.source = r.source
  CROSS JOIN kall g
),
kg AS (
  SELECT source, token, a_i, t_tok_i,
    round(2.0 * (
      CASE WHEN a > 0
        THEN a * ln(a / (ta * ttok / tall)) ELSE 0.0 END
      + CASE WHEN b > 0
        THEN b * ln(b / (tb * ttok / tall)) ELSE 0.0 END), 6) AS g2
  FROM kj WHERE a_i >= 5
),
kr AS (
  SELECT *, row_number() OVER (PARTITION BY source
    ORDER BY g2 DESC, token ASC) AS rank
  FROM kg
)
SELECT source, token, CAST(a_i AS BIGINT) AS count_in,
  CAST(t_tok_i - a_i AS BIGINT) AS count_rest, g2,
  CAST(rank AS BIGINT) AS rank
FROM kr WHERE rank <= 5"""


    # r11: per-source keyness DRIFT — batch (doc_id%5==0) vs lifetime
    # within source; per-token G2 rounded to 6 BEFORE the DECIMAL sum
    # (order-independent total), top token ranked (g2 desc, token asc)
    q["text_keyness_drift"] = """
WITH kd_toks AS (
  SELECT doc_id, source, unnest(string_split(
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
kd_b AS (
  SELECT source, token, count(*) AS a FROM kd_toks
  WHERE doc_id % 5 = 0 GROUP BY 1, 2
),
kd_l AS (
  SELECT source, token, count(*) AS b FROM kd_toks
  WHERE doc_id % 5 != 0 GROUP BY 1, 2
),
kd_bt AS (SELECT source, sum(a) AS ta FROM kd_b GROUP BY 1),
kd_lt AS (SELECT source, sum(b) AS tb FROM kd_l GROUP BY 1),
kd_j AS (
  SELECT b.source, b.token,
    CAST(b.a AS DOUBLE) AS a,
    CAST(coalesce(l.b, 0) AS DOUBLE) AS bb,
    CAST(t.ta AS DOUBLE) AS ta,
    CAST(coalesce(u.tb, 0) AS DOUBLE) AS tb
  FROM kd_b b
  LEFT JOIN kd_l l ON b.source = l.source AND b.token = l.token
  JOIN kd_bt t ON b.source = t.source
  LEFT JOIN kd_lt u ON b.source = u.source
  WHERE b.a >= 5
),
kd_g AS (
  SELECT source, token, ta, tb,
    round(2.0 * (
      CASE WHEN a > 0 AND (ta * (a + bb) / (ta + tb)) > 0
        THEN a * ln(a / (ta * (a + bb) / (ta + tb))) ELSE 0.0 END
    + CASE WHEN bb > 0 AND (tb * (a + bb) / (ta + tb)) > 0
        THEN bb * ln(bb / (tb * (a + bb) / (ta + tb))) ELSE 0.0 END
    ), 6) AS g2
  FROM kd_j
),
kd_agg AS (
  SELECT source, ta, tb, count(*) AS n_drift,
    CAST(sum(CAST(g2 AS DECIMAL(38,6))) AS DOUBLE) AS g2_tot
  FROM kd_g GROUP BY 1, 2, 3
),
kd_top AS (
  SELECT source, token AS top_token, g2 AS top_g2,
    row_number() OVER (PARTITION BY source
      ORDER BY g2 DESC, token ASC) AS rk
  FROM kd_g
)
SELECT a.source,
  CAST(a.ta AS BIGINT) AS n_batch_tokens,
  CAST(a.tb AS BIGINT) AS n_lifetime_tokens,
  CAST(a.n_drift AS BIGINT) AS n_drift_tokens,
  round(a.g2_tot, 6) AS g2_total,
  t.top_token, t.top_g2,
  (a.g2_tot / a.n_drift) > 20.0 AS alert
FROM kd_agg a JOIN kd_top t ON a.source = t.source AND t.rk = 1"""


    # scale-path density profile over the multi-table LSH candidate
    # graph — composes the dedup_embedding_cosine pair SQL
    q["emb_density_cores_lsh"] = f"""
WITH dpairs AS (SELECT * FROM ({q["dedup_embedding_cosine"]}) p),
dboth AS (
  SELECT vec_a AS vec_id FROM dpairs
  UNION ALL SELECT vec_b FROM dpairs
),
dcnt AS (
  SELECT vec_id, count(*) AS n FROM dboth GROUP BY 1
)
SELECT e.vec_id,
  CAST(coalesce(d.n, 0) AS BIGINT) AS n_neighbors_lsh,
  coalesce(d.n, 0) >= 2 AS is_core
FROM embeddings e LEFT JOIN dcnt d ON e.vec_id = d.vec_id"""


    # STL-lite additive decomposition: centered 7-day MA trend,
    # DOW mean of the detrended series, residual
    q["events_seasonal_decompose"] = """
WITH sdaily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
strend AS (
  SELECT event_type, day, c, day % 7 AS dow,
    CASE WHEN count(*) OVER w = 7 THEN
      CAST(sum(CAST(c AS HUGEINT)) OVER w AS DOUBLE) / 7.0 END AS trend
  FROM sdaily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
sseason AS (
  SELECT event_type, dow,
    avg(CAST(c AS DOUBLE) - trend) AS seasonal
  FROM strend WHERE trend IS NOT NULL GROUP BY 1, 2
)
SELECT t.event_type, t.day, CAST(t.c AS BIGINT) AS value,
  round(t.trend, 6) AS trend,
  round(CASE WHEN t.trend IS NOT NULL THEN s.seasonal END, 6)
    AS seasonal,
  round(CASE WHEN t.trend IS NOT NULL
    THEN CAST(t.c AS DOUBLE) - t.trend - s.seasonal END, 6)
    AS residual
FROM strend t LEFT JOIN sseason s
  ON t.event_type = s.event_type AND t.dow = s.dow"""

    # paired DiD: per-user post-minus-pre cent deltas, two-sample test
    q["events_did"] = """
WITH dper_user AS (
  SELECT user_id,
    coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN
      CAST(round(value * 100) AS DECIMAL(38,0)) END), 0)
    - coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN
      CAST(round(value * 100) AS DECIMAL(38,0)) END), 0) AS d
  FROM events GROUP BY user_id
),
dm AS (
  SELECT
    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_c,
    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_t,
    sum(CASE WHEN user_id % 2 = 0 THEN d END) AS s_c,
    sum(CASE WHEN user_id % 2 = 1 THEN d END) AS s_t,
    sum(CASE WHEN user_id % 2 = 0 THEN d * d END) AS ss_c,
    sum(CASE WHEN user_id % 2 = 1 THEN d * d END) AS ss_t
  FROM dper_user
),
dd AS (
  SELECT CAST(n_c AS DOUBLE) AS nc, CAST(n_t AS DOUBLE) AS nt,
    CAST(s_c AS DOUBLE) AS sc, CAST(s_t AS DOUBLE) AS st,
    CAST(ss_c AS DOUBLE) AS ssc, CAST(ss_t AS DOUBLE) AS sst,
    n_c AS n_c_i, n_t AS n_t_i
  FROM dm
),
de AS (
  SELECT *,
    sc / nc AS mc, st / nt AS mt,
    ssc / nc - (sc / nc) * (sc / nc) AS vc,
    sst / nt - (st / nt) * (st / nt) AS vt
  FROM dd
),
df2 AS (
  SELECT *,
    CASE WHEN vc / nc + vt / nt > 0
      THEN sqrt(vc / nc + vt / nt) END AS se,
    mt - mc AS did
  FROM de
)
SELECT CAST(n_c_i AS BIGINT) AS n_control,
  CAST(n_t_i AS BIGINT) AS n_treat,
  round(mc / 100.0, 6) AS mean_diff_control,
  round(mt / 100.0, 6) AS mean_diff_treat,
  round(did / 100.0, 6) AS did,
  round(se / 100.0, 6) AS se,
  round(CASE WHEN se > 0 THEN did / se END, 6) AS t_stat
FROM df2"""


    # additive Holt-Winters (weekly m=7): recursive CTE carrying the 7
    # seasonal slots as columns, token-identical update arithmetic to
    # the Spark fold (the Holt/EWMA convention); sub-14-day series
    # emit the honest NULL row
    q["events_holt_winters"] = """
WITH RECURSIVE hwdaily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
hword AS (
  SELECT event_type, x,
    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM hwdaily
),
hwinit AS (
  SELECT event_type, max(n) AS n,
    sum(CASE WHEN rn <= 7 THEN x END) / 7 AS l,
    (sum(CASE WHEN rn BETWEEN 8 AND 14 THEN x END) / 7
     - sum(CASE WHEN rn <= 7 THEN x END) / 7) / 7 AS b,
    max(CASE WHEN rn = 1 THEN x END)
      - sum(CASE WHEN rn <= 7 THEN x END) / 7 AS s0,
    max(CASE WHEN rn = 2 THEN x END)
      - sum(CASE WHEN rn <= 7 THEN x END) / 7 AS s1,
    max(CASE WHEN rn = 3 THEN x END)
      - sum(CASE WHEN rn <= 7 THEN x END) / 7 AS s2,
    max(CASE WHEN rn = 4 THEN x END)
      - sum(CASE WHEN rn <= 7 THEN x END) / 7 AS s3,
    max(CASE WHEN rn = 5 THEN x END)
      - sum(CASE WHEN rn <= 7 THEN x END) / 7 AS s4,
    max(CASE WHEN rn = 6 THEN x END)
      - sum(CASE WHEN rn <= 7 THEN x END) / 7 AS s5,
    max(CASE WHEN rn = 7 THEN x END)
      - sum(CASE WHEN rn <= 7 THEN x END) / 7 AS s6
  FROM hword WHERE n >= 14 GROUP BY event_type
),
hwrec AS (
  SELECT event_type, CAST(7 AS BIGINT) AS t, n, l, b,
    s0, s1, s2, s3, s4, s5, s6
  FROM hwinit
  UNION ALL
  SELECT r.event_type, r.t + 1, r.n,
    0.3 * (o.x - CASE (r.t % 7) WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 WHEN 6 THEN r.s6 END) + 0.7 * (r.l + r.b) AS l,
    0.1 * (0.3 * (o.x - CASE (r.t % 7) WHEN 0 THEN r.s0 WHEN 1 THEN r.s1 WHEN 2 THEN r.s2 WHEN 3 THEN r.s3 WHEN 4 THEN r.s4 WHEN 5 THEN r.s5 WHEN 6 THEN r.s6 END) + 0.7 * (r.l + r.b) - r.l) + 0.9 * r.b AS b,
    CASE WHEN (r.t % 7) = 0 THEN 0.2 * (o.x - (0.3 * (o.x - r.s0)
      + 0.7 * (r.l + r.b))) + 0.8 * r.s0 ELSE r.s0 END AS s0,
    CASE WHEN (r.t % 7) = 1 THEN 0.2 * (o.x - (0.3 * (o.x - r.s1)
      + 0.7 * (r.l + r.b))) + 0.8 * r.s1 ELSE r.s1 END AS s1,
    CASE WHEN (r.t % 7) = 2 THEN 0.2 * (o.x - (0.3 * (o.x - r.s2)
      + 0.7 * (r.l + r.b))) + 0.8 * r.s2 ELSE r.s2 END AS s2,
    CASE WHEN (r.t % 7) = 3 THEN 0.2 * (o.x - (0.3 * (o.x - r.s3)
      + 0.7 * (r.l + r.b))) + 0.8 * r.s3 ELSE r.s3 END AS s3,
    CASE WHEN (r.t % 7) = 4 THEN 0.2 * (o.x - (0.3 * (o.x - r.s4)
      + 0.7 * (r.l + r.b))) + 0.8 * r.s4 ELSE r.s4 END AS s4,
    CASE WHEN (r.t % 7) = 5 THEN 0.2 * (o.x - (0.3 * (o.x - r.s5)
      + 0.7 * (r.l + r.b))) + 0.8 * r.s5 ELSE r.s5 END AS s5,
    CASE WHEN (r.t % 7) = 6 THEN 0.2 * (o.x - (0.3 * (o.x - r.s6)
      + 0.7 * (r.l + r.b))) + 0.8 * r.s6 ELSE r.s6 END AS s6
  FROM hwrec r JOIN hword o
    ON o.event_type = r.event_type AND o.rn = r.t + 1
),
hwfinal AS (
  SELECT * FROM hwrec WHERE t = n
)
SELECT f.event_type, CAST(f.n AS BIGINT) AS days,
  round(f.l, 6) AS level, round(f.b, 6) AS trend,
  round(f.l + f.b + CASE ((f.n + 1 - 1) % 7) WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END, 6) AS forecast_1,
  round(f.l + 7 * f.b + CASE ((f.n + 7 - 1) % 7) WHEN 0 THEN f.s0 WHEN 1 THEN f.s1 WHEN 2 THEN f.s2 WHEN 3 THEN f.s3 WHEN 4 THEN f.s4 WHEN 5 THEN f.s5 WHEN 6 THEN f.s6 END, 6) AS forecast_7,
  round(f.s0, 6) AS s0, round(f.s1, 6) AS s1, round(f.s2, 6) AS s2, round(f.s3, 6) AS s3, round(f.s4, 6) AS s4, round(f.s5, 6) AS s5, round(f.s6, 6) AS s6
FROM hwfinal f
UNION ALL
SELECT event_type, CAST(max(n) AS BIGINT) AS days,
  NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
FROM hword WHERE n < 14 GROUP BY event_type"""


    # Heaps-law vocabulary growth: first-seen doc rides min(doc_id) on
    # the vocabulary aggregate; log-log OLS over per-doc (N, V) points
    q["text_heaps_law"] = """
WITH htoks AS (
  SELECT doc_id, unnest(string_split(
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
hpd AS (SELECT doc_id, count(*) AS n_toks FROM htoks GROUP BY 1),
hfs AS (SELECT token, min(doc_id) AS fd FROM htoks GROUP BY 1),
hnt AS (SELECT fd AS doc_id, count(*) AS new_types FROM hfs GROUP BY 1),
hbase AS (
  SELECT p.doc_id, p.n_toks, coalesce(n.new_types, 0) AS new_types
  FROM hpd p LEFT JOIN hnt n ON p.doc_id = n.doc_id
),
hcum AS (
  SELECT doc_id,
    sum(CAST(n_toks AS HUGEINT)) OVER w AS n_cum,
    sum(CAST(new_types AS HUGEINT)) OVER w AS v_cum
  FROM hbase
  WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
),
hpts AS (
  SELECT ln(CAST(n_cum AS DOUBLE)) AS x, ln(CAST(v_cum AS DOUBLE)) AS y
  FROM hcum WHERE n_cum > 0 AND v_cum > 0
),
hm AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM hpts
),
htot AS (
  SELECT count(*) AS n_docs, max(n_cum) AS total_tokens,
    max(v_cum) AS vocab
  FROM hcum
),
hf AS (
  SELECT *, CAST(n AS DOUBLE) AS nn,
    CAST(n AS DOUBLE) * sxx - sx * sx AS sxx_c,
    CAST(n AS DOUBLE) * syy - sy * sy AS syy_c,
    CAST(n AS DOUBLE) * sxy - sx * sy AS sxy_c
  FROM hm
),
hg AS (
  SELECT *, CASE WHEN sxx_c > 0 THEN sxy_c / sxx_c END AS beta
  FROM hf
)
SELECT CAST(t.n_docs AS BIGINT) AS n_docs,
  CAST(t.total_tokens AS BIGINT) AS total_tokens,
  CAST(t.vocab AS BIGINT) AS vocab,
  round(g.beta, 6) AS beta,
  round(exp((g.sy - g.beta * g.sx) / g.nn), 6) AS k,
  round(CASE WHEN g.sxx_c > 0 AND g.syy_c > 0
    THEN g.sxy_c * g.sxy_c / (g.sxx_c * g.syy_c) END, 6) AS r2
FROM hg g, htot t"""


    # Shewhart individuals chart: moving-range sigma (d2 = 1.128),
    # rule-1 limit breaches + rule-4 eight-in-a-row runs
    q["events_spc_chart"] = """
WITH cdaily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
cmr AS (
  SELECT *, abs(CAST(c AS HUGEINT) - lag(CAST(c AS HUGEINT))
    OVER (PARTITION BY event_type ORDER BY day)) AS mr
  FROM cdaily
),
cstats AS (
  SELECT event_type,
    CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE) / count(*) AS center,
    CASE WHEN count(mr) > 0 THEN
      CAST(sum(mr) AS DOUBLE) / count(mr) / 1.128 END AS sigma_hat
  FROM cmr GROUP BY 1
),
cflag AS (
  SELECT m.event_type, m.day, m.c, s.center,
    s.center + 3.0 * s.sigma_hat AS ucl,
    s.center - 3.0 * s.sigma_hat AS lcl,
    CASE WHEN m.c > s.center THEN 1
         WHEN m.c < s.center THEN -1 ELSE 0 END AS side
  FROM cmr m JOIN cstats s ON m.event_type = s.event_type
)
SELECT event_type, day, CAST(c AS BIGINT) AS value,
  round(center, 6) AS center, round(ucl, 6) AS ucl,
  round(lcl, 6) AS lcl,
  (c > ucl OR c < lcl) AS beyond_limits,
  (count(*) OVER w8 = 8 AND abs(sum(side) OVER w8) = 8) AS run_flag
FROM cflag
WINDOW w8 AS (PARTITION BY event_type ORDER BY day
  ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)"""


    # exponential retention decay: log-linear OLS over the cohort
    # triangle's (offset >= 1, active > 0) cells
    q["events_retention_halflife"] = """
WITH rfirst AS (
  SELECT user_id,
    min(CAST(floor(epoch(ts) / 604800) AS BIGINT)) AS cohort_week
  FROM events GROUP BY user_id
),
ractive AS (
  SELECT DISTINCT user_id,
    CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
  FROM events
),
rsizes AS (
  SELECT cohort_week, count(*) AS cohort_users FROM rfirst GROUP BY 1
),
rcells AS (
  SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
    count(DISTINCT a.user_id) AS active_users
  FROM ractive a JOIN rfirst f ON a.user_id = f.user_id
  GROUP BY 1, 2
),
rpts AS (
  SELECT CAST(week_offset AS DOUBLE) AS x,
    ln(CAST(active_users AS DOUBLE) / CAST(s.cohort_users AS DOUBLE))
      AS y
  FROM rcells c JOIN rsizes s ON c.cohort_week = s.cohort_week
  WHERE c.week_offset >= 1 AND c.active_users > 0
),
rm AS (
  SELECT count(*) AS n_points, sum(x) AS sx, sum(y) AS sy,
    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM rpts
),
rf AS (
  SELECT *, CAST(n_points AS DOUBLE) AS n,
    CAST(n_points AS DOUBLE) * sxx - sx * sx AS sxx_c,
    CAST(n_points AS DOUBLE) * syy - sy * sy AS syy_c,
    CAST(n_points AS DOUBLE) * sxy - sx * sy AS sxy_c
  FROM rm
),
rg AS (
  SELECT *, CASE WHEN sxx_c > 0 THEN sxy_c / sxx_c END AS slope
  FROM rf
)
SELECT CAST(n_points AS BIGINT) AS n_points,
  round(-slope, 6) + 0.0 AS lambda_hat,
  round(CASE WHEN -slope > 0 THEN 0.6931471805599453 / (-slope) END, 6)
    AS half_life_weeks,
  round(exp((sy - slope * sx) / n), 6) AS r0,
  round(CASE WHEN sxx_c > 0 AND syy_c > 0
    THEN sxy_c * sxy_c / (sxx_c * syy_c) END, 6) AS r2
FROM rg"""

    # r11 rank/nonparametric inference wave. Determinism: exact integer
    # concordance/tie/rank masses everywhere, each double derived once
    # (fixed op order both engines), per-cell/per-term round-6 before
    # any DECIMAL sum.
    q["events_kendall_tau"] = """
WITH kt_daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
kt_series AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
    a.c AS x, b.c AS y
  FROM kt_daily a JOIN kt_daily b
    ON a.day = b.day AND a.event_type < b.event_type
),
kt_pairs AS (
  SELECT i.type_a, i.type_b, i.day AS di,
    i.x AS xi, i.y AS yi, j.x AS xj, j.y AS yj
  FROM kt_series i JOIN kt_series j
    ON i.type_a = j.type_a AND i.type_b = j.type_b AND i.day < j.day
),
kt_agg AS (
  SELECT type_a, type_b, count(*) AS n0,
    sum(CASE WHEN (xi > xj AND yi > yj) OR (xi < xj AND yi < yj)
      THEN 1 ELSE 0 END) AS concordant,
    sum(CASE WHEN (xi > xj AND yi < yj) OR (xi < xj AND yi > yj)
      THEN 1 ELSE 0 END) AS discordant,
    sum(CASE WHEN xi = xj THEN 1 ELSE 0 END) AS tx,
    sum(CASE WHEN yi = yj THEN 1 ELSE 0 END) AS ty,
    count(DISTINCT di) + 1 AS n_days
  FROM kt_pairs GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n_days AS BIGINT) AS n_days,
  CAST(concordant AS BIGINT) AS concordant,
  CAST(discordant AS BIGINT) AS discordant,
  round(CASE WHEN (n0 - tx) * (n0 - ty) > 0
    THEN CAST(concordant - discordant AS DOUBLE)
      / sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE)) END, 6) AS tau_b
FROM kt_agg"""

    # r14: Cliff's delta — exact integer GT/LT pair masses off the
    # same pooled distinct-value prefix sums as mann_whitney (HUGEINT
    # products mirror Spark's DECIMAL(38,0)); δ divides once (round 6)
    q["events_cliffs_delta"] = """
WITH cd_vals AS (
  SELECT event_type, value, count(*) AS cnt FROM events
  WHERE value IS NOT NULL GROUP BY 1, 2
),
cd_types AS (SELECT DISTINCT event_type FROM cd_vals),
cd_pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM cd_types a JOIN cd_types b ON a.event_type < b.event_type
),
cd_pooled AS (
  SELECT type_a, type_b, value,
    sum(cnt_a) AS cnt_a, sum(cnt_b) AS cnt_b
  FROM (
    SELECT p.type_a, p.type_b, v.value, v.cnt AS cnt_a, 0 AS cnt_b
    FROM cd_pairs p JOIN cd_vals v ON v.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, v.value, 0 AS cnt_a, v.cnt AS cnt_b
    FROM cd_pairs p JOIN cd_vals v ON v.event_type = p.type_b
  ) GROUP BY 1, 2, 3
),
cd_ranked AS (
  SELECT *,
    coalesce(sum(cnt_b) OVER (PARTITION BY type_a, type_b
      ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS cum_b_before,
    sum(cnt_b) OVER (PARTITION BY type_a, type_b) AS tot_b
  FROM cd_pooled
),
cd_agg AS (
  SELECT type_a, type_b,
    CAST(sum(cnt_a) AS BIGINT) AS n_a,
    CAST(sum(cnt_b) AS BIGINT) AS n_b,
    sum(CAST(cnt_a AS HUGEINT) * CAST(cum_b_before AS HUGEINT)) AS gt,
    sum(CAST(cnt_a AS HUGEINT)
      * CAST(tot_b - cum_b_before - cnt_b AS HUGEINT)) AS lt
  FROM cd_ranked GROUP BY 1, 2
)
SELECT type_a, type_b, n_a, n_b,
  round(CASE WHEN n_a > 0 AND n_b > 0
    THEN CAST(gt - lt AS DOUBLE)
      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END, 6)
    AS cliffs_delta
FROM cd_agg"""

    q["events_mann_whitney"] = """
WITH mw_vals AS (
  SELECT event_type, value, count(*) AS cnt FROM events
  WHERE value IS NOT NULL GROUP BY 1, 2
),
mw_types AS (SELECT DISTINCT event_type FROM mw_vals),
mw_pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM mw_types a JOIN mw_types b ON a.event_type < b.event_type
),
mw_pooled AS (
  SELECT type_a, type_b, value,
    sum(cnt_a) AS cnt_a, sum(cnt_b) AS cnt_b
  FROM (
    SELECT p.type_a, p.type_b, v.value, v.cnt AS cnt_a, 0 AS cnt_b
    FROM mw_pairs p JOIN mw_vals v ON v.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, v.value, 0 AS cnt_a, v.cnt AS cnt_b
    FROM mw_pairs p JOIN mw_vals v ON v.event_type = p.type_b
  ) GROUP BY 1, 2, 3
),
mw_ranked AS (
  SELECT *,
    coalesce(sum(cnt_a + cnt_b) OVER (PARTITION BY type_a, type_b
      ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS cum_before
  FROM mw_pooled
),
mw_agg AS (
  SELECT type_a, type_b,
    CAST(sum(cnt_a) AS BIGINT) AS n_a,
    CAST(sum(cnt_b) AS BIGINT) AS n_b,
    sum(CAST(cnt_a AS HUGEINT)
      * (2 * CAST(cum_before AS HUGEINT) + cnt_a + cnt_b + 1)) AS two_ra,
    sum(CAST(cnt_a + cnt_b AS HUGEINT) * CAST(cnt_a + cnt_b AS HUGEINT)
      * CAST(cnt_a + cnt_b AS HUGEINT)
      - CAST(cnt_a + cnt_b AS HUGEINT)) AS tie_mass
  FROM mw_ranked GROUP BY 1, 2
),
mw_z AS (
  SELECT type_a, type_b, n_a, n_b,
    CAST(two_ra AS DOUBLE) / 2.0 AS ra,
    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
    CAST(tie_mass AS DOUBLE) AS tm
  FROM mw_agg
)
SELECT type_a, type_b, n_a, n_b,
  round(ra - na * (na + 1.0) / 2.0, 6) AS u_a,
  round(CASE WHEN na * nb / 12.0
      * ((na + nb + 1.0) - tm / ((na + nb) * (na + nb - 1.0))) > 0
    THEN (ra - na * (na + 1.0) / 2.0 - na * nb / 2.0)
      / sqrt(na * nb / 12.0
        * ((na + nb + 1.0) - tm / ((na + nb) * (na + nb - 1.0))))
    END, 6) AS z
FROM mw_z"""

    q["events_runs_test"] = """
WITH rt_daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
rt_med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS med
  FROM rt_daily GROUP BY 1
),
rt_signs AS (
  SELECT d.event_type, d.day,
    CASE WHEN CAST(d.c AS DOUBLE) > m.med THEN 1 ELSE 0 END AS s
  FROM rt_daily d JOIN rt_med m ON d.event_type = m.event_type
  WHERE CAST(d.c AS DOUBLE) != m.med
),
rt_flips AS (
  SELECT event_type, s,
    CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day)
        IS NULL
      OR lag(s) OVER (PARTITION BY event_type ORDER BY day) = s
      THEN 0 ELSE 1 END AS flip
  FROM rt_signs
),
rt_agg AS (
  SELECT event_type, count(*) AS n_days, sum(s) AS n_above,
    sum(1 - s) AS n_below, sum(flip) + 1 AS runs
  FROM rt_flips GROUP BY 1
),
rt_z AS (
  SELECT event_type, n_days, n_above, n_below, runs,
    CAST(n_above AS DOUBLE) AS n1, CAST(n_below AS DOUBLE) AS n2
  FROM rt_agg
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
  CAST(n_above AS BIGINT) AS n_above,
  CAST(n_below AS BIGINT) AS n_below,
  CAST(runs AS BIGINT) AS runs,
  round(CASE WHEN n_above > 0 AND n_below > 0
      AND 2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
        / ((n1 + n2) * (n1 + n2) * ((n1 + n2) - 1.0)) > 0
    THEN (CAST(runs AS DOUBLE)
        - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
      / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
        / ((n1 + n2) * (n1 + n2) * ((n1 + n2) - 1.0)))
    END, 6) AS z
FROM rt_z"""

    q["events_chi2_dow"] = """
WITH cd_cells AS (
  SELECT event_type,
    (CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7 AS dow,
    count(*) AS o
  FROM events GROUP BY 1, 2
),
cd_rt AS (SELECT event_type, sum(o) AS row_tot FROM cd_cells GROUP BY 1),
cd_ct AS (SELECT dow, sum(o) AS col_tot FROM cd_cells GROUP BY 1),
cd_tot AS (SELECT sum(o) AS n_tot FROM cd_cells),
cd_terms AS (
  -- FULL r x c grid: zero-observed cells still contribute (0-e)^2/e
  SELECT t.n_tot, r.event_type, l.dow,
    round((CAST(coalesce(c.o, 0) AS DOUBLE)
        - CAST(r.row_tot AS DOUBLE) * CAST(l.col_tot AS DOUBLE)
          / CAST(t.n_tot AS DOUBLE))
      * (CAST(coalesce(c.o, 0) AS DOUBLE)
        - CAST(r.row_tot AS DOUBLE) * CAST(l.col_tot AS DOUBLE)
          / CAST(t.n_tot AS DOUBLE))
      / (CAST(r.row_tot AS DOUBLE) * CAST(l.col_tot AS DOUBLE)
          / CAST(t.n_tot AS DOUBLE)), 6) AS term
  FROM cd_rt r
  CROSS JOIN cd_ct l
  LEFT JOIN cd_cells c
    ON c.event_type = r.event_type AND c.dow = l.dow
  CROSS JOIN cd_tot t
),
cd_agg AS (
  SELECT n_tot, count(DISTINCT event_type) AS n_types,
    count(DISTINCT dow) AS n_dows,
    CAST(sum(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS chi2
  FROM cd_terms GROUP BY 1
)
SELECT CAST(n_tot AS BIGINT) AS n,
  CAST(n_types AS BIGINT) AS n_types,
  CAST(n_dows AS BIGINT) AS n_dows,
  round(chi2, 6) AS chi2,
  CAST((n_types - 1) * (n_dows - 1) AS BIGINT) AS dof,
  round(CASE WHEN least(n_types, n_dows) - 1 > 0
    THEN sqrt(chi2 / (CAST(n_tot AS DOUBLE)
      * (least(n_types, n_dows) - 1))) END, 6) AS cramers_v
FROM cd_agg"""

    # r11: two-sample KS — D found as an exact integer max of
    # |cum_a*n_b - cum_b*n_a|, divided once at the end
    q["events_ks_test"] = """
WITH ks_vals AS (
  SELECT event_type, value, count(*) AS cnt FROM events
  WHERE value IS NOT NULL GROUP BY 1, 2
),
ks_types AS (SELECT DISTINCT event_type FROM ks_vals),
ks_pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM ks_types a JOIN ks_types b ON a.event_type < b.event_type
),
ks_pooled AS (
  SELECT type_a, type_b, value,
    sum(cnt_a) AS cnt_a, sum(cnt_b) AS cnt_b
  FROM (
    SELECT p.type_a, p.type_b, v.value, v.cnt AS cnt_a, 0 AS cnt_b
    FROM ks_pairs p JOIN ks_vals v ON v.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, v.value, 0 AS cnt_a, v.cnt AS cnt_b
    FROM ks_pairs p JOIN ks_vals v ON v.event_type = p.type_b
  ) GROUP BY 1, 2, 3
),
ks_tot AS (
  SELECT type_a, type_b, CAST(sum(cnt_a) AS BIGINT) AS n_a,
    CAST(sum(cnt_b) AS BIGINT) AS n_b
  FROM ks_pooled GROUP BY 1, 2
),
ks_cum AS (
  SELECT type_a, type_b,
    sum(cnt_a) OVER (PARTITION BY type_a, type_b ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
    sum(cnt_b) OVER (PARTITION BY type_a, type_b ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM ks_pooled
),
ks_agg AS (
  SELECT c.type_a, c.type_b, t.n_a, t.n_b,
    max(abs(CAST(c.cum_a AS HUGEINT) * t.n_b - CAST(c.cum_b AS HUGEINT) * t.n_a)) AS num_max
  FROM ks_cum c JOIN ks_tot t
    ON c.type_a = t.type_a AND c.type_b = t.type_b
  GROUP BY 1, 2, 3, 4
)
SELECT type_a, type_b, n_a, n_b,
  round(CAST(num_max AS DOUBLE)
    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS d_stat,
  round(sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
    * (CAST(num_max AS DOUBLE)
      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6) AS d_scaled
FROM ks_agg"""

    # r11: PACF lags 1-3 via unrolled Durbin-Levinson — r_k from exact
    # integer co-moments expanded around the global mean, the phi
    # chain a fixed scalar tree (chained CTEs keep every double's
    # derivation identical to the Spark expression order)
    q["events_pacf"] = """
WITH pf_daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
pf_base AS (
  SELECT event_type, count(*) AS n_days,
    CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE) AS s,
    CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS DOUBLE) AS q
  FROM pf_daily GROUP BY 1
),
pf_pairs AS (
  SELECT x.event_type, l.lag, x.c AS xv, y.c AS yv
  FROM pf_daily x
  CROSS JOIN (SELECT unnest([1, 2, 3]) AS lag) l
  JOIN pf_daily y
    ON y.event_type = x.event_type AND x.day - l.lag = y.day
),
pf_lag AS (
  SELECT event_type, lag, count(*) AS m,
    CAST(sum(CAST(xv AS HUGEINT) * CAST(yv AS HUGEINT)) AS DOUBLE)
      AS p,
    CAST(sum(CAST(xv AS HUGEINT)) AS DOUBLE) AS h,
    CAST(sum(CAST(yv AS HUGEINT)) AS DOUBLE) AS t
  FROM pf_pairs GROUP BY 1, 2
),
pf_piv AS (
  SELECT event_type,
    max(CASE WHEN lag = 1 THEN m END) AS m1,
    max(CASE WHEN lag = 1 THEN p END) AS p1,
    max(CASE WHEN lag = 1 THEN h END) AS h1,
    max(CASE WHEN lag = 1 THEN t END) AS t1,
    max(CASE WHEN lag = 2 THEN m END) AS m2,
    max(CASE WHEN lag = 2 THEN p END) AS p2,
    max(CASE WHEN lag = 2 THEN h END) AS h2,
    max(CASE WHEN lag = 2 THEN t END) AS t2,
    max(CASE WHEN lag = 3 THEN m END) AS m3,
    max(CASE WHEN lag = 3 THEN p END) AS p3,
    max(CASE WHEN lag = 3 THEN h END) AS h3,
    max(CASE WHEN lag = 3 THEN t END) AS t3
  FROM pf_lag GROUP BY 1
),
pf_c AS (
  SELECT event_type, n_days, s, q,
    s / CAST(n_days AS DOUBLE) AS xb
  FROM pf_base
),
pf_c2 AS (
  SELECT *, q - CAST(n_days AS DOUBLE) * xb * xb AS den0 FROM pf_c
),
pf_rr AS (
  SELECT c.event_type, c.n_days,
    CASE WHEN c.den0 > 0 THEN (v.p1 - c.xb * (v.h1 + v.t1)
      + CAST(v.m1 AS DOUBLE) * c.xb * c.xb) / c.den0 END AS r1,
    CASE WHEN c.den0 > 0 THEN (v.p2 - c.xb * (v.h2 + v.t2)
      + CAST(v.m2 AS DOUBLE) * c.xb * c.xb) / c.den0 END AS r2,
    CASE WHEN c.den0 > 0 THEN (v.p3 - c.xb * (v.h3 + v.t3)
      + CAST(v.m3 AS DOUBLE) * c.xb * c.xb) / c.den0 END AS r3
  FROM pf_c2 c JOIN pf_piv v ON c.event_type = v.event_type
),
pf_phi AS (
  SELECT *, CASE WHEN 1.0 - r1 * r1 != 0
    THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS phi22
  FROM pf_rr
),
pf_phi2 AS (SELECT *, r1 - phi22 * r1 AS phi21 FROM pf_phi)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
  round(r1, 6) AS r1, round(r2, 6) AS r2, round(r3, 6) AS r3,
  round(r1, 6) AS pacf1, round(phi22, 6) AS pacf2,
  round(CASE WHEN 1.0 - phi21 * r1 - phi22 * r2 != 0
    THEN (r3 - phi21 * r2 - phi22 * r1)
      / (1.0 - phi21 * r1 - phi22 * r2) END, 6) AS pacf3
FROM pf_phi2"""

    # r11: BH-FDR daily anomaly discoveries — robust z from exact
    # interpolated med/MAD, p via the fixed A&S 7.1.26 erf polynomial
    # (identical expression tree both engines), BH rank ordered by
    # (p, type, day) — a total order, ranks cannot drift
    q["events_fdr_anomalies"] = """
WITH fd_daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
fd_med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS med
  FROM fd_daily GROUP BY 1
),
fd_dev AS (
  SELECT d.event_type, d.day, d.c, m.med,
    abs(CAST(d.c AS DOUBLE) - m.med) AS adev
  FROM fd_daily d JOIN fd_med m ON d.event_type = m.event_type
),
fd_mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM fd_dev GROUP BY 1
),
fd_z AS (
  SELECT v.event_type, v.day, v.c,
    0.6745 * (CAST(v.c AS DOUBLE) - v.med) / a.mad AS z
  FROM fd_dev v JOIN fd_mad a ON v.event_type = a.event_type
  WHERE a.mad > 0
),
fd_t AS (
  SELECT *, 1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2))) AS t
  FROM fd_z
),
fd_p AS (
  SELECT event_type, day, c, z,
    (t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
      + t * (-1.453152027 + t * 1.061405429)))))
      * exp(-((abs(z) / sqrt(2)) * (abs(z) / sqrt(2)))) AS p
  FROM fd_t
),
fd_m AS (SELECT count(*) AS m FROM fd_p),
fd_rank AS (
  SELECT f.*, m.m,
    row_number() OVER (ORDER BY p, event_type, day) AS rank
  FROM fd_p f CROSS JOIN fd_m m
),
fd_pass AS (
  SELECT *,
    (p <= CAST(rank AS DOUBLE) * 0.05 / CAST(m AS DOUBLE)) AS bh_pass
  FROM fd_rank
),
fd_k AS (
  SELECT coalesce(max(CASE WHEN bh_pass THEN rank END), 0) AS k_star
  FROM fd_pass
)
SELECT r.event_type, r.day, CAST(r.c AS BIGINT) AS c,
  round(r.z, 6) AS z, round(r.p, 6) AS p_value,
  CAST(r.rank AS BIGINT) AS rank, CAST(r.m AS BIGINT) AS m_tests,
  (r.rank <= k.k_star) AS significant
FROM fd_pass r CROSS JOIN fd_k k"""

    # r11: value-drift batch twin — per-type KS of the event_id%5==0
    # slice vs the rest; same exact-integer D as events_ks_test
    q["events_ks_drift"] = """
WITH vd_vals AS (
  SELECT event_id, event_type, value FROM events
  WHERE value IS NOT NULL
),
vd_pooled AS (
  SELECT event_type, value,
    sum(cnt_b) AS cnt_b, sum(cnt_l) AS cnt_l
  FROM (
    SELECT event_type, value, count(*) AS cnt_b, 0 AS cnt_l
    FROM vd_vals WHERE event_id % 5 = 0 GROUP BY 1, 2
    UNION ALL
    SELECT event_type, value, 0 AS cnt_b, count(*) AS cnt_l
    FROM vd_vals WHERE event_id % 5 != 0 GROUP BY 1, 2
  ) GROUP BY 1, 2
),
vd_tot AS (
  SELECT event_type, CAST(sum(cnt_b) AS BIGINT) AS n_batch,
    CAST(sum(cnt_l) AS BIGINT) AS n_lifetime
  FROM vd_pooled GROUP BY 1
  HAVING sum(cnt_b) > 0 AND sum(cnt_l) > 0
),
vd_cum AS (
  SELECT event_type,
    sum(cnt_b) OVER (PARTITION BY event_type ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
    sum(cnt_l) OVER (PARTITION BY event_type ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_l
  FROM vd_pooled
),
vd_agg AS (
  SELECT c.event_type, t.n_batch, t.n_lifetime,
    max(abs(CAST(c.cum_b AS HUGEINT) * t.n_lifetime - CAST(c.cum_l AS HUGEINT) * t.n_batch)) AS num_max
  FROM vd_cum c JOIN vd_tot t ON c.event_type = t.event_type
  GROUP BY 1, 2, 3
)
SELECT event_type, n_batch, n_lifetime,
  round(CAST(num_max AS DOUBLE)
    / (CAST(n_batch AS DOUBLE) * CAST(n_lifetime AS DOUBLE)), 6)
    AS d_stat,
  round(sqrt(CAST(n_batch AS DOUBLE) * CAST(n_lifetime AS DOUBLE)
      / (CAST(n_batch AS DOUBLE) + CAST(n_lifetime AS DOUBLE)))
    * (CAST(num_max AS DOUBLE)
      / (CAST(n_batch AS DOUBLE) * CAST(n_lifetime AS DOUBLE))), 6)
    AS d_scaled,
  (sqrt(CAST(n_batch AS DOUBLE) * CAST(n_lifetime AS DOUBLE)
      / (CAST(n_batch AS DOUBLE) + CAST(n_lifetime AS DOUBLE)))
    * (CAST(num_max AS DOUBLE)
      / (CAST(n_batch AS DOUBLE) * CAST(n_lifetime AS DOUBLE))))
    > 1.358 AS alert
FROM vd_agg"""

    # r11: pairwise source JSD — shared-token terms round-6 before the
    # DECIMAL sum; non-shared mass contributes 0.5*ln2*(1 - Sp_shared)
    # per side, Sp from exact integer sums divided once
    q["text_source_jsd"] = """
WITH sj_toks AS (
  SELECT source, unnest(string_split(
    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
sj_st AS (
  SELECT source, token, count(*) AS cnt FROM sj_toks GROUP BY 1, 2
),
sj_tot AS (SELECT source, sum(cnt) AS tot FROM sj_st GROUP BY 1),
sj_shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
    count(*) AS shared_tokens,
    CAST(sum(CAST(round(0.5 * (
      CAST(a.cnt AS DOUBLE) / CAST(ta.tot AS DOUBLE)
        * ln((CAST(a.cnt AS DOUBLE) / CAST(ta.tot AS DOUBLE))
          / ((CAST(a.cnt AS DOUBLE) / CAST(ta.tot AS DOUBLE)
            + CAST(b.cnt AS DOUBLE) / CAST(tb.tot AS DOUBLE)) / 2.0))
      + CAST(b.cnt AS DOUBLE) / CAST(tb.tot AS DOUBLE)
        * ln((CAST(b.cnt AS DOUBLE) / CAST(tb.tot AS DOUBLE))
          / ((CAST(a.cnt AS DOUBLE) / CAST(ta.tot AS DOUBLE)
            + CAST(b.cnt AS DOUBLE) / CAST(tb.tot AS DOUBLE)) / 2.0))
    ), 6) AS DECIMAL(38,6))) AS DOUBLE) AS jsd_shared,
    sum(a.cnt) AS shared_cnt_a, sum(b.cnt) AS shared_cnt_b
  FROM sj_st a JOIN sj_st b ON a.token = b.token AND a.source < b.source
  JOIN sj_tot ta ON ta.source = a.source
  JOIN sj_tot tb ON tb.source = b.source
  GROUP BY 1, 2
),
sj_pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
    a.tot AS tot_a, b.tot AS tot_b
  FROM sj_tot a JOIN sj_tot b ON a.source < b.source
)
SELECT p.source_a, p.source_b,
  CAST(coalesce(s.shared_tokens, 0) AS BIGINT) AS shared_tokens,
  round(coalesce(s.jsd_shared, 0.0)
    + round(0.5 * ln(2) * (
        CAST(p.tot_a - coalesce(s.shared_cnt_a, 0) AS DOUBLE)
          / CAST(p.tot_a AS DOUBLE)
      + CAST(p.tot_b - coalesce(s.shared_cnt_b, 0) AS DOUBLE)
          / CAST(p.tot_b AS DOUBLE)), 6), 6) AS jsd
FROM sj_pairs p LEFT JOIN sj_shared s
  ON p.source_a = s.source_a AND p.source_b = s.source_b"""

    # --- r11 wave 4 ---

    # Kruskal–Wallis H: pooled midranks over the global distinct-value
    # grain (exact integer prefix sums), per-group R²/n rounded to 6
    # BEFORE the DECIMAL(38,6) cross-group sum (order-independent), H
    # and the tie-corrected H/C divide once at the end
    q["events_kruskal_wallis"] = """
WITH kw_vals AS (
  SELECT event_type, value, count(*) AS cnt FROM events
  WHERE value IS NOT NULL GROUP BY 1, 2
),
kw_totals AS (
  SELECT value, CAST(sum(cnt) AS BIGINT) AS t FROM kw_vals GROUP BY 1
),
kw_cum AS (
  SELECT value, t,
    coalesce(sum(t) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS cum_before
  FROM kw_totals
),
kw_group AS (
  SELECT v.event_type,
    CAST(sum(v.cnt) AS BIGINT) AS n_i,
    sum(CAST(v.cnt AS HUGEINT)
      * (2 * CAST(c.cum_before AS HUGEINT) + CAST(c.t AS HUGEINT) + 1))
      AS two_r
  FROM kw_vals v JOIN kw_cum c ON v.value = c.value
  GROUP BY 1
),
kw_g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
    CAST(sum(n_i) AS BIGINT) AS n_total,
    sum(CAST(round(CAST(two_r AS DOUBLE) / 2.0
      * (CAST(two_r AS DOUBLE) / 2.0) / CAST(n_i AS DOUBLE), 6)
      AS DECIMAL(38,6))) AS s_terms
  FROM kw_group
),
kw_ties AS (
  SELECT sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
    * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS tie_mass
  FROM kw_totals
)
SELECT n_groups, n_total,
  round(12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
      * CAST(s_terms AS DOUBLE)
    - 3.0 * (CAST(n_total AS DOUBLE) + 1.0), 6) AS h,
  round(CASE WHEN 1.0 - CAST(tie_mass AS DOUBLE)
      / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
        * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)) > 0
    THEN (12.0 / (CAST(n_total AS DOUBLE)
        * (CAST(n_total AS DOUBLE) + 1.0)) * CAST(s_terms AS DOUBLE)
      - 3.0 * (CAST(n_total AS DOUBLE) + 1.0))
      / (1.0 - CAST(tie_mass AS DOUBLE)
        / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
          * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)))
    END, 6) AS h_tie_corrected,
  CAST(n_groups - 1 AS BIGINT) AS df
FROM kw_g, kw_ties"""

    # Spearman rho per type pair: doubled midranks 2R = 2·rank() +
    # cnt − 1 stay integral, co-moments are exact HUGEINT sums, rho is
    # one double formula (round 6, NULL on constant series)
    q["events_spearman"] = """
WITH sp_daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
sp_series AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
    a.c AS x, b.c AS y
  FROM sp_daily a JOIN sp_daily b
    ON a.day = b.day AND a.event_type < b.event_type
),
sp_ranked AS (
  SELECT type_a, type_b,
    CAST(2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY x)
      + count(*) OVER (PARTITION BY type_a, type_b, x) - 1
      AS HUGEINT) AS rx,
    CAST(2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY y)
      + count(*) OVER (PARTITION BY type_a, type_b, y) - 1
      AS HUGEINT) AS ry
  FROM sp_series
),
sp_m AS (
  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(rx) AS DOUBLE) AS sx, CAST(sum(ry) AS DOUBLE) AS sy,
    CAST(sum(rx * ry) AS DOUBLE) AS sxy,
    CAST(sum(rx * rx) AS DOUBLE) AS sxx,
    CAST(sum(ry * ry) AS DOUBLE) AS syy
  FROM sp_ranked GROUP BY 1, 2
)
SELECT type_a, type_b, n_days,
  round(CASE WHEN (CAST(n_days AS DOUBLE) * sxx - sx * sx)
      * (CAST(n_days AS DOUBLE) * syy - sy * sy) > 0
    THEN (CAST(n_days AS DOUBLE) * sxy - sx * sy)
      / sqrt((CAST(n_days AS DOUBLE) * sxx - sx * sx)
        * (CAST(n_days AS DOUBLE) * syy - sy * sy))
    END, 6) AS rho
FROM sp_m"""

    # Ljung–Box Q per type: r_k from the pacf_daily exact co-moment
    # expansion, Q sums the 7 terms in a LITERAL left-associated chain
    # (identical IEEE evaluation both engines)
    _lb_piv = ", ".join(
        f"max(CASE WHEN lag = {k} THEN {c} END) AS {c}{k}"
        for k in range(1, 8)
        for c in ("m", "p", "h", "t")
    )
    _lb_rk = {
        k: (
            f"(CASE WHEN q - CAST(n_days AS DOUBLE) * (s / CAST(n_days"
            f" AS DOUBLE)) * (s / CAST(n_days AS DOUBLE)) > 0 THEN"
            f" (p{k} - (s / CAST(n_days AS DOUBLE)) * (h{k} + t{k})"
            f" + CAST(m{k} AS DOUBLE) * (s / CAST(n_days AS DOUBLE))"
            f" * (s / CAST(n_days AS DOUBLE)))"
            f" / (q - CAST(n_days AS DOUBLE) * (s / CAST(n_days"
            f" AS DOUBLE)) * (s / CAST(n_days AS DOUBLE))) END)"
        )
        for k in range(1, 8)
    }
    _lb_terms = " + ".join(
        f"{_lb_rk[k]} * {_lb_rk[k]} / (CAST(n_days AS DOUBLE)"
        f" - {float(k)})"
        for k in range(1, 8)
    )
    q["events_ljung_box"] = f"""
WITH lb_daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
lb_base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE) AS s,
    CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS DOUBLE) AS q
  FROM lb_daily GROUP BY 1
),
lb_pairs AS (
  SELECT x.event_type, l.lag, x.c AS x, y.c AS y
  FROM lb_daily x
  JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l ON true
  JOIN lb_daily y
    ON y.event_type = x.event_type AND y.day = x.day - l.lag
),
lb_lag AS (
  SELECT event_type, lag, count(*) AS m,
    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS p,
    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS h,
    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS t
  FROM lb_pairs GROUP BY 1, 2
),
lb_piv AS (
  SELECT event_type, {_lb_piv} FROM lb_lag GROUP BY 1
),
lb_j AS (SELECT * FROM lb_piv JOIN lb_base USING (event_type))
SELECT event_type, n_days,
  round(CASE WHEN n_days > 7
    THEN CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2.0)
      * ({_lb_terms}) END, 6) AS q_stat,
  CAST(7 AS BIGINT) AS df
FROM lb_j"""

    # eigenvector centrality: 8 UNNORMALIZED power-iteration rounds
    # unrolled (the pagerank recipe), ONE L1 normalization at the end
    # — matching the operator, which defers the norm to drop a
    # per-round materialization + scalar total. Per-round CTEs are
    # MATERIALIZED: inlining a twice-consumed CTE re-evaluates the
    # whole prefix chain per reference (measured 426 s at sf0.01 on
    # the normalize-per-round form; materialized: ~1 s). Round-6
    # grain in the registered query absorbs ~1e-13 double-sum drift.
    _ec_iters = "".join(
        f""",
x{i + 1} AS MATERIALIZED (
  SELECT d.dst AS part, sum(x{i}.score * d.weight) AS score
  FROM directed d JOIN x{i} ON d.src = x{i}.part GROUP BY d.dst
)"""
        for i in range(8)
    )
    q["graph_eigencentrality"] = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    count(*) AS weight
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
directed AS MATERIALIZED (
  SELECT part_a AS src, part_b AS dst, weight FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst, weight FROM pairs
),
nodes AS MATERIALIZED (SELECT DISTINCT src FROM directed),
nv AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
x0 AS (SELECT src AS part, 1.0 / (SELECT n FROM nv) AS score FROM nodes)
{_ec_iters},
l1 AS MATERIALIZED (SELECT sum(score) AS l1 FROM x8)
SELECT part, round(score / (SELECT l1 FROM l1), 6) AS score FROM x8"""

    # bounded connected components: 10 min-label flood rounds unrolled
    # (a flood round over a converged labeling is a no-op, so early
    # convergence is exact; Spark raises if round 10 still changed)
    _cc_parts = [
        "baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM "
        "lineitem)",
        "pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS "
        "part_b FROM baskets a JOIN baskets b ON a.l_orderkey = "
        "b.l_orderkey AND a.l_partkey < b.l_partkey GROUP BY 1, 2)",
        "directed AS MATERIALIZED (SELECT part_a AS src, part_b AS "
        "dst FROM pairs UNION ALL SELECT part_b AS src, part_a AS "
        "dst FROM pairs)",
        "l0 AS (SELECT DISTINCT src AS p, src AS lbl FROM directed)",
    ]
    for _i in range(1, 11):
        _cc_parts.append(
            f"l{_i} AS MATERIALIZED (SELECT p, min(lbl) AS lbl FROM ("
            f"SELECT p, lbl FROM l{_i - 1} UNION ALL "
            f"SELECT d.dst AS p, l.lbl FROM directed d "
            f"JOIN l{_i - 1} l ON d.src = l.p) GROUP BY p)"
        )
    q["graph_components_bounded"] = (
        "WITH "
        + ",\n".join(_cc_parts)
        + """
SELECT p AS part, CAST(lbl AS BIGINT) AS component FROM l10"""
    )

    # bounded large-star/small-star components (r13, VERDICT r12 next
    # #2): STAR_ROUNDS alternation rounds unrolled (shared constant,
    # ADVICE r13 #4) — a round over a converged star forest is the
    # identity, so early convergence is exact; Spark raises if the
    # last round still changed the oriented set. Every CTE consumed
    # twice is MATERIALIZED (the eigencentrality lesson).
    _cs_parts = [
        "baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM "
        "lineitem)",
        "pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS "
        "part_b FROM baskets a JOIN baskets b ON a.l_orderkey = "
        "b.l_orderkey AND a.l_partkey < b.l_partkey GROUP BY 1, 2)",
        "verts AS MATERIALIZED (SELECT DISTINCT p FROM (SELECT "
        "part_a AS p FROM pairs UNION ALL SELECT part_b FROM pairs))",
        "e0 AS MATERIALIZED (SELECT DISTINCT greatest(part_a, part_b)"
        " AS big, least(part_a, part_b) AS small FROM pairs "
        "WHERE part_a <> part_b)",
    ]
    for _i in range(STAR_ROUNDS):
        _cs_parts.append(
            f"b{_i} AS MATERIALIZED (SELECT big AS ctr, small AS nb "
            f"FROM e{_i} UNION ALL SELECT small AS ctr, big AS nb "
            f"FROM e{_i})"
        )
        _cs_parts.append(
            f"m{_i} AS MATERIALIZED (SELECT ctr, "
            f"min(least(nb, ctr)) AS m FROM b{_i} GROUP BY ctr)"
        )
        _cs_parts.append(
            f"lg{_i} AS MATERIALIZED (SELECT DISTINCT nb AS big, "
            f"m AS small FROM b{_i} JOIN m{_i} USING (ctr) "
            f"WHERE nb > ctr AND nb <> m)"
        )
        _cs_parts.append(
            f"sm{_i} AS MATERIALIZED (SELECT big, min(small) AS m "
            f"FROM lg{_i} GROUP BY big)"
        )
        _cs_parts.append(
            f"e{_i + 1} AS MATERIALIZED (SELECT DISTINCT big, small "
            f"FROM (SELECT greatest(l.small, s.m) AS big, "
            f"least(l.small, s.m) AS small FROM lg{_i} l "
            f"JOIN sm{_i} s USING (big) WHERE l.small <> s.m "
            f"UNION ALL SELECT big, m AS small FROM sm{_i}) "
            f"WHERE big <> small)"
        )
    q["graph_components_star_bounded"] = (
        "WITH "
        + ",\n".join(_cs_parts)
        + f"""
SELECT v.p AS part, CAST(coalesce(c.small, v.p) AS BIGINT) AS component
FROM verts v LEFT JOIN e{STAR_ROUNDS} c ON v.p = c.big"""
    )

    # hard-negative mining: exact top-k cosine restricted to
    # different-label candidates (the ann_cosine_topk oracle plus the
    # label mask; NULL labels drop from both sides)
    q["emb_hard_negatives"] = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE label IS NOT NULL
),
queries AS (
  SELECT vec_id AS query_id, label AS q_label, emb AS q_emb
  FROM e WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, v.vec_id,
    round(list_cosine_similarity(q.q_emb, v.emb), 6) AS cosine
  FROM queries q, e v
  WHERE v.vec_id != q.query_id AND v.label != q.q_label
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""

    # --- r11 wave 5 ---

    # Friedman: complete day-blocks, doubled midranks within each day,
    # chi2 = (k-1)*Σ(2R_j - n(k+1))² / (Σ(2r)² - n·k·(k+1)²) — a ratio
    # of two exact integers, one double division
    q["events_friedman"] = """
WITH fr_daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
fr_k AS (SELECT count(DISTINCT event_type) AS k FROM fr_daily),
fr_per_day AS (SELECT day, count(*) AS nt FROM fr_daily GROUP BY 1),
fr_complete AS (
  SELECT d.day, d.event_type, d.c, kk.k
  FROM fr_daily d JOIN fr_per_day p USING (day), fr_k kk
  WHERE p.nt = kk.k
),
fr_ranked AS (
  SELECT day, event_type, k,
    CAST(2 * rank() OVER (PARTITION BY day ORDER BY c)
      + count(*) OVER (PARTITION BY day, c) - 1 AS HUGEINT) AS tr
  FROM fr_complete
),
fr_type AS (
  SELECT event_type, count(*) AS n, sum(tr) AS two_rj, max(k) AS k
  FROM fr_ranked GROUP BY 1
),
fr_num AS (
  SELECT sum((two_rj - CAST(n * (k + 1) AS HUGEINT))
      * (two_rj - CAST(n * (k + 1) AS HUGEINT))) AS s_num,
    CAST(max(n) AS BIGINT) AS n_days, CAST(max(k) AS BIGINT) AS k
  FROM fr_type
),
fr_den AS (SELECT sum(tr * tr) AS s2r FROM fr_ranked)
SELECT n_days, k,
  round(CASE WHEN CAST(s2r - CAST(n_days * k * (k + 1) * (k + 1)
      AS HUGEINT) AS DOUBLE) > 0
    THEN CAST(k - 1 AS DOUBLE) * CAST(s_num AS DOUBLE)
      / CAST(s2r - CAST(n_days * k * (k + 1) * (k + 1) AS HUGEINT)
        AS DOUBLE)
    END, 6) AS chi2,
  CAST(k - 1 AS BIGINT) AS df
FROM fr_num, fr_den"""

    # Welch's t per type pair: values are exact 2-decimal amounts, so
    # Σv / Σv² are exact DECIMAL sums; every double derives once from
    # them with the operator's token order
    _w_va = "(s2a - s1a * s1a / na) / (na - 1.0)"
    _w_vb = "(s2b - s1b * s1b / nb) / (nb - 1.0)"
    _w_se2 = f"({_w_va} / na + {_w_vb} / nb)"
    q["events_welch_t"] = f"""
WITH wt_base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
    CAST(sum(CAST(value AS DECIMAL(18,2))
      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
wt_pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    a.n AS n_a, b.n AS n_b,
    CAST(a.n AS DOUBLE) AS na, CAST(b.n AS DOUBLE) AS nb,
    a.s1 AS s1a, a.s2 AS s2a, b.s1 AS s1b, b.s2 AS s2b
  FROM wt_base a JOIN wt_base b ON a.event_type < b.event_type
)
SELECT type_a, type_b, n_a, n_b,
  round(s1a / na, 6) AS mean_a,
  round(s1b / nb, 6) AS mean_b,
  round(CASE WHEN n_a >= 2 AND n_b >= 2 AND {_w_se2} > 0
    THEN (s1a / na - s1b / nb) / sqrt({_w_se2}) END, 6) AS t_stat,
  round(CASE WHEN n_a >= 2 AND n_b >= 2 AND {_w_se2} > 0
    THEN ({_w_se2} * {_w_se2})
      / (({_w_va} / na) * ({_w_va} / na) / (na - 1.0)
        + ({_w_vb} / nb) * ({_w_vb} / nb) / (nb - 1.0))
    END, 6) AS df_welch
FROM wt_pairs"""

    # Horvitz–Thompson source-count estimate off the Madow PPS sample:
    # per-doc inverse-probability weights rounded-then-DECIMAL-summed;
    # unsampled sources report 0 honestly
    q["sampling_ht_estimate"] = """
WITH cum AS (
  SELECT doc_id, n_chars,
    sum(CAST(n_chars AS HUGEINT)) OVER (ORDER BY doc_id
      ROWS UNBOUNDED PRECEDING) AS cum,
    sum(CAST(n_chars AS HUGEINT)) OVER () AS w_total
  FROM documents
),
sel AS (
  SELECT *,
    ((400 * cum + w_total) // (2 * w_total))
      - ((400 * (cum - n_chars) + w_total) // (2 * w_total))
      AS multiplicity
  FROM cum
),
sam AS (
  SELECT s.doc_id, s.n_chars, s.multiplicity, s.w_total, d.source
  FROM sel s JOIN documents d USING (doc_id)
  WHERE s.multiplicity >= 1
),
est AS (
  SELECT source, CAST(sum(multiplicity) AS BIGINT) AS n_hits,
    CAST(sum(CAST(round(CAST(multiplicity AS DOUBLE)
      * CAST(w_total AS DOUBLE)
      / (200.0 * CAST(n_chars AS DOUBLE)), 6)
      AS DECIMAL(38,6))) AS DOUBLE) AS ht_sum
  FROM sam GROUP BY 1
),
tru AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
)
SELECT t.source,
  CAST(coalesce(e.n_hits, 0) AS BIGINT) AS n_hits,
  round(coalesce(e.ht_sum, 0.0), 6) AS ht_docs,
  t.n_docs,
  round(abs(coalesce(e.ht_sum, 0.0) - CAST(t.n_docs AS DOUBLE))
    / CAST(t.n_docs AS DOUBLE), 6) AS rel_err
FROM tru t LEFT JOIN est e ON t.source = e.source"""

    # triplet mining: hardest positive (same label, lowest cosine) +
    # hardest negative (different label, highest cosine) per probe
    q["emb_triplet_candidates"] = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE label IS NOT NULL
),
queries AS (
  SELECT vec_id AS query_id, label AS q_label, emb AS q_emb
  FROM e WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, v.vec_id,
    round(list_cosine_similarity(q.q_emb, v.emb), 6) AS cosine,
    v.label = q.q_label AS is_pos
  FROM queries q, e v WHERE v.vec_id != q.query_id
),
pos AS (
  SELECT query_id, vec_id AS pos_id, cosine AS pos_cosine,
    row_number() OVER (PARTITION BY query_id
      ORDER BY cosine ASC, vec_id ASC) AS rn
  FROM scored WHERE is_pos
),
neg AS (
  SELECT query_id, vec_id AS neg_id, cosine AS neg_cosine,
    row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM scored WHERE NOT is_pos
)
SELECT p.query_id, p.pos_id, p.pos_cosine, n.neg_id, n.neg_cosine,
  round(n.neg_cosine - p.pos_cosine, 6) AS margin,
  round(n.neg_cosine - p.pos_cosine, 6) > 0 AS violates
FROM pos p JOIN neg n ON p.query_id = n.query_id
WHERE p.rn = 1 AND n.rn = 1"""

    # Poisson index of dispersion per type: exact integer moments of
    # the daily counts, D = (n-1)·s²/x̄ one double expression
    q["events_poisson_dispersion"] = """
WITH pd_daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
pd_agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE) AS s1,
    CAST(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS DOUBLE) AS s2
  FROM pd_daily GROUP BY 1
)
SELECT event_type, n_days,
  round(s1 / CAST(n_days AS DOUBLE), 6) AS mean_daily,
  round(CASE WHEN n_days >= 2 AND s1 / CAST(n_days AS DOUBLE) > 0
    THEN ((s2 - CAST(n_days AS DOUBLE) * (s1 / CAST(n_days AS DOUBLE))
        * (s1 / CAST(n_days AS DOUBLE))) / (CAST(n_days AS DOUBLE) - 1.0))
      / (s1 / CAST(n_days AS DOUBLE)) END, 6) AS var_ratio,
  round(CASE WHEN n_days >= 2 AND s1 / CAST(n_days AS DOUBLE) > 0
    THEN (CAST(n_days AS DOUBLE) - 1.0)
      * ((s2 - CAST(n_days AS DOUBLE) * (s1 / CAST(n_days AS DOUBLE))
        * (s1 / CAST(n_days AS DOUBLE))) / (CAST(n_days AS DOUBLE) - 1.0))
      / (s1 / CAST(n_days AS DOUBLE)) END, 6) AS dispersion_d,
  CAST(n_days - 1 AS BIGINT) AS df
FROM pd_agg"""

    # leave-one-out kNN label audit: deterministic k=5 shortlist
    # (round-6 cosine, vec_id tie-break), vote argmax (votes DESC,
    # label ASC)
    q["emb_knn_label_audit"] = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE label IS NOT NULL
),
queries AS (
  SELECT vec_id AS query_id, label AS true_label, emb AS q_emb
  FROM e WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, v.vec_id, v.label,
    round(list_cosine_similarity(q.q_emb, v.emb), 6) AS cosine
  FROM queries q, e v WHERE v.vec_id != q.query_id
),
shortlist AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM scored
),
votes AS (
  SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
  FROM shortlist WHERE rn <= 5 GROUP BY 1, 2
),
pred AS (
  SELECT query_id, label AS predicted_label, votes,
    row_number() OVER (PARTITION BY query_id
      ORDER BY votes DESC, label ASC) AS vr
  FROM votes
)
SELECT p.query_id, CAST(q.true_label AS BIGINT) AS true_label,
  CAST(p.predicted_label AS BIGINT) AS predicted_label, p.votes,
  p.predicted_label = q.true_label AS correct
FROM pred p JOIN queries q ON p.query_id = q.query_id
WHERE p.vr = 1"""

    # --- r11 wave 7 ---

    # Markov steady state: 8 unrolled unnormalized power rounds over
    # the round-6 transition matrix, one final L1 normalization (the
    # eigencentrality recipe at alphabet² grain)
    _ms_iters = "".join(
        f""",
pi{i + 1} AS MATERIALIZED (
  SELECT t.to_type AS event_type, sum(pi{i}.pi * t.p) AS pi
  FROM trans t JOIN pi{i} ON t.from_type = pi{i}.event_type
  GROUP BY 1
)"""
        for i in range(8)
    )
    q["events_markov_steady_state"] = f"""
WITH bg AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS transitions
  FROM (
    SELECT event_type AS from_type,
      lead(event_type) OVER (PARTITION BY user_id
        ORDER BY ts, event_id) AS to_type
    FROM events
  )
  WHERE to_type IS NOT NULL
  GROUP BY 1, 2
),
tt AS (
  SELECT from_type, CAST(sum(transitions) AS BIGINT) AS n_from
  FROM bg GROUP BY 1
),
trans AS MATERIALIZED (
  SELECT bg.from_type, bg.to_type,
    round(CAST(bg.transitions AS DOUBLE) / tt.n_from, 6) AS p
  FROM bg JOIN tt ON bg.from_type = tt.from_type
),
states AS MATERIALIZED (
  SELECT from_type AS event_type FROM trans
  UNION
  SELECT to_type AS event_type FROM trans
),
nv AS (SELECT count(*) AS n FROM states),
pi0 AS (
  SELECT event_type, 1.0 / (SELECT n FROM nv) AS pi FROM states
)
{_ms_iters},
l1 AS MATERIALIZED (SELECT sum(pi) AS l1 FROM pi8)
SELECT event_type, round(pi / (SELECT l1 FROM l1), 6) AS pi FROM pi8"""

    # per-dimension embedding health: coordinates quantized to the
    # 2^-20 grid (floor(x*2^20) — power-of-two multiply is exact in
    # binary FP, bit-identical both engines; decimal round-6 is NOT:
    # Spark rounds the shortest decimal repr, DuckDB the binary double)
    q["emb_dim_stats"] = """
WITH e AS (
  SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
ex AS (
  SELECT o.ord - 1 AS dim, e.emb[o.ord] AS x
  FROM e, (SELECT unnest(generate_series(1, 64)) AS ord) o
),
agg AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(floor(x * 1048576.0) AS HUGEINT)) AS DOUBLE) AS s1,
    CAST(sum(CAST(floor(x * 1048576.0) AS HUGEINT)
      * CAST(floor(x * 1048576.0) AS HUGEINT)) AS DOUBLE) AS s2,
    CAST(sum(CASE WHEN x = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
    CAST(sum(CASE WHEN x < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
  FROM ex GROUP BY 1
)
SELECT CAST(dim AS BIGINT) AS dim, n,
  round(s1 / CAST(n AS DOUBLE) / 1048576.0, 6) AS mean,
  round((s2 - s1 * s1 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
    / 1099511627776.0, 6) AS variance,
  round(CAST(n_zero AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_zero,
  round(CAST(n_neg AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_negative
FROM agg"""

    # centroid-drift batch twin: batch = vec_id % 5 == 0 vs lifetime =
    # rest; centroid cosine from 2^-20-quantized exact integer sums
    # (the divisions cancel — scale invariance), one double at the end
    _cd_cos = (
        "CASE WHEN b2 > 0 AND l2 > 0 THEN CAST(dot AS DOUBLE)"
        " / (sqrt(CAST(b2 AS DOUBLE)) * sqrt(CAST(l2 AS DOUBLE))) END"
    )
    q["emb_centroid_drift"] = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
ex AS (
  SELECT vec_id, o.ord - 1 AS dim,
    CAST(floor(e.emb[o.ord] * 1048576.0) AS HUGEINT) AS q
  FROM e, (SELECT unnest(generate_series(1, 64)) AS ord) o
),
b AS (
  SELECT dim, sum(q) AS qb, count(*) AS nb
  FROM ex WHERE vec_id % 5 = 0 GROUP BY 1
),
l AS (
  SELECT dim, sum(q) AS ql, count(*) AS nl
  FROM ex WHERE vec_id % 5 != 0 GROUP BY 1
),
j AS (
  SELECT coalesce(b.qb, 0) AS qb, coalesce(l.ql, 0) AS ql, b.nb, l.nl
  FROM b FULL JOIN l ON b.dim = l.dim
),
agg AS (
  SELECT sum(qb * ql) AS dot, sum(qb * qb) AS b2, sum(ql * ql) AS l2,
    max(nb) AS n_batch, max(nl) AS n_lifetime
  FROM j
)
SELECT CAST(coalesce(n_batch, 0) AS BIGINT) AS n_batch,
  CAST(coalesce(n_lifetime, 0) AS BIGINT) AS n_lifetime,
  round({_cd_cos}, 6) AS cosine,
  round(1.0 - ({_cd_cos}), 6) AS cosine_shift,
  coalesce(round(1.0 - ({_cd_cos}), 6) > 0.02, false) AS alert
FROM agg"""

    # vector-norm health: per-vector squared norm is an exact BIGINT
    # over 2^-20-quantized coordinates (list fold — no unnest), mean
    # accumulates round-6 norms as exact DECIMALs
    q["emb_norm_profile"] = """
WITH e AS (
  SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
pv AS (
  SELECT sqrt(CAST(list_sum(list_transform(generate_series(1, 64),
    i -> CAST(floor(emb[i] * 1048576.0) AS BIGINT)
      * CAST(floor(emb[i] * 1048576.0) AS BIGINT))) AS DOUBLE)
    / 1099511627776.0) AS norm
  FROM e
)
SELECT CAST(count(*) AS BIGINT) AS n,
  round(CAST(sum(CAST(round(norm, 6) AS DECIMAL(38,6))) AS DOUBLE)
    / CAST(count(*) AS DOUBLE), 6) AS mean_norm,
  round(min(norm), 6) AS min_norm,
  round(max(norm), 6) AS max_norm,
  round(CAST(sum(CASE WHEN abs(norm - 1.0) > 0.01 THEN 1 ELSE 0 END)
    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS frac_unnormalized
FROM pv"""

    # Hill tail index of the co-purchase degree distribution — the
    # text_hill_tail_index recipe over vertex degrees
    q["graph_degree_tail"] = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
deg AS (
  SELECT p AS part, count(*) AS d FROM (
    SELECT part_a AS p FROM pairs
    UNION ALL SELECT part_b AS p FROM pairs
  ) GROUP BY 1
),
ranked AS (
  SELECT part, CAST(d AS BIGINT) AS x,
    row_number() OVER (ORDER BY d DESC, part ASC) AS rn
  FROM deg
),
xk1 AS (SELECT x AS d_tail FROM ranked WHERE rn = 101),
tot AS (SELECT sum(CAST(d AS BIGINT)) AS total_deg FROM deg),
agg AS (
  SELECT CAST(100 AS BIGINT) AS k,
    CAST(max(d_tail) AS BIGINT) AS d_tail,
    round(100.0 / sum(ln(CAST(x AS DOUBLE) / CAST(d_tail AS DOUBLE))),
      6) AS alpha,
    sum(x) AS topk_deg
  FROM ranked, xk1 WHERE rn <= 100
)
SELECT k, d_tail, alpha,
  round(topk_deg / CAST(total_deg AS DOUBLE), 6) AS tail_mass_frac
FROM agg, tot"""

    return q