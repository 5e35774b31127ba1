"""Deterministic sampling & document chunking for training-data pipelines
(BASELINE.json north star — dataset assembly ops beyond the reference).

Why hash-based instead of ``df.sample()``/``sampleBy()``: Spark's sampling
is seeded per partition, so the selected rows change whenever partitioning
changes (repartition, AQE, scale-up) — lethal for reproducible train/val
splits. Bucketing each row by an md5 of its key is stable across engines,
partitionings, and re-runs, and is a pure JVM narrow map: no shuffle, no
Python, pushdown-friendly. The same construction (salted md5 → integer)
powers the MinHash/SimHash/LSH family in `dedup.py:75`.

Chunking (fixed token windows with overlap) is the standard
context-window packing step; it's a JVM ``transform``+``explode`` fan-out
— output cardinality ≈ tokens/step per doc, still shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import spread

SPLIT_BUCKETS = 10_000
DEFAULT_WEIGHTS = {"train": 0.90, "val": 0.05, "test": 0.05}
CHUNK_TOKENS = 64
CHUNK_OVERLAP = 8


def hash_bucket(col: Column, salt: str, buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): md5 of ``salt:value``, first
    15 hex chars (60 bits — exact in a signed long) mod buckets."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(buckets),
    )


def split_expr(
    bucket: Column, weights: dict[str, float] | None = None
) -> Column:
    """Named-split expression over a hash bucket: cumulative integer
    thresholds over SPLIT_BUCKETS, so proportions are exact in
    expectation and assignment is reproducible everywhere."""
    weights = weights or DEFAULT_WEIGHTS
    expr = None
    acc = 0
    *head, (last_name, _) = list(weights.items())
    for name, w in head:
        acc += int(w * SPLIT_BUCKETS)
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return F.lit(last_name) if expr is None else expr.otherwise(last_name)


def deterministic_split(
    documents: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every doc to a named split by hash bucket."""
    bucket = hash_bucket(F.col("doc_id"), salt)
    return spread(documents).select(
        "doc_id", bucket.alias("bucket"), split_expr(bucket, weights).alias("split")
    )


def stratified_sample(
    documents: DataFrame,
    fraction: float = 0.2,
    salt: str = "strat",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of docs. The hash is keyed by
    doc_id only, so the same doc is kept or dropped regardless of which
    stratum (lang/source) it is viewed under — per-stratum rates converge
    to ``fraction`` while membership stays reproducible."""
    bucket = hash_bucket(F.col("doc_id"), salt)
    return (
        spread(documents)
        .select("doc_id", "lang", "source", bucket.alias("bucket"))
        .filter(F.col("bucket") < int(fraction * SPLIT_BUCKETS))
    )


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Fixed-size token windows with overlap: doc_id, chunk_id, n_tokens,
    chunk_text, chunk_md5. The last window may be short; every token is
    covered; consecutive windows share ``overlap`` tokens."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    # token array projected once per row (r15, guide §4.1 — see
    # text.repetition_stats: a captured expression inside the slice
    # lambda is re-evaluated per chunk slot)
    toks = F.col("__toks")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - chunk_tokens) / F.lit(step)).cast("long") + 1
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks.cast("int") - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.array_join(
                    F.slice(toks, i * step + 1, chunk_tokens), " "
                ).alias("chunk_text"),
            ),
        )
    )
    return (
        spread(documents)
        .select(
            "doc_id",
            F.split(F.trim(F.col("text")), r"\s+").alias("__toks"),
        )
        .select("doc_id", chunk.alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.size(F.split(F.col("c.chunk_text"), " ")).cast("long").alias(
                "n_tokens"
            ),
            F.col("c.chunk_text").alias("chunk_text"),
            F.md5(F.col("c.chunk_text")).alias("chunk_md5"),
        )
    )


PACK_BUDGET = 256


def pack_sequences(
    chunks: DataFrame,
    budget_tokens: int = PACK_BUDGET,
    group_col: str = "doc_id",
) -> DataFrame:
    """Next-fit sequence packing: assign chunks, in deterministic
    (doc_id, chunk_id) order within each group, to consecutive bins of at
    most ``budget_tokens`` (a chunk never spans bins; a chunk larger than
    the budget gets its own bin). Output: group, bin_id, doc_id, chunk_id,
    n_tokens, bin_fill.

    Next-fit is inherently sequential — the bin boundary depends on every
    predecessor — but "sequential within a bounded group" does not need
    Python: the group's chunk list is collected to an array (the same
    whole-group-in-memory contract the previous ``applyInPandas`` form
    had) and folded with a higher-order ``aggregate``, entirely JVM-side.
    The rewrite exists because the Pandas form paid a per-GROUP Python
    round-trip — ~13 s for 5k tiny doc-grain groups at sf0.1, vs <1 s
    for the fold (python-reference parity unchanged, tested). At 100 TB:
    group by shard/source, not doc, so bins amortize across documents —
    group size, not group count, is the memory bound either way."""
    b = int(budget_tokens)
    # sort_array orders the (doc_id, chunk_id, n_tokens) structs
    # lexicographically by field order = the (doc_id, chunk_id) sort the
    # pandas form used. The fold appends (bin_id, bin_fill) per element;
    # the O(n²) array append is bounded by group size (the contract).
    over = f"acc.fill > 0 AND acc.fill + c.n_tokens > {b}"
    fold = f"""
aggregate(
  cs,
  named_struct(
    'bin', cast(0 as bigint), 'fill', cast(0 as bigint),
    'out', cast(array() as array<struct<bin_id: bigint, bin_fill: bigint>>)),
  (acc, c) -> named_struct(
    'bin',  CASE WHEN {over} THEN acc.bin + 1 ELSE acc.bin END,
    'fill', CASE WHEN {over} THEN cast(c.n_tokens as bigint)
            ELSE acc.fill + c.n_tokens END,
    'out', acc.out || array(named_struct(
      'bin_id',  CASE WHEN {over} THEN acc.bin + 1 ELSE acc.bin END,
      'bin_fill', CASE WHEN {over} THEN cast(c.n_tokens as bigint)
                  ELSE acc.fill + c.n_tokens END))),
  acc -> acc.out)"""
    return (
        chunks.groupBy(F.col(group_col).cast("string").alias("group"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "chunk_id", "n_tokens"))
            ).alias("cs")
        )
        .withColumn("out", F.expr(fold))
        .select("group", F.explode(F.arrays_zip("cs", "out")).alias("e"))
        .select(
            "group",
            F.col("e.out.bin_id").alias("bin_id"),
            F.col("e.cs.doc_id").alias("doc_id"),
            F.col("e.cs.chunk_id").alias("chunk_id"),
            F.col("e.cs.n_tokens").alias("n_tokens"),
            F.col("e.out.bin_fill").alias("bin_fill"),
        )
    )


# Source-mixing policy for the registered `sampling_source_mix` query:
# explicit per-source acceptance rates with a default — the "recipe"
# of a training-data mix (downsample crawl-heavy sources, keep curated
# ones whole). Rates are exact rationals over SPLIT_BUCKETS so the
# hash-threshold comparison is integer-exact in every engine.
MIX_RATES: dict[str, float] = {
    "src0": 1.0,
    "src1": 0.5,
    "src2": 0.25,
    "src3": 0.1,
}
MIX_DEFAULT_RATE = 0.75
MIX_SALT = "mix"


def _mix_rate_col() -> Column:
    expr = None
    for name, rate in MIX_RATES.items():
        cond = F.col("source") == name
        expr = F.when(cond, rate) if expr is None else expr.when(cond, rate)
    return expr.otherwise(MIX_DEFAULT_RATE)


def _mix_threshold_col() -> Column:
    """Integer acceptance threshold per source, computed ONCE in Python
    (``round(rate × SPLIT_BUCKETS)``) and emitted as literals. Computing
    ``floor(rate × buckets)`` in-engine would compare a binary double
    (Spark) against a decimal literal (DuckDB) — rates like 0.07 land on
    opposite sides of the floor (699 vs 700). Literal thresholds make
    the contract engine-independent for EVERY rate, not just the dyadic
    ones the default config happens to use."""
    expr = None
    for name, rate in MIX_RATES.items():
        cond = F.col("source") == name
        thr = int(round(rate * SPLIT_BUCKETS))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    return expr.otherwise(int(round(MIX_DEFAULT_RATE * SPLIT_BUCKETS)))


def source_mix_keep(
    documents: DataFrame, salt: str = MIX_SALT
) -> DataFrame:
    """Per-row deterministic mix decision: keep a doc iff its hash bucket
    falls under its source's acceptance threshold. Same
    partitioning-invariance argument as `deterministic_split`: membership
    is a pure function of doc_id, so re-runs, repartitions, and engine
    changes keep the identical subset — the property that makes a 100 TB
    mix reproducible (and auditable) without materializing a row list."""
    bucket = hash_bucket(F.col("doc_id"), salt)
    return spread(documents).select(
        "doc_id",
        "source",
        "n_chars",
        bucket.alias("bucket"),
        (bucket < _mix_threshold_col()).alias("keep"),
    )


def source_mix_summary(
    documents: DataFrame, salt: str = MIX_SALT
) -> DataFrame:
    """The mix audit table: per source, the target rate and the realized
    kept docs/chars. ONE conditional aggregation over the keep column —
    no second scan, no join; at 100 TB this is a map-side-combinable agg
    on a low-cardinality key."""
    marked = source_mix_keep(documents, salt)
    kept = F.col("keep").cast("long")
    return (
        marked.groupBy("source")
        .agg(
            F.round(F.first(_mix_rate_col()), 6).alias("target_rate"),
            F.count("*").alias("total_docs"),
            F.sum(kept).alias("kept_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("n_chars") * kept).alias("kept_chars"),
        )
        .select(
            "source",
            "target_rate",
            "total_docs",
            "kept_docs",
            "total_chars",
            "kept_chars",
            F.round(
                F.col("kept_docs").cast("double") / F.col("total_docs"), 6
            ).alias("kept_frac"),
        )
    )


def temperature_weights(
    documents: DataFrame, tau: float = 0.7
) -> DataFrame:
    """Temperature-scaled source sampling weights — the standard
    multilingual/multisource LM recipe (sample source s with probability
    ∝ share_s^τ, τ<1 flattens the distribution toward rare sources).
    Emits, per source: raw doc share, the τ-scaled sampling probability,
    and the per-source acceptance rate normalized so the SMALLEST source
    is kept whole (rate_s = (share_s/min_share)^(τ-1) ∈ (0,1]; τ<1 makes
    the exponent negative, so bigger sources get lower rates) — the
    numbers a mixer like `source_mix_keep` would be configured with.

    Scale shape: one count aggregation on the source key, then a
    broadcast of the (|sources|-row) totals — nothing here touches row
    data twice. Outputs are ROUNDED doubles: pow() is IEEE libm in both
    engines, agreement beyond 6 decimals is not part of the contract."""
    counts = documents.groupBy("source").agg(F.count("*").alias("docs"))
    totals = counts.agg(
        F.sum("docs").alias("total"),
        F.sum(F.pow(F.col("docs"), F.lit(tau))).alias("pow_sum"),
        F.min("docs").alias("min_docs"),
    )
    share = F.col("docs") / F.col("total")
    prob = F.pow(F.col("docs"), F.lit(tau)) / F.col("pow_sum")
    min_share = F.col("min_docs") / F.col("total")
    rate = F.pow(share / min_share, F.lit(tau - 1.0))
    return counts.crossJoin(F.broadcast(totals)).select(
        "source",
        "docs",
        F.round(share, 6).alias("share"),
        F.round(prob, 6).alias("sample_prob"),
        F.round(F.least(rate, F.lit(1.0)), 6).alias("accept_rate"),
    )


UPSAMPLE_RATES: dict[str, float] = {
    "src0": 2.5,
    "src1": 1.0,
    "src2": 3.0,
}
UPSAMPLE_DEFAULT_RATE = 1.5
UPSAMPLE_SALT = "upsample"


def upsample_plan(
    documents: DataFrame, salt: str = UPSAMPLE_SALT
) -> DataFrame:
    """Deterministic fractional UPSAMPLING — the other half of the
    source-mixing story (`source_mix_keep` downsamples; rare-source
    rates from `temperature_weights` often exceed 1). A rate of 2.5
    means every doc repeats twice and HALF the docs (chosen by the same
    partitioning-invariant hash bucketing as the split/mix family)
    repeat a third time: repeats = ⌊rate⌋ + (bucket < frac·buckets),
    with the fractional threshold computed ONCE in Python as an integer
    literal (same engine-independence argument as the mix thresholds).
    Expected copies per source converge to rate exactly; membership of
    the extra copy is auditable per doc_id.

    The plan (doc_id, source, repeats) is the cheap narrow artifact;
    materializing is one explode fan-out (`materialize_upsample`),
    which at 100 TB is write-amplification you schedule, not shuffle."""
    bucket = hash_bucket(F.col("doc_id"), salt)
    base = None
    extra = None
    for name, rate in UPSAMPLE_RATES.items():
        cond = F.col("source") == name
        b, thr = int(rate), int(round((rate - int(rate)) * SPLIT_BUCKETS))
        base = F.when(cond, b) if base is None else base.when(cond, b)
        extra = F.when(cond, thr) if extra is None else extra.when(cond, thr)
    d_b = int(UPSAMPLE_DEFAULT_RATE)
    d_t = int(round((UPSAMPLE_DEFAULT_RATE - d_b) * SPLIT_BUCKETS))
    base = base.otherwise(d_b)
    extra = extra.otherwise(d_t)
    return spread(documents).select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        (base + (bucket < extra).cast("int")).cast("long").alias("repeats"),
    )


def materialize_upsample(documents: DataFrame) -> DataFrame:
    """Explode the plan into actual repeated rows (doc_id, copy_id)."""
    plan = upsample_plan(documents)
    return plan.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(0), F.col("repeats").cast("int") - 1)
        ).alias("copy_id"),
    ).filter(F.col("copy_id") >= 0)


def per_key_cap(
    events: DataFrame,
    key: str = "user_id",
    k: int = 20,
    salt: str = "cap-v1",
) -> DataFrame:
    """Deterministic per-key event cap: keep at most ``k`` rows per key,
    chosen by salted-md5 order (not recency, so the sample is unbiased
    across each key's history) — the frequent-user downweighting step a
    training pipeline applies before user-level aggregates are dominated
    by bots/whales. Tie-break by event_id makes the keep set exact and
    engine-identical.

    Scale shape: one window partitioned by the HIGH-cardinality key —
    balanced (contrast events_topk_per_type's salted two-stage, needed
    only because its partition key is low-cardinality). The md5 order is
    computed per row, map-side."""
    from pyspark.sql.window import Window

    h = F.md5(
        F.concat(
            F.lit(salt + ":"), F.col("event_id").cast("string")
        )
    )
    w = Window.partitionBy(key).orderBy(h.asc(), F.col("event_id").asc())
    return (
        events.withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= k)
        .select(
            F.col(key),
            "event_id",
            F.col("keep_rank").cast("long").alias("keep_rank"),
        )
    )


def per_key_cap_summary(
    events: DataFrame, key: str = "user_id", k: int = 20
) -> DataFrame:
    """Dim-grain companion of :func:`per_key_cap`: per key, rows before
    vs after the cap — the audit table the downweighting step logs."""
    kept = per_key_cap(events, key=key, k=k).groupBy(key).agg(
        F.count("*").alias("kept")
    )
    totals = events.groupBy(key).agg(F.count("*").alias("events"))
    return (
        totals.join(kept, key)
        .select(
            F.col(key),
            "events",
            "kept",
            (F.col("events") - F.col("kept")).alias("dropped"),
        )
    )


def weighted_sample(
    documents: DataFrame,
    k: int = 500,
    weight_col: str = "n_chars",
    salt: str = "aes-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    A-ES scheme (Inf. Proc. Letters 2006 — public algorithm): each row
    draws key = u^(1/w) with u uniform in (0, 1] and w its weight; the
    k largest keys are exactly a weighted WOR draw. The "uniform" is
    the engine's standard deterministic md5 construction (60-bit hash
    of salt:doc_id, +1, / 2^60), so the sample is reproducible across
    partitionings, engines, and re-runs — the same reason the split
    family avoids ``df.sample()``.

    Scale shape: a pure narrow map plus a global top-k
    (TakeOrderedAndProject: per-partition heap + driver merge of k
    rows, NOT a global sort shuffle). Weights clamp to ≥ 1 so
    zero-length docs stay drawable. Output: doc_id, weight, sample_key
    (rounded for display; ordering uses the unrounded key, ties broken
    by doc_id).
    """
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    u = (h + 1).cast("double") / F.lit(float(2**60))
    w = F.greatest(F.col(weight_col), F.lit(1)).cast("double")
    key = F.pow(u, F.lit(1.0) / w)
    return (
        spread(documents)
        .select(
            "doc_id",
            F.col(weight_col).alias("weight"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "weight", F.round("_key", 6).alias("sample_key"))
    )


DSIR_BUCKETS = 4096
DSIR_SALT = "dsir-v1"


def dsir_weights(
    documents: DataFrame,
    target_source: str = "src0",
    buckets: int = DSIR_BUCKETS,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023 — public
    algorithm): hashed-unigram bag features (md5 mod ``buckets``),
    add-one-smoothed unigram LMs of the TARGET domain (rows whose
    ``source`` equals ``target_source``) and of the RAW rest, and per
    document the bag log-likelihood ratio
    Σ_tokens [ln p_target(b) − ln p_raw(b)] — the score that makes raw
    data distributed like the target under exp-weighted resampling.
    Output: doc_id, source, n_tokens, log_ratio (round 6; ln()
    agreement beyond 6 decimals is not part of the contract, same as
    unigram_logprob).

    Scale shape: one bucket-keyed conditional-count aggregation whose
    result is FIXED-size (``buckets`` rows — legitimately broadcastable
    at ANY corpus size, the deliberate contrast with the
    vocabulary-grain never-broadcast rule: hashing collapses the
    unbounded vocabulary to a constant feature space), a broadcast
    2-scalar totals row, then a doc-keyed sum. No corpus-sized shuffle
    beyond the token explode."""
    return dsir_score(
        documents,
        dsir_lm(documents, target_source, buckets, bucketed=bucketed),
        buckets,
        bucketed=bucketed,
    )


def _dsir_bucketed(documents: DataFrame, buckets: int) -> DataFrame:
    """(doc_id, source, b) hashed-token rows — the shared feature
    derivation of the DSIR family."""
    toks = spread(documents).select(
        "doc_id",
        "source",
        F.explode(
            F.split(
                F.lower(
                    F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
                ),
                " ",
            )
        ).alias("token"),
    )
    b = F.pmod(
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long"),
        F.lit(buckets),
    )
    return toks.withColumn("b", b)


def dsir_lm(
    documents: DataFrame,
    target_source: str = "src0",
    buckets: int = DSIR_BUCKETS,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """The fitted DSIR LM table: (b, logdiff) over observed buckets —
    FIXED size (≤ ``buckets`` rows), the persistable model a production
    pipeline fits ONCE on labeled corpora and ships to every ingest
    screen (`streaming/documents_stream.write_dsir_lm`). ``bucketed``
    lets callers share one materialized hashed-token frame across the
    DSIR family (the explode+md5 chain is the expensive half)."""
    if bucketed is None:
        bucketed = _dsir_bucketed(documents, buckets)
    is_t = (F.col("source") == target_source).cast("long")
    lm = bucketed.groupBy("b").agg(
        F.sum(is_t).alias("ct"),
        F.sum(1 - is_t).alias("cr"),
    )
    totals = lm.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    return lm.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + 1.0) / (F.col("tt") + buckets))
            - F.log((F.col("cr") + 1.0) / (F.col("tr") + buckets))
        ).alias("logdiff"),
    )


def dsir_score(
    documents: DataFrame,
    lm: DataFrame,
    buckets: int = DSIR_BUCKETS,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Score documents against a (possibly persisted) DSIR LM table:
    per-doc bag log-likelihood ratio. Tokens whose bucket is absent
    from the LM (never observed at fit time) contribute 0 — the two
    smoothed floors cancel to ln(tr+B)−ln(tt+B)… only approximately, so
    the screen fits the LM on the FULL labeled corpus where every
    observed bucket is present; the left-join keeps the behavior
    explicit instead of silently dropping unseen-bucket tokens."""
    if bucketed is None:
        bucketed = _dsir_bucketed(documents, buckets)
    return (
        bucketed.join(F.broadcast(lm), "b", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.coalesce(F.col("logdiff"), F.lit(0.0))), 6
            ).alias("log_ratio"),
        )
    )


def dsir_resample(
    documents: DataFrame,
    k: int = 100,
    target_source: str = "src0",
    buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """DSIR's selection step: Gumbel-top-k over the importance weights —
    adding independent Gumbel noise g = −ln(−ln u) to each log weight
    and taking the k largest draws a sample WITHOUT replacement with
    P(doc) ∝ exp(log_ratio), the exp-weighted resampling the paper
    prescribes. The uniform is the engine's deterministic md5
    construction, so the selected set is reproducible across engines
    and partitionings; the top-k plans as per-partition heaps
    (TakeOrderedAndProject), never a global sort. Output: doc_id,
    source, log_ratio."""
    w = dsir_weights(documents, target_source, buckets, bucketed=bucketed)
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    u = (h + 1).cast("double") / F.lit(float(2**60))
    gumbel = -F.log(-F.log(u))
    return (
        w.withColumn("_key", F.col("log_ratio") + gumbel)
        .orderBy(F.col("_key").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "source", "log_ratio")
    )


def nb_source_classifier(
    documents: DataFrame,
    buckets: int = DSIR_BUCKETS,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Multinomial Naive-Bayes provenance classifier over the same
    hashed-unigram feature space as DSIR: per source s, an add-one-
    smoothed bucket LM and a log prior ln(docs_s/docs); a document's
    score for s is ln prior + Σ_tokens ln p_s(b), prediction = argmax
    over the ROUNDED score (ties: lexicographically largest source —
    the natural max-of-struct order, mirrored in the oracle). The production use is
    classifying UNKNOWN-provenance documents against LMs fit on labeled
    sources; self-classification on the labeled corpus (tested) is the
    sanity check that the feature space carries domain signal.

    Scale shape: one (bucket, source) conditional-count aggregation —
    FIXED size (buckets × |sources|), broadcastable at any corpus
    scale — then the scoring pass joins DOC-GRAIN BUCKET BAGS against a
    bucket → per-source logprob ARRAY (one row per bucket, |sources|
    doubles wide) and folds the arrays elementwise with
    aggregate/zip_with. The shuffle therefore carries bag-grain rows
    (≤ min(n_tokens, buckets) per doc), NOT the token × |sources|
    fan-out the naive per-(doc, candidate-source) aggregation pays —
    at 20 sources that cut the scored-row volume 20× (sf0.1: 3.5 s →
    see bench). Per-group state is bounded: ≤ ``buckets`` arrays of
    |sources| doubles per document. Output: doc_id, source,
    predicted_source, log_score (round 6), correct."""
    if bucketed is None:
        bucketed = _dsir_bucketed(documents, buckets)
    # per-source token counts per bucket + totals (fixed-size tables)
    lm = bucketed.groupBy("b", F.col("source").alias("s")).agg(
        F.count("*").alias("c")
    )
    src_tot = bucketed.groupBy(F.col("source").alias("s")).agg(
        F.count("*").alias("tot")
    )
    doc_counts = documents.groupBy(F.col("source").alias("s")).agg(
        F.count("*").alias("docs")
    )
    n_docs = documents.agg(F.count("*").alias("n"))
    # dense (bucket × source) log-prob table: OBSERVED buckets only is
    # not enough — a bucket unseen under source s still contributes the
    # smoothed floor ln(1/(tot_s + buckets)) — so cross join the
    # observed-bucket dim with the source dim and left-join counts
    bdim = lm.select("b").distinct()
    dense = (
        bdim.crossJoin(src_tot)
        .join(lm, ["b", "s"], "left")
        .select(
            "b",
            "s",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("tot") + buckets)
            ).alias("lp"),
        )
    )
    prior = (
        doc_counts.crossJoin(F.broadcast(n_docs))
        .select("s", F.log(F.col("docs") / F.col("n")).alias("lprior"))
    )
    # bucket → per-source logprob ARRAY, sorted by source name so every
    # bucket's array positions align (dense is built from bdim × src_tot,
    # so each bucket carries exactly |sources| entries)
    dense_arr = dense.groupBy("b").agg(
        F.array_sort(F.collect_list(F.struct("s", "lp"))).alias("slp")
    )
    prior_arr = prior.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("s", "lprior"))).alias("pri")
    )
    # doc-grain bucket bags: the ONLY data-sized shuffle of the scoring
    # pass carries ≤ min(n_tokens, buckets) rows per doc — never the
    # token × |sources| fan-out
    bags = bucketed.groupBy("doc_id", "source", "b").agg(
        F.count("*").alias("cnt")
    )
    vals = bags.join(F.broadcast(dense_arr), "b").select(
        "doc_id",
        "source",
        F.transform("slp", lambda x: x["lp"] * F.col("cnt")).alias("vals"),
    )
    # elementwise array fold per doc: bounded state (≤ buckets arrays of
    # |sources| doubles), all JVM higher-order functions
    summed = (
        vals.groupBy("doc_id", "source")
        .agg(F.collect_list("vals").alias("vv"))
        .crossJoin(F.broadcast(prior_arr))
        .select(
            "doc_id",
            "source",
            F.aggregate(
                "vv",
                F.transform(F.col("pri"), lambda _: F.lit(0.0)),
                lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
            ).alias("ll_arr"),
            "pri",
        )
    )
    # argmax over the ROUNDED score with ties to the lexicographically
    # largest source — identical semantics to max(struct(score, s))
    best = summed.select(
        "doc_id",
        "source",
        F.array_max(
            F.zip_with(
                F.col("ll_arr"),
                F.col("pri"),
                lambda a, p: F.struct(
                    F.round(a + p["lprior"], 6).alias("log_score"),
                    p["s"].alias("predicted_source"),
                ),
            )
        ).alias("top"),
    )
    return best.select(
        "doc_id",
        "source",
        F.col("top.predicted_source").alias("predicted_source"),
        F.col("top.log_score").alias("log_score"),
        (F.col("top.predicted_source") == F.col("source")).alias("correct"),
    )


def epoch_mix_plan(
    documents: DataFrame,
    token_budget: int = 1_000_000,
    tau: float = 0.5,
) -> DataFrame:
    """Training-mixture epoch planner: given a global token budget and a
    temperature-scaled target mixture (weight_s ∝ tokens_s^τ, the same
    τ<1 flattening recipe as :func:`temperature_weights` but measured in
    TOKENS, the unit an LM trainer budgets in), emit per source its
    token count, target mixture weight, the token allocation, and the
    implied epoch count (allocation / available tokens — >1 means the
    source repeats, the number data-mixing papers report). Token count
    is whitespace tokens of the trimmed text, matching the corpus-wide
    convention used by ``token_stats``.

    Scale shape: one narrow map (``size(split(...))`` — no explode, the
    corpus characters never shuffle) into a keyed aggregation on the
    source key, then one |sources|-row broadcast of the totals. Output
    is source-grain, bounded. All derived doubles are ROUNDED: pow() is
    IEEE libm in both engines, agreement beyond 6 decimals is not part
    of the contract.
    """
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    counts = documents.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum(n_tok.cast("long")).alias("tokens"),
    )
    totals = counts.agg(
        F.sum("tokens").alias("total_tokens"),
        F.sum(F.pow(F.col("tokens"), F.lit(tau))).alias("pow_sum"),
    )
    weight = F.pow(F.col("tokens"), F.lit(tau)) / F.col("pow_sum")
    alloc = weight * F.lit(float(token_budget))
    return counts.crossJoin(F.broadcast(totals)).select(
        "source",
        "docs",
        "tokens",
        F.round(F.col("tokens") / F.col("total_tokens"), 6).alias(
            "token_share"
        ),
        F.round(weight, 6).alias("mix_weight"),
        F.round(alloc, 2).alias("token_alloc"),
        F.round(alloc / F.col("tokens"), 6).alias("epochs"),
    )


def curriculum_order(documents: DataFrame) -> DataFrame:
    """Deterministic curriculum ordering: a total training order over
    the corpus — ascending length within ascending complexity proxy
    (here: quality DESCENDING first, so the cleanest documents lead,
    then shorter-before-longer, doc_id as the final tiebreak) — the
    data-ordering step of curriculum-learning recipes. Emits the exact
    1-based global position per doc.

    Scale shape: the total order is materialized by
    :func:`pipelines.util.exact_global_rank` — range exchange +
    per-slice row_number + cumulative-offset broadcast — NOT a bare
    global window (the single-partition sort scale-killer the r6
    de-global-sort pass removed everywhere else). Oracle states the
    equivalent row_number() window. Output: doc_id, quality_score,
    n_tokens, curriculum_rank."""
    from ..pipelines.text import quality_columns
    from .util import exact_global_rank
    from pyspark.sql import functions as F

    cols = quality_columns()
    # NULL-text docs are dropped (no orderable signals; also avoids
    # engine-dependent NULL collation in the order keys — Spark asc is
    # NULLS FIRST, DuckDB's default is NULLS LAST)
    scored = (
        spread(documents)
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.round(cols["quality_score"], 6).alias("quality_score"),
            cols["n_tokens"].alias("n_tokens"),
        )
    )
    return exact_global_rank(
        scored,
        [
            F.col("quality_score").desc(),
            F.col("n_tokens").asc(),
            F.col("doc_id").asc(),
        ],
        rank_col="curriculum_rank",
    ).select("doc_id", "quality_score", "n_tokens", "curriculum_rank")


def neyman_allocation(
    documents: DataFrame, budget: int = 1000
) -> DataFrame:
    """Neyman-optimal stratified sampling allocation over source
    strata (r9): for a fixed label/inspection budget, the
    variance-minimizing share of stratum h is N_h·σ_h / Σ N_j·σ_j —
    big AND internally-diverse sources get proportionally more budget
    than big-but-uniform ones (proportional allocation ignores σ and
    oversamples homogeneous strata). σ here is the population stddev
    of document length (n_chars), the cheap always-available
    dispersion proxy; any per-doc score column slots in identically.

    One stratum-grain aggregate off the corpus scan, then a broadcast
    scalar normalizer — dim-sized all the way after the scan.
    ``alloc_n`` floors the real-valued allocation; the remainder is
    the analyst's rounding policy, and Σ floor ≤ budget always holds.
    Output: source, n_docs, sigma_chars, weight, alloc_frac,
    alloc_n."""
    # σ from EXACT integer moments (Σx, Σx² are exact BIGINTs in any
    # engine, so σ = √(S2/n − (S1/n)²) is the identical double
    # everywhere — stddev_pop's streaming-merge algorithm differs
    # across engines by ulps that the n·σ weight would amplify past
    # the round-6 grain)
    strata = documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("s1"),
        F.sum(
            F.col("n_chars").cast("long") * F.col("n_chars").cast("long")
        ).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n_docs")
    sigma = F.sqrt(F.col("s2").cast("double") / F.col("n_docs") - mu * mu)
    # single-doc strata have σ = 0 (population, not sample): they get
    # zero Neyman budget, which is correct — one doc cannot reduce
    # within-stratum variance estimates
    weighted = strata.select(
        "source",
        "n_docs",
        sigma.alias("sigma"),
        (F.col("n_docs") * sigma).alias("w"),
    )
    tot = weighted.agg(F.sum("w").alias("wsum"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round("sigma", 6).alias("sigma_chars"),
            F.round("w", 6).alias("weight"),
            F.round(F.col("w") / F.col("wsum"), 6).alias("alloc_frac"),
            F.floor(F.lit(budget) * F.col("w") / F.col("wsum"))
            .cast("long")
            .alias("alloc_n"),
        )
    )


def kfold_assignment(
    documents: DataFrame, folds: int = 5, salt: str = "fold-42"
) -> DataFrame:
    """Deterministic stratified k-fold assignment summary (r9): every
    document lands in fold ``hash_bucket(doc_id) mod folds`` — the
    same salted-md5 family as the train/val/test splits, so fold
    membership is reproducible at any parallelism and across engines —
    and the summary reports the (source × fold) counts plus each
    fold's share WITHIN its source stratum, the balance evidence a
    cross-validation setup needs (hash folds are only approximately
    equal; this table is where "approximately" gets a number).

    One fact-scan aggregate on (source, fold); the per-source totals
    derive from the same aggregate (one scan, AQE-reused). Output:
    source, fold, n_docs, fold_frac."""
    fold = hash_bucket(F.col("doc_id"), salt, folds)
    cell = documents.groupBy(
        "source", fold.alias("fold")
    ).agg(F.count("*").alias("n_docs"))
    tot = cell.groupBy("source").agg(F.sum("n_docs").alias("src_docs"))
    return cell.join(F.broadcast(tot), "source").select(
        "source",
        F.col("fold").cast("long").alias("fold"),
        "n_docs",
        F.round(
            F.col("n_docs") / F.col("src_docs").cast("double"), 6
        ).alias("fold_frac"),
    )


def dsir_ess(
    documents: DataFrame,
    target_source: str = "src0",
    buckets: int = DSIR_BUCKETS,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Effective sample size of the DSIR importance weights, per
    source (r9): ESS = (Σw)²/Σw² over w̃ = exp(log_ratio − max
    log_ratio within the source) — the shift-invariant log-sum-exp
    normalization, so the astronomically negative raw log-ratios
    never underflow together. ESS/n is the honest health check of an
    importance-resampling plan: near 1 the weights are flat (sampling
    buys nothing); near 1/n one document dominates (the resample is
    degenerate and the target-LM fit, not the corpus, is what you'd
    be training on).

    One pass over the (already memoized) weight frame: a source-keyed
    max window, two exponent sums, one division. Output: source,
    n_docs, ess, ess_frac."""
    w = dsir_weights(
        documents,
        target_source=target_source,
        buckets=buckets,
        bucketed=bucketed,
    )
    mx = w.groupBy("source").agg(F.max("log_ratio").alias("mx"))
    shifted = w.join(F.broadcast(mx), "source").select(
        "source", F.exp(F.col("log_ratio") - F.col("mx")).alias("wt")
    )
    return (
        shifted.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (
                (F.sum("wt") * F.sum("wt"))
                / F.sum(F.col("wt") * F.col("wt"))
            ).alias("ess"),
        )
        .select(
            "source",
            "n_docs",
            F.round("ess", 6).alias("ess"),
            F.round(F.col("ess") / F.col("n_docs"), 6).alias("ess_frac"),
        )
    )


def pps_systematic(
    documents: DataFrame, n: int = 200
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling (Madow's
    method) of documents weighted by length: lay every doc's n_chars
    along a line in doc_id order, drop ``n`` equally-spaced ticks
    starting at half a step (midpoint systematic — fully deterministic,
    no RNG), and select each doc once per tick inside its interval.
    Inclusion probability is exactly proportional to weight;
    heavier-than-step docs enter with multiplicity > 1 (reported).
    The length-weighted cousin of the deterministic split family:
    token-budget-proportional corpus subsampling in one pass.

    EXACT INTEGER semantics: tick k sits at (2k+1)·W/(2n); the number
    of ticks ≤ c is floor((2n·c + W)/(2W)) — all decimal(38,0)
    arithmetic on nonnegative values, so Spark and DuckDB agree
    bit-for-bit (no float tick positions). The prefix sums come from
    exact_global_cumsum (range exchange + slice windows + triangular
    offset broadcast — no single-partition window; the 100 TB shape).
    Output: doc_id, n_chars, weight_share, multiplicity."""
    from .util import exact_global_cumsum

    w = F.col("n_chars").cast("decimal(38,0)")
    cum = exact_global_cumsum(
        documents.select("doc_id", "n_chars"),
        [F.col("doc_id").asc()],
        w,
        cum_col="cum",
        total_col="w_total",
    )
    two_n = F.lit(2 * n).cast("decimal(38,0)")
    big_w = F.col("w_total").cast("decimal(38,0)")
    prev = F.col("cum") - F.col("n_chars").cast("decimal(38,0)")
    # `div` (integral division), NOT floor(a / b): Spark decimal
    # division rounds to the result scale first, so a quotient within
    # 5e-7 of an integer (spacing is 1/(2W) — reachable at sf ≥ 0.1)
    # would round UP across the floor boundary
    staged = (
        cum.withColumn("_num_cum", two_n * F.col("cum") + big_w)
        .withColumn("_num_prev", two_n * prev + big_w)
        .withColumn("_den", F.lit(2).cast("decimal(38,0)") * big_w)
    )
    return (
        staged.withColumn(
            "multiplicity",
            F.expr("_num_cum div _den") - F.expr("_num_prev div _den"),
        )
        .drop("_num_cum", "_num_prev", "_den")
        .filter(F.col("multiplicity") >= 1)
        .select(
            "doc_id",
            "n_chars",
            F.round(
                F.col("n_chars").cast("double")
                / F.col("w_total").cast("double"),
                6,
            ).alias("weight_share"),
            F.col("multiplicity"),
        )
    )


def dsir_psis_khat(
    documents: DataFrame,
    target_source: str = "src0",
    m: int = 10,
    buckets: int = DSIR_BUCKETS,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Pareto-tail diagnostic (PSIS k̂, Vehtari et al.) of the DSIR
    importance weights, per source — the companion of
    :func:`dsir_ess`: ESS says how degenerate the weights already
    are; k̂ says whether the tail is heavy enough that the estimate
    cannot be trusted at ANY sample size (the standard rule of thumb:
    k̂ > 0.7 ⇒ unreliable). The tail index comes from the Hill
    estimator over the top-``m`` weights, computed directly on the
    LOG weights (ln(w_i/w_(m+1)) = lr_i − lr_(m+1) — no exponentials
    anywhere, so the astronomically negative log-ratios never
    under/overflow), k̂ = 1/α. Sources with ≤ m documents emit no
    row (too few tail points to fit — honest absence, not a fake 0).

    Scale shape: one source-partitioned rank window over the memoized
    weight frame (parallel across sources; at 100 TB swap the window
    for per-source TakeOrdered exactly like text_hill_tail_index).
    Output: source, m, lr_tail, alpha, khat, reliable."""
    from pyspark.sql.window import Window

    w = dsir_weights(
        documents,
        target_source=target_source,
        buckets=buckets,
        bucketed=bucketed,
    )
    ranked = w.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("log_ratio").desc(), F.col("doc_id").asc()
            )
        ),
    )
    tail = ranked.filter(F.col("rn") == m + 1).select(
        "source", F.col("log_ratio").alias("lr_tail")
    )
    top = ranked.filter(F.col("rn") <= m)
    agg = (
        top.join(tail, "source")
        .groupBy("source", "lr_tail")
        .agg(
            F.count("*").alias("m_rows"),
            F.sum(F.col("log_ratio") - F.col("lr_tail")).alias("s_excess"),
        )
    )
    # khat is written s_excess/m (NOT 1/alpha): both engines must run
    # the identical float op sequence for round-6 parity
    alpha = F.when(
        F.col("s_excess") > 0,
        F.col("m_rows").cast("double") / F.col("s_excess"),
    )
    khat = F.when(
        F.col("s_excess") > 0,
        F.col("s_excess") / F.col("m_rows").cast("double"),
    )
    return agg.select(
        "source",
        F.col("m_rows").cast("long").alias("m"),
        F.round(F.col("lr_tail"), 6).alias("lr_tail"),
        F.round(alpha, 6).alias("alpha"),
        F.round(khat, 6).alias("khat"),
        (khat <= 0.7).alias("reliable"),
    )


def ht_source_estimate(
    documents: DataFrame, n: int = 200, sample: DataFrame | None = None
) -> DataFrame:
    """Hansen–Hurwitz/Horvitz–Thompson estimation of per-source
    document counts from the Madow PPS sample — the statistic that
    makes :func:`pps_systematic` a survey instrument instead of just a
    subsampler: each sampled doc is inverse-probability weighted
    (expected hits n·w_i/W), so Σ mult_i·W/(n·w_i) over a source's
    sampled docs estimates how many docs that source has WITHOUT
    scanning the full table — the "estimate corpus composition from a
    weighted sample" primitive. Per-doc weights are rounded to 6 and
    accumulated as DECIMAL(38,6) (the keyness-drift convention:
    float-order-independent in any engine); sources the sample missed
    report 0 honestly. rel_err against the true count quantifies the
    PPS design effect (char-heavy sources estimate tighter).

    Scale shape: the sample is n rows; everything after the PPS pass
    is sample-grain + one source-dim aggregate of the full table for
    the truth column. Output: source, n_hits, ht_docs, n_docs,
    rel_err."""
    if sample is None:
        sample = pps_systematic(documents, n)
    wtot = documents.agg(
        F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("w_total")
    )
    s = (
        sample.join(documents.select("doc_id", "source"), "doc_id")
        .crossJoin(F.broadcast(wtot))
    )
    term = F.round(
        F.col("multiplicity").cast("double")
        * F.col("w_total").cast("double")
        / (F.lit(float(n)) * F.col("n_chars").cast("double")),
        6,
    ).cast("decimal(38,6)")
    est = s.groupBy("source").agg(
        F.sum("multiplicity").cast("long").alias("n_hits"),
        F.sum(term).alias("ht_sum"),
    )
    tru = documents.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    j = tru.join(est, "source", "left")
    ht = F.coalesce(F.col("ht_sum").cast("double"), F.lit(0.0))
    return j.select(
        "source",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(ht, 6).alias("ht_docs"),
        "n_docs",
        F.round(
            F.abs(ht - F.col("n_docs").cast("double"))
            / F.col("n_docs").cast("double"),
            6,
        ).alias("rel_err"),
    )
