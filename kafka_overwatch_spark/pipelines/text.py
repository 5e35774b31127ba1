"""Text analysis operators for the `documents` table — the training-data
pipeline surface beyond the reference (BASELINE.json north star): language
ID, quality scoring, token counting, document fingerprinting.

All operators are pure built-in column expressions (JVM-side, whole-stage
codegen) — no Python UDFs anywhere. At 100 TB these are narrow maps over
the documents scan: no shuffle, pushdown-friendly, and the parquet reader
prunes to (doc_id, text) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import spread

# Deterministic mini stopword lists per language for the n-gram/stopword
# language-ID heuristic. (A real deployment plugs in fastText/CLD3 via a
# pandas UDF; the heuristic keeps this container dependency-free and the
# oracle checkable.)
LANG_MARKERS = {
    "en": ("the", "a", "of", "to", "and", "is"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "fr": ("le", "la", "les", "des", "une", "est"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}

# BPE-ish word/number/symbol tokenizer (identical RE2/Java semantics).
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

PUNCT_REGEX = "[^A-Za-z0-9 ]"

STOPWORDS = LANG_MARKERS["en"]


def _tokens(col: str = "text") -> F.Column:
    """Whitespace tokens of the trimmed text."""
    return F.split(F.trim(F.col(col)), r"\s+")


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens +
    distinct-token ratio."""
    toks = _tokens()
    return spread(documents).select(
        "doc_id",
        F.size(toks).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), F.lit(0))
        ).cast("long").alias("regex_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("distinct_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("distinct_ratio"),
    )


def quality_columns() -> dict[str, F.Column]:
    """The quality-metric expressions over a raw ``text`` column, shared
    by ``quality_scores`` and the fused curation pipeline (one formula,
    one oracle)."""
    toks = _tokens()
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_chars = F.length("text")
    punct = F.length(F.regexp_replace(F.col("text"), PUNCT_REGEX, ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": F.round(
            (n_chars - punct).cast("double") / n_chars, 6
        ),
        "stopword_ratio": F.round(stop_hits.cast("double") / n_tok, 6),
        "mean_token_len": F.round(
            (n_chars.cast("double") - F.size(toks) + 1) / n_tok, 6
        ),
        # composite score: in-range length + has stopwords + low punct
        "quality_score": F.round(
            F.least(n_tok.cast("double") / 100, F.lit(1.0)) * 0.4
            + F.least(
                stop_hits.cast("double") / F.greatest(n_tok, F.lit(1)) * 5,
                F.lit(1.0),
            )
            * 0.4
            + (1 - F.least((n_chars - punct).cast("double") / n_chars * 10,
                           F.lit(1.0))) * 0.2,
            6,
        ),
    }


def quality_scores(documents: DataFrame) -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio, mean
    token length, and a composite [0,1] quality score. Deterministic
    arithmetic only — same formula on the oracle side."""
    cols = quality_columns()
    return spread(documents).select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-marker language ID: per language, count marker-token hits;
    argmax with deterministic tie-break (marker count desc, then language
    code asc); 'und' when nothing matches."""
    toks = _tokens(col="text")
    lowered = F.transform(toks, lambda t: F.lower(t))
    def marker_filter(markers):
        # NB: a default-arg lambda would have 2 params, which F.filter
        # treats as (element, index) — build the 1-arg lambda via closure
        return lambda t: t.isin(*markers)

    scores = [
        F.size(F.filter(lowered, marker_filter(markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = spread(documents).select("doc_id", "lang", *scores)
    # argmax via greatest + chained when (deterministic tie order = dict order)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        pred.alias("predicted_lang"),
        *[F.col(f"score_{lang}").cast("long").alias(f"score_{lang}")
          for lang in LANG_MARKERS],
    )


def ngram_frequencies(
    documents: DataFrame, n: int = 2, min_count: int = 10
) -> DataFrame:
    """Corpus n-gram frequency table per language (explode → count —
    the vocabulary/statistics pass of a training-data pipeline).
    Threshold instead of top-k keeps the result order-insensitive."""
    # token array projected once per row (r15, guide §4.1 — see
    # repetition_stats)
    toks = F.col("__toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        spread(documents)
        .select("lang", _norm_tokens().alias("__toks"))
        .select("lang", F.explode(grams).alias("ngram"))
        .groupBy("lang", "ngram")
        .agg(F.count("*").alias("occurrences"))
        .filter(F.col("occurrences") >= min_count)
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprinting:
    - ``content_md5``: hash of whitespace-normalized lowercase text
    - ``bag_fingerprint``: hash of the sorted distinct token bag (order-
      insensitive near-exact fingerprint)
    - ``rolling_min_hash``: lexicographic min over md5s of 5-token shingles
      (a 1-permutation minhash; the scale path to MinHash-LSH in dedup.py)
    """
    # normalized text and token array projected once per row (r15,
    # guide §4.1 — see repetition_stats: a captured expression inside
    # the shingle lambda re-ran the split+regexp chain per shingle slot)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    toks = F.col("__toks")
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 5, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 5), " "),
    )
    return (
        spread(documents)
        .select("doc_id", norm.alias("__norm"))
        .select(
            "doc_id", "__norm", F.split(F.col("__norm"), " ").alias("__toks")
        )
        .select(
            "doc_id",
            F.md5(F.col("__norm")).alias("content_md5"),
            F.md5(
                F.array_join(F.array_sort(F.array_distinct(toks)), " ")
            ).alias("bag_fingerprint"),
            F.array_min(F.transform(shingles, F.md5)).alias(
                "rolling_min_hash"
            ),
        )
    )


def _norm_tokens() -> F.Column:
    """Whitespace-normalized lowercase tokens (same norm as fingerprints)."""
    return F.split(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")), " "
    )


# Winnowing parameters (Schleimer, Wilkes & Aiken, "Winnowing: Local
# Algorithms for Document Fingerprinting", SIGMOD 2003 — public
# algorithm): k-token grams, window of w consecutive gram hashes. The
# guarantee: any shared token run of ≥ w + k - 1 tokens contributes at
# least one identical selected fingerprint to both documents.
WINNOW_K = 4
WINNOW_W = 8


def winnow_fingerprints(
    documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Winnowed document fingerprints: per doc, hash every complete
    k-token gram (60-bit md5 prefix, the engine's standard
    cross-engine-exact integer hash), slide a w-gram window and select
    each window's minimal (hash, position) pair — the classic MOSS
    selection, with the LEFTMOST minimal hash as the deterministic
    tie-break so the DuckDB oracle reproduces the exact set. Output:
    (doc_id, pos, gram_hash), pos = 1-based gram index.

    Physical shape: gram hashing is a narrow map; selection is ONE
    doc-keyed window (``min(struct(hash, pos))`` over ROWS [CURRENT, w-1
    FOLLOWING]) — no lambda-bound array slicing (which falls off
    whole-stage codegen, see minhash_bands), no shuffle beyond the
    doc_id hash partitioning, skew bounded by the longest document.
    Docs shorter than w grams winnow their single truncated window
    (every doc with ≥ k tokens yields ≥ 1 fingerprint); docs with
    < k tokens emit nothing, same as the oracle."""
    # token array projected once per row (r15, guide §4.1 — see
    # repetition_stats: a captured expression inside the gram lambda
    # re-ran the split+regexp chain per gram slot)
    toks = F.col("__toks")
    grams = _full_grams(toks, k)
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast(
            "bigint"
        ),
    )
    # NB: the Generate projection carries ONLY the exploded column —
    # putting size(grams) next to posexplode(hashes) makes projection
    # collapsing re-evaluate the whole gram chain per OUTPUT row
    # (measured: >20× slower); n_grams is recovered from a count window
    # over the already-exploded rows, which shares the doc_id exchange
    # with the selection window
    exploded = (
        spread(documents)
        .select("doc_id", _norm_tokens().alias("__toks"))
        .select("doc_id", F.posexplode(hashes).alias("pos0", "h"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    n_grams = F.count("*").over(Window.partitionBy("doc_id"))
    return (
        exploded.withColumn("n_grams", n_grams)
        .withColumn("sel", F.min(F.struct("h", "pos")).over(win))
        # classic winnowing uses only FULL windows (start pos ≤
        # n_grams - w + 1); the greatest() keeps one truncated window
        # for short docs
        .filter(
            F.col("pos")
            <= F.greatest(F.col("n_grams") - w + 1, F.lit(1))
        )
        .select(
            "doc_id",
            F.col("sel.pos").alias("pos"),
            F.col("sel.h").alias("gram_hash"),
        )
        .distinct()
    )


def shared_passage_pairs(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    max_bucket: int = 1000,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Cross-document shared-passage pairs from winnowed fingerprints —
    the scalable "which docs share verbatim runs of ≥ w+k-1 tokens"
    query (MOSS at corpus scale; the passage-grain complement of
    line_dedup and the n-gram contamination probe). Pairs share
    ``shared_fps`` distinct selected gram hashes, thresholded at
    ``min_shared`` to suppress single-collision noise.

    Scale shape: the posting list is keyed on gram_hash with the
    standard degenerate-bucket cap (ubiquitous boilerplate passages
    are exactly MinHash's giant-band problem, same treatment); the
    pair aggregation shuffles on (doc_a, doc_b) — bounded by true
    shared-passage mass, not corpus size. ``fps``: pass the memoized
    fingerprint frame (registry get_winnow_fps) so the winnow chain is
    derived ONCE per scan and shared with shared_passage_spans — both
    sides of the gram_hash self-join slice it. Output: doc_a, doc_b,
    shared_fps."""
    if fps is None:
        fps = winnow_fingerprints(documents, k, w)
    posting = fps.select("doc_id", "gram_hash").distinct()
    capped = posting.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("gram_hash"))
    ).filter(F.col("bucket_n") <= max_bucket)
    a = capped.select(F.col("doc_id").alias("doc_a"), "gram_hash")
    b = capped.select(F.col("doc_id").alias("doc_b"), "gram_hash")
    return (
        a.join(b, "gram_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count_distinct("gram_hash").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def shared_passage_spans(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    max_bucket: int = 1000,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Span-level localization of ``shared_passage_pairs``: for every
    qualifying pair, the matched fingerprints WITH their 1-based gram
    positions in each document — the forensic view ("WHERE is the
    shared run") that drives passage-grain removal or citation. A
    matched gram_hash at (pos_a, pos_b) anchors a shared token run
    covering tokens [pos, pos + k - 1] on each side.

    Scale shape: the same capped gram_hash-keyed join as the pair
    query, positions carried through; the pair-qualification semi-join
    is fingerprint-grain on (doc_a, doc_b) — bounded by true shared
    mass. Output: doc_a, doc_b, gram_hash, pos_a, pos_b."""
    if fps is None:
        fps = winnow_fingerprints(documents, k, w)
    capped = fps.withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("gram_hash")),
    ).filter(F.col("bucket_n") <= max_bucket)
    a = capped.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "gram_hash"
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "gram_hash"
    )
    # LAZY checkpoint (r14 opt, guide §2.4): the qualification
    # aggregate and the final semi-join both read spans — without the
    # pin the capped gram-keyed self-join runs twice per action.
    spans = (
        a.join(b, "gram_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .localCheckpoint(eager=False)
    )
    qualified = (
        spans.groupBy("doc_a", "doc_b")
        .agg(F.count_distinct("gram_hash").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
        .select("doc_a", "doc_b")
    )
    return spans.join(qualified, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "gram_hash", "pos_a", "pos_b"
    )


def _full_grams(toks: F.Column, n: int) -> F.Column:
    """All COMPLETE n-gram strings of a token array (no partial tail gram —
    unlike the 1-permutation shingles above, repetition/contamination stats
    must not count a short-doc fragment as a gram)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition metrics per document: the fraction of
    n-grams taken by the single most frequent n-gram (top_Ngram_frac) and
    the duplicated-n-gram fraction (1 - distinct/total), for n = 2 and 3.
    High values flag boilerplate / degenerate repetition for filtering.

    Scale shape: explode → two keyed aggregations, both prefixed by
    doc_id, so partitioning is by document and skew is bounded by the
    longest single document — the standard 100 TB quality-filter plan.
    Docs with <2 tokens emit no grams and drop out (same in the oracle).
    """
    # r15 (guide §4.1/§2.3): the token array is PROJECTED once per row
    # before the gram transform — an outer expression captured inside a
    # higher-order-function lambda is re-evaluated on EVERY lambda
    # invocation, so the split+regexp chain ran once per gram slot
    # (O(tokens²) token work per doc; measured 3-51 s → 2-7 s at
    # sf0.1). CollapseProject keeps the alias un-inlined because it is
    # referenced more than once and is non-cheap.
    toks = F.col("__toks")

    def _tagged(n: int) -> F.Column:
        # NB: a `lambda g, n=n` default-arg lambda has 2 params, which
        # F.transform treats as (element, index) — close over n instead
        return F.transform(
            _full_grams(toks, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    tagged = F.concat(_tagged(2), _tagged(3))
    exploded = (
        spread(documents)
        .select("doc_id", _norm_tokens().alias("__toks"))
        .select("doc_id", F.explode(tagged).alias("g"))
        .select(
            "doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
        )
    )
    counts = exploded.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        *[
            a
            for n in (2, 3)
            for a in (
                F.max(F.when(F.col("n") == n, F.col("c"))).alias(f"top{n}"),
                F.sum(F.when(F.col("n") == n, F.col("c"))).alias(f"tot{n}"),
                F.count(F.when(F.col("n") == n, F.lit(1))).alias(f"dis{n}"),
            )
        ]
    )
    return per_doc.select(
        "doc_id",
        *[
            c
            for n in (2, 3)
            for c in (
                F.col(f"tot{n}").cast("long").alias(f"n{n}_total"),
                F.round(
                    F.col(f"top{n}").cast("double") / F.col(f"tot{n}"), 6
                ).alias(f"top_{n}gram_frac"),
                F.round(
                    1 - F.col(f"dis{n}").cast("double") / F.col(f"tot{n}"), 6
                ).alias(f"dup_{n}gram_frac"),
            )
        ],
    )


# Deterministic benchmark-probe selector: every doc_id ≡ 0 (mod 97) plays
# the role of a benchmark document whose shingles must not leak into the
# training corpus. A real pipeline swaps in the actual eval-suite shingle
# table; everything downstream (broadcast join shape) is unchanged.
CONTAMINATION_PROBE_MOD = 97
CONTAMINATION_NGRAM = 3


def probe_shingles(documents: DataFrame) -> DataFrame:
    """The benchmark-probe shingle set: distinct 3-grams of every doc
    whose id ≡ 0 (mod CONTAMINATION_PROBE_MOD), as (probe_id, gram)."""
    # token array projected once per row (r15, guide §4.1 — see
    # repetition_stats)
    return (
        documents.filter(F.col("doc_id") % CONTAMINATION_PROBE_MOD == 0)
        .select(
            F.col("doc_id").alias("probe_id"),
            _norm_tokens().alias("__toks"),
        )
        .select(
            "probe_id",
            F.explode(
                F.array_distinct(
                    _full_grams(F.col("__toks"), CONTAMINATION_NGRAM)
                )
            ).alias("gram"),
        )
    )


def contamination_hits(
    documents: DataFrame, probes: DataFrame
) -> DataFrame:
    """Per-document contamination against an explicit probe shingle set
    (probe_id, gram) — shared by the batch query (probes derived from the
    corpus) and the streaming ingest screen (probes static). Self-matches
    are excluded; only contaminated documents are returned."""
    # LAZY checkpoint (r14 opt, guide §2.4): hits and totals both
    # consume the tokenize+explode subtree, which Spark would otherwise
    # compute twice per action (two Generate spans in the plan). The
    # first consumer materializes the gram frame inside its own job;
    # the second reads the pinned blocks — one tokenization pass.
    # Token array projected once per row (r15, guide §4.1 — see
    # repetition_stats).
    shingled = (
        spread(documents)
        .select("doc_id", _norm_tokens().alias("__toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    _full_grams(F.col("__toks"), CONTAMINATION_NGRAM)
                )
            ).alias("gram"),
        )
        .localCheckpoint(eager=False)
    )
    hits = (
        shingled.join(F.broadcast(probes), "gram")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("hit_grams"),
            F.countDistinct("probe_id").alias("probe_docs"),
        )
    )
    totals = shingled.groupBy("doc_id").agg(
        F.count("*").alias("total_grams")
    )
    return hits.join(totals, "doc_id").select(
        "doc_id",
        F.col("hit_grams").cast("long").alias("hit_grams"),
        F.col("probe_docs").cast("long").alias("probe_docs"),
        F.round(
            F.col("hit_grams").cast("double") / F.col("total_grams"), 6
        ).alias("contamination_frac"),
    )


def contamination(documents: DataFrame) -> DataFrame:
    """Benchmark-decontamination screen: for each document, how many of
    its distinct 3-gram shingles also occur in any probe (benchmark) doc,
    how many distinct probe docs it collides with, and the contaminated
    fraction of its shingle set.

    Scale shape: the probe side (an eval suite) is tiny and broadcast; the
    corpus streams through one explode + broadcast-hash join + per-doc
    aggregation — no corpus-sized shuffle on the gram key.
    """
    return contamination_hits(documents, probe_shingles(documents))


# Redaction patterns chosen for identical Java-regex / RE2 semantics
# (no backrefs, no lookaround): the standard training-data scrub set.
REDACTION_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(documents: DataFrame) -> DataFrame:
    """PII/link scrubbing: count and replace emails, URLs and IPv4
    literals with <TYPE> tokens. Pure JVM regexp ops — narrow map over
    the documents scan, no shuffle, no Python; the md5 of the redacted
    text is the hash-checkable witness that replacement (not just
    counting) matched the oracle."""
    # counts are taken on the ORIGINAL text; replacements then apply in
    # declaration order (later patterns see earlier tokens — e.g. an
    # ipv4 inside an already-redacted url no longer matches)
    red = F.col("text")
    for name, pat in REDACTION_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return spread(documents).select(
        "doc_id",
        *[
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
            ).cast("long").alias(f"n_{name}")
            for name, pat in REDACTION_PATTERNS.items()
        ],
        F.md5(red).alias("redacted_md5"),
    )


TFIDF_TOP_K = 3


def tfidf_top_terms(documents: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document top-k TF-IDF terms (tf × ln(N/df), raw counts) —
    the keyword/topic-signal pass of a corpus statistics pipeline.

    Scale shape: one (doc_id, token) count aggregation, a token-keyed
    document-frequency aggregation joined back BY KEY onto the term
    counts — the df table is VOCABULARY-grain (10^8+ distinct tokens on
    100 TB of noisy text), so it is never broadcast (r6 verdict #3;
    same rule `dedup.containment_pairs_prefix` documents for its
    shingle-frequency table) — then a window partitioned by doc_id for
    the top-k. No corpus-sized shuffle beyond the term count, skew
    bounded by the largest single document. The scalar n_docs cross
    join stays a broadcast (one row). Deterministic tie-break: tfidf
    desc, then token asc.
    """
    toks = _norm_tokens()
    # LAZY checkpoint (r14 opt, guide §2.4): the df aggregate and the
    # scored join both consume the explode+count subtree, which the
    # plan otherwise computes twice (no exchange reuse across the two
    # sites — verified in plans/r14/text_tfidf_before.txt). First
    # consumer materializes; the second reads the pinned blocks.
    terms = (
        spread(documents)
        .select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = documents.select(
        F.countDistinct("doc_id").alias("n_docs")
    )
    df_tbl = terms.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        terms.join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


# C4-style line dedup, re-expressed for token-stream documents: a "line"
# is a consecutive LINE_TOKENS-token segment of the normalized text (the
# fixture corpus carries no newlines; real corpora would split on '\n'
# first — the operator below is segment-agnostic once `lines` is built).
LINE_TOKENS = 5
LINE_DUP_MIN_DOCS = 2


def line_dedup(
    documents: DataFrame,
    line_tokens: int = LINE_TOKENS,
    min_docs: int = LINE_DUP_MIN_DOCS,
) -> DataFrame:
    """Corpus-level line deduplication (the C4 "remove any line occurring
    in ≥N documents" rule): chunk each doc into consecutive
    ``line_tokens``-token lines, count each line's distinct-document
    frequency across the corpus, and emit per doc the kept-line text
    witness (md5 of surviving lines joined by newline, original order),
    plus dup-line counts.

    Scale shape: one posexplode (narrow), one line-keyed aggregation for
    corpus frequencies, one line-keyed equi-join back, one doc-keyed
    aggregation — two shuffles on bounded keys, no all-pairs work, skew
    bounded by the most frequent single line (a boilerplate line hashes
    to one key, the same hot-key profile C4 handles; salt if needed).
    """
    # consecutive line_tokens-token segments via ONE greedy regexp pass —
    # a lambda-bound F.slice start would fall off the codegen path (the
    # minhash_bands lesson, dedup.py:131); measured ~20% faster at sf0.1
    # and structurally whole-stage-friendly. NB: a whitespace-only doc
    # produces zero lines and drops out (same on the oracle side).
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    seg_re = r"\S+( \S+){0,%d}" % (line_tokens - 1)
    lines = F.regexp_extract_all(norm, F.lit(seg_re), F.lit(0))
    # LAZY checkpoint (r14 opt, guide §2.4): the corpus-frequency
    # aggregate and the join-back both consume the regexp+posexplode
    # subtree, which Spark would otherwise compute twice per action.
    # The first consumer materializes the line frame inside its own
    # job; the second reads the pinned blocks — one regexp pass.
    exploded = (
        spread(documents)
        .select("doc_id", F.posexplode(lines).alias("pos", "line"))
        .localCheckpoint(eager=False)
    )
    line_docs = exploded.groupBy("line").agg(
        F.countDistinct("doc_id").alias("line_doc_freq")
    )
    tagged = exploded.join(line_docs, "line")
    is_dup = F.col("line_doc_freq") >= min_docs
    kept_sorted = F.array_sort(
        F.collect_list(
            F.when(~is_dup, F.struct(F.col("pos"), F.col("line")))
        )
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(is_dup.cast("int")).cast("long").alias("dup_lines"),
        F.round(
            F.sum(is_dup.cast("int")).cast("double") / F.count("*"), 6
        ).alias("dup_line_frac"),
        F.md5(
            F.array_join(
                F.transform(kept_sorted, lambda s: s["line"]), "\n"
            )
        ).alias("kept_md5"),
    )


LENGTH_BUCKET = 16


def length_histogram(
    documents: DataFrame, bucket: int = LENGTH_BUCKET
) -> DataFrame:
    """Token-length distribution of the corpus in fixed-width buckets —
    the dataset-card statistics pass (sequence-length planning for
    packing/truncation). Narrow map + one tiny aggregation keyed by
    (lang, bucket): nothing at 100 TB but a scan."""
    n_tok = F.size(_norm_tokens())
    lo = (n_tok - n_tok % bucket).cast("long")
    return (
        spread(documents)
        .select("lang", lo.alias("bucket_lo"), n_tok.alias("n_tokens"))
        .groupBy("lang", "bucket_lo")
        .agg(
            F.count("*").cast("long").alias("docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


def vocab_stats(documents: DataFrame) -> DataFrame:
    """Per-language vocabulary statistics: token count, distinct types,
    hapax legomena (frequency-1 types), type/token ratio, hapax share of
    the vocabulary — the corpus-health numbers a tokenizer-training or
    data-mixing pass starts from.

    Scale shape: explode → (lang, token) count → per-lang rollup; the
    (lang, token) aggregation is the only corpus-sized shuffle and is
    exactly the word-count plan Spark map-side-combines."""
    toks = _norm_tokens()
    freq = (
        spread(documents)
        .select("lang", F.explode(toks).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("c"))
    )
    return freq.groupBy("lang").agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("distinct_types"),
        F.sum((F.col("c") == 1).cast("int")).cast("long").alias("hapax_types"),
        F.round(F.count("*").cast("double") / F.sum("c"), 6).alias(
            "type_token_ratio"
        ),
        F.round(
            F.sum((F.col("c") == 1).cast("int")).cast("double")
            / F.count("*"),
            6,
        ).alias("hapax_frac"),
    )


def vocab_richness(documents: DataFrame) -> DataFrame:
    """Per-language vocabulary-richness ESTIMATORS (r9) on top of
    vocab_stats' observed counts: Chao1's abundance-based estimate of
    the true type count (D + f1²/(2·f2), the capture–recapture bound —
    "how many word types exist that this corpus hasn't seen yet") and
    the Good–Turing unseen-probability mass (f1/N — the chance the
    NEXT token is a novel type). Together they answer the
    tokenizer-vocabulary sizing question observed counts alone can't:
    whether the corpus has exhausted its vocabulary or is still
    discovering it.

    Same plan as vocab_stats (one (lang, token) count shuffle,
    map-side-combined, then a per-lang rollup); f2 = 0 falls back to
    the bias-corrected Chao1 form D + f1·(f1−1)/2. All inputs are
    exact integers; the two estimates divide once and round 6.
    Output: lang, distinct_types, total_tokens, f1, f2,
    chao1_estimate, gt_unseen_mass."""
    toks = _norm_tokens()
    freq = (
        spread(documents)
        .select("lang", F.explode(toks).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("c"))
    )
    per_lang = freq.groupBy("lang").agg(
        F.count("*").cast("long").alias("d"),
        F.sum("c").cast("long").alias("n"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
    )
    chao1 = F.when(
        F.col("f2") > 0,
        F.col("d")
        + F.col("f1") * F.col("f1") / (2.0 * F.col("f2")),
    ).otherwise(
        F.col("d") + F.col("f1") * (F.col("f1") - 1) / 2.0
    )
    return per_lang.select(
        "lang",
        F.col("d").alias("distinct_types"),
        F.col("n").alias("total_tokens"),
        "f1",
        "f2",
        F.round(chao1, 6).alias("chao1_estimate"),
        F.round(F.col("f1") / F.col("n").cast("double"), 6).alias(
            "gt_unseen_mass"
        ),
    )


def typicality_scores(documents: DataFrame) -> DataFrame:
    """Corpus-typicality score per document: the mean log2 corpus
    frequency of its 2-grams — a cheap perplexity proxy (high = the doc
    is made of common constructions, low = novel/noisy text), the
    importance-weighting signal of a data-filtering pipeline.

    Scale shape: the corpus gram-frequency table and the per-doc gram
    list are both keyed by the gram string — one shuffle each side of an
    equi-join, then a doc-keyed mean; no broadcast assumption (the gram
    vocabulary is corpus-sized)."""
    # token array projected once per row (r15, guide §4.1 — see
    # repetition_stats)
    grams = (
        spread(documents)
        .select("doc_id", _norm_tokens().alias("__toks"))
        .select(
            "doc_id",
            F.explode(_full_grams(F.col("__toks"), 2)).alias("gram"),
        )
    )
    freq = grams.groupBy("gram").agg(F.count("*").alias("n"))
    return (
        grams.join(freq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.round(F.avg(F.log2("n")), 6).alias("typicality"),
        )
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Corpus-trained unigram LM score per document — the CCNet/Gopher
    perplexity-filter stand-in this container can express exactly: token
    probabilities are add-one-smoothed corpus frequencies
    ((c+1)/(T+V)), a document's score is the mean token log-prob, and
    low scores (rare/garbled vocabulary) are the filter signal. A real
    deployment swaps in a KenLM scorer via pandas UDF; the training,
    join, and aggregation shapes are identical.

    Scale shape: ONE frequency aggregation keyed by token (map-side
    combine does the heavy lifting on a zipfian key set), a broadcast of
    the 2-scalar totals, a token→frequency join (AQE broadcasts the
    vocab while it fits; at 100 TB a top-K vocab + OOV default keeps it
    broadcastable), and a doc-keyed mean. Scores are ROUNDED doubles —
    ln() agreement beyond 6 decimals is not part of the contract."""
    toks = spread(documents).select(
        "doc_id", F.explode(_norm_tokens()).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("c"))
    totals = freq.agg(
        F.sum("c").alias("T"), F.count("*").alias("V")
    )
    scored = toks.join(freq, "token").crossJoin(F.broadcast(totals))
    logp = F.log(
        (F.col("c") + F.lit(1.0)) / (F.col("T") + F.col("V"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(logp), 6).alias("avg_logprob"),
        F.round(F.min(logp), 6).alias("min_logprob"),
    )


def gopher_flag_columns() -> dict[str, F.Column]:
    """The rule expressions over a raw ``text`` column — ONE definition
    shared by the per-doc flags surface and the dataset-card rollup so
    the keep rate cannot drift between them."""
    toks = _norm_tokens()
    n_tok = F.size(toks)
    n_chars = F.length(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    )
    nonspace = n_chars - (n_tok - 1)
    symbols = n_chars - F.length(
        F.regexp_replace(
            F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
            PUNCT_REGEX,
            "",
        )
    )
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    distinct_toks = F.size(F.array_distinct(toks))
    return {
        "word_count_ok": (n_tok >= 10) & (n_tok <= 100_000),
        "mean_word_len_ok": (nonspace >= n_tok * 2) & (nonspace <= n_tok * 12),
        "symbol_ratio_ok": symbols * 10 <= n_chars * 3,
        "has_stopwords": stop_hits >= 1,
        "diversity_ok": distinct_toks * 5 >= n_tok,
    }


def gopher_quality_flags(documents: DataFrame) -> DataFrame:
    """Gopher-style rule-based quality gate: one boolean per rule plus
    the fused keep verdict — the canonical pre-training heuristic filter
    bundle (word count bounds, mean word length bounds, symbol ratio,
    stopword presence, lexical diversity). Every comparison is
    CROSS-MULTIPLIED INTEGER arithmetic over the normalized token array
    — no float boundary can disagree with the oracle, and the whole op
    is one narrow JVM projection (no shuffle, column-pruned scan).

    Rule set (thresholds scaled to the fixture's short docs; a real
    Gopher gate swaps the constants, not the shapes):
    - word_count_ok:     10 ≤ n_tokens ≤ 100000
    - mean_word_len_ok:  2 ≤ nonspace_chars/n_tokens ≤ 12
    - symbol_ratio_ok:   symbol_chars ≤ 30% of chars
    - has_stopwords:     ≥ 1 English marker stopword
    - diversity_ok:      distinct tokens ≥ 20% of tokens
    """
    flags = gopher_flag_columns()
    n_failed = None
    for c in flags.values():
        term = (~c).cast("int")
        n_failed = term if n_failed is None else n_failed + term
    return spread(documents).select(
        "doc_id",
        *[c.alias(name) for name, c in flags.items()],
        n_failed.cast("long").alias("n_failed"),
        (n_failed == 0).alias("keep"),
    )


BM25_QUERY_TERMS = ("stream", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    documents: DataFrame, query_terms: tuple[str, ...] = BM25_QUERY_TERMS
) -> DataFrame:
    """BM25 lexical retrieval scores against a fixed query — the keyword
    half of a retrieval stack (the embedding half is the ANN family).
    Standard Okapi formula (k1=1.2, b=0.75, robust
    ``ln(1+(N-df+0.5)/(df+0.5))`` idf).

    Scale shape: the query-term filter lands IMMEDIATELY after the
    explode, so the per-(doc, term) aggregation touches only matching
    tokens (|terms| × docs-containing, not the corpus token count); doc
    lengths are one narrow aggregate; N/avgdl/df are a broadcast scalar
    frame. Docs matching no query term are excluded (retrieval
    semantics). Scores are ROUNDED doubles — ln/÷ agreement beyond 6
    decimals is not part of the contract."""
    toks = _norm_tokens()
    lengths = spread(documents).select(
        "doc_id", F.size(toks).alias("dl")
    )
    matches = (
        spread(documents)
        .select("doc_id", F.explode(toks).alias("token"))
        .filter(F.col("token").isin(*query_terms))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    stats = lengths.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    df_tbl = matches.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    term_score = idf * tf * F.lit(BM25_K1 + 1.0) / norm
    return (
        matches.join(F.broadcast(df_tbl), "token")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("matched_terms"),
            F.round(F.sum(term_score), 6).alias("bm25"),
        )
    )


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Corpus-trained BIGRAM LM score per document — the conditional
    upgrade of `unigram_logprob` and a closer stand-in for the KenLM
    perplexity filter: token probability is conditioned on its
    predecessor, ``p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁)+V)`` (add-one over the
    unigram vocabulary), and a document scores the mean/min conditional
    log-prob of its bigrams. Degenerate sequences (repeated rare
    bigrams) score low even when their unigrams are common — the
    failure mode the unigram proxy cannot see.

    Scale shape: two zipfian count aggregations (bigram, predecessor),
    both map-side combinable; the scoring join keys on the bigram (AQE
    broadcasts while the bigram vocab fits; at 100 TB a pruned top-K
    bigram table + OOV default keeps it broadcastable), then one
    doc-keyed mean. Docs with <2 tokens have no bigrams and drop out
    (same in the oracle)."""
    toks = _norm_tokens()
    bigrams = F.expr(
        """
        CASE WHEN size(toks) >= 2 THEN
          transform(sequence(0, size(toks) - 2),
            i -> struct(element_at(toks, i + 1) AS w1,
                        concat(element_at(toks, i + 1), ' ',
                               element_at(toks, i + 2)) AS bg))
        ELSE array() END
        """
    )
    doc_bigrams = (
        spread(documents)
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode(bigrams).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.bg").alias("bg"))
    )
    bigram_freq = doc_bigrams.groupBy("bg").agg(F.count("*").alias("cb"))
    unigram_freq = (
        spread(documents)
        .select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cu"))
    )
    vocab = unigram_freq.agg(F.count("*").alias("V"))
    logp = F.log(
        (F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("V"))
    )
    return (
        doc_bigrams.join(bigram_freq, "bg")
        .join(
            unigram_freq.select(F.col("token").alias("w1"), "cu"), "w1"
        )
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("avg_logprob"),
            F.round(F.min(logp), 6).alias("min_logprob"),
        )
    )


def bpe_merges(documents: DataFrame, n_merges: int = 20) -> DataFrame:
    """BPE merge-rule training — the iterative half of a real tokenizer
    build (the other half, applying learned merges, is what
    ``token_stats``'s BPE-ish regex approximates). Algorithm (Sennrich
    et al. 2016): start from character sequences per WORD TYPE, then
    repeatedly (1) count adjacent symbol pairs weighted by word
    frequency, (2) merge the globally most frequent pair everywhere.

    Spark shape: the corpus collapses to the word-TYPE table first (one
    corpus-sized shuffle; types ≪ tokens — the classic trick that makes
    distributed BPE tractable at 100 TB, where the type table is
    dim-sized and the petabyte corpus is touched exactly once). Each
    iteration is then explode-pairs → one small keyed aggregate →
    collect exactly ONE row (the champion pair) → a narrow
    regexp_replace rewrite, with ``localCheckpoint(eager)`` per round to
    keep the 20-iteration lineage bounded (lesson #8, NOTES.md). Merge
    application is Java-regex left-to-right non-overlapping — exactly
    BPE's greedy within-word merge order; ties break (freq desc, pair
    asc) so the rule sequence is deterministic. Rows-only gate (no SQL
    oracle for an iterative fixpoint); python-fold parity in
    tests/test_text_bpe.py."""
    import re as _re

    spark = documents.sparkSession
    words = (
        documents.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    sym = words.select(
        F.concat_ws(" ", F.split(F.col("w"), "")).alias("syms"), "freq"
    ).localCheckpoint(eager=True)

    rules = []
    for rank in range(n_merges):
        a = F.split(F.col("syms"), " ")
        pairs = (
            sym.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(a, 1, F.size(a) - 1),
                        F.slice(a, 2, F.size(a) - 1),
                    )
                ).alias("p"),
            )
            .select(
                F.col("p")["0"].alias("left"),
                F.col("p")["1"].alias("right"),
                "freq",
            )
            .groupBy("left", "right")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.col("pair_freq").desc(), F.col("left"), F.col("right"))
        )
        top = pairs.limit(1).collect()
        if not top or top[0].pair_freq < 2:
            break
        left, right, freq = top[0].left, top[0].right, int(top[0].pair_freq)
        merged = left + right
        pat = f"(?<=^| ){_re.escape(left)} {_re.escape(right)}(?=$| )"
        repl = merged.replace("\\", "\\\\").replace("$", "\\$")
        sym = sym.withColumn(
            "syms", F.regexp_replace("syms", pat, repl)
        ).localCheckpoint(eager=True)
        rules.append((rank, left, right, merged, freq))

    return spark.createDataFrame(
        rules, "rank long, left string, right string, merged string, pair_freq long"
    )


def bpe_tokenize(
    documents: DataFrame, rules: list[tuple[str, str]] | None = None,
    n_merges: int = 20,
) -> DataFrame:
    """Apply learned BPE merge rules (train → APPLY, the serving half of
    the tokenizer): each word is spaced into characters and the rule
    list replays in rank order — exactly the greedy left-to-right merge
    the trainer counted. The whole application compiles to ONE narrow
    JVM map (a per-word lambda with a chained regexp_replace; no
    shuffle, no Python), which is the property that lets a 100 TB corpus
    be tokenized at scan speed: the rules are a broadcast-sized literal
    baked into the expression.

    Output per doc: token count, char count, chars-per-token
    compression, md5 witness of the token stream. Rows-only gate
    (the oracle engine's RE2 has no lookbehind); exact python parity in
    tests/test_text_bpe.py."""
    import re as _re

    if rules is None:
        rules = [
            (r.left, r.right)
            for r in bpe_merges(documents, n_merges=n_merges)
            .orderBy("rank")
            .collect()
        ]
    inner = "array_join(split(w, ''), ' ')"
    for left, right in rules:
        pat = f"(?<=^| ){_re.escape(left)} {_re.escape(right)}(?=$| )"
        pat_lit = pat.replace("\\", "\\\\").replace("'", "\\'")
        repl = (left + right).replace("\\", "\\\\").replace("$", "\\$")
        repl_lit = repl.replace("'", "\\'")
        inner = f"regexp_replace({inner}, '{pat_lit}', '{repl_lit}')"
    tokens_expr = f"""
      flatten(transform(
        filter(split(lower(text), '\\\\s+'), w -> w != ''),
        w -> split({inner}, ' ')))
    """
    return documents.select(
        "doc_id",
        F.expr(f"size({tokens_expr})").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            F.length("text") / F.expr(f"size({tokens_expr})"), 4
        ).alias("chars_per_token"),
        F.md5(F.expr(f"array_join({tokens_expr}, ' ')")).alias(
            "token_witness"
        ),
    )


def zipf_fit(documents: DataFrame) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: regression slope of
    log(freq) on log(rank) (natural text ≈ -1; synthetic/boilerplate
    corpora diverge hard — a one-row dataset-card diagnostic). Exact
    integer type counts, deterministic ranks (freq desc, word asc), and
    the regression runs over identical doubles in both engines via the
    native regr_slope/regr_r2 aggregates (the regr_* surface
    topic_throughput_trend introduced). The rank is an
    ``exact_global_rank`` (range-partitioned, parallel), not a bare
    global window — the vocabulary of a 100 TB corpus does not fit one
    task."""
    from .util import exact_global_rank

    words = (
        documents.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    ranked = exact_global_rank(
        words,
        [F.col("freq").desc(), F.col("w").asc()],
        rank_col="rank",
    )
    return ranked.agg(
        F.count("*").alias("n_types"),
        F.sum("freq").alias("n_tokens"),
        F.round(
            F.expr(
                "regr_slope(ln(CAST(freq AS DOUBLE)), "
                "ln(CAST(rank AS DOUBLE)))"
            ),
            6,
        ).alias("zipf_slope"),
        F.round(
            F.expr(
                "regr_r2(ln(CAST(freq AS DOUBLE)), "
                "ln(CAST(rank AS DOUBLE)))"
            ),
            6,
        ).alias("r2"),
    )


def readability_scores(documents: DataFrame) -> DataFrame:
    """Per-doc readability (r9): Flesch reading ease and
    Flesch–Kincaid grade from three regexp-countable proxies — words
    (letter runs), sentences (terminal-punctuation runs, floor 1),
    syllables (vowel-group runs, the standard cheap approximation).
    The curation knob this feeds: filtering a training corpus to a
    readability band is a common quality heuristic alongside
    text_quality's ratio screens.

    Pure JVM narrow map (regexp_extract_all + size), zero shuffle;
    identical RE2-compatible character classes in the DuckDB oracle.
    Guards: words/sentences floored at 1 so empty docs stay finite.
    Output: doc_id, n_words, n_sentences, n_syllables,
    flesch_reading_ease, fk_grade."""
    words = F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]+"), 0))
    sents = F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0))
    sylls = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
    )
    w = F.greatest(words, F.lit(1)).cast("double")
    s = F.greatest(sents, F.lit(1)).cast("double")
    y = sylls.cast("double")
    flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
    grade = 0.39 * (w / s) + 11.8 * (y / w) - 15.59
    return documents.filter(F.col("text").isNotNull()).select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        sylls.cast("long").alias("n_syllables"),
        F.round(flesch, 6).alias("flesch_reading_ease"),
        F.round(grade, 6).alias("fk_grade"),
    )


def mojibake_score(documents: DataFrame) -> DataFrame:
    """Per-doc encoding-anomaly audit (r8): counts of U+FFFD
    replacement characters (the smoking gun of a decode-with-wrong-
    charset), C0/C1 control characters outside tab/newline/CR, and
    non-ASCII characters (context for the other two — high non-ASCII
    alone is just non-English text), plus a blended mojibake score.
    The ingest-gate companion of text_quality for crawl corpora where
    double-encoded UTF-8 and latin-1 mixups are endemic.

    All counts are length-difference arithmetic over regexp_replace —
    pure JVM narrow map, zero shuffle, codegen-friendly; identical RE2/
    Java char-class semantics in the DuckDB oracle. Output: doc_id,
    n_chars_text, repl_chars, ctrl_chars, nonascii_chars,
    mojibake_score."""
    n = F.length("text")
    repl = n - F.length(F.regexp_replace("text", "�", ""))
    ctrl = n - F.length(
        F.regexp_replace(
            "text",
            "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]",
            "",
        )
    )
    nonascii = F.length(F.regexp_replace("text", "[\\x00-\\x7f]", ""))
    score = F.round(
        (3.0 * repl + 1.0 * ctrl + 0.1 * nonascii)
        / F.greatest(n, F.lit(1)).cast("double"),
        6,
    )
    return documents.filter(F.col("text").isNotNull()).select(
        "doc_id",
        n.cast("long").alias("n_chars_text"),
        repl.cast("long").alias("repl_chars"),
        ctrl.cast("long").alias("ctrl_chars"),
        nonascii.cast("long").alias("nonascii_chars"),
        score.alias("mojibake_score"),
    )


def hill_tail_index(documents: DataFrame, k: int = 100) -> DataFrame:
    """Hill estimator of the document-length power-law tail (r9):
    α = k / Σ_{i=1..k} ln(x_(i) / x_(k+1)) over the k largest
    n_chars — the standard heavy-tail exponent the packing/chunking
    planners care about (α ≤ 1 means the corpus's total byte mass is
    dominated by its longest documents; truncation policy changes the
    training mix materially). Zipf_fit covers token FREQUENCIES; this
    covers document SIZES.

    The top-(k+1) order statistics come from a rank window with the
    engine's deterministic tie order (n_chars desc, doc_id asc) — at
    100 TB this is TakeOrdered over the scan, never a global sort.
    ln ratios of exact integers are engine-identical doubles. Output:
    one row — k, x_tail (the (k+1)-th largest length), alpha,
    tail_mass_frac (share of total chars held by the top k docs)."""
    # orderBy + limit plans as TakeOrderedAndProject (per-partition
    # top-(k+1) + driver merge) — NOT a global sort window, which
    # would single-partition the corpus; the rank window then runs on
    # the (k+1)-row frame only
    top_rows = (
        documents.select(
            "doc_id", F.col("n_chars").cast("long").alias("x")
        )
        .orderBy(F.col("x").desc(), F.col("doc_id").asc())
        .limit(k + 1)
    )
    ranked = top_rows.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("x").desc(), F.col("doc_id").asc())
        ),
    )
    xk1 = ranked.filter(F.col("rn") == k + 1).select(
        F.col("x").alias("x_tail")
    )
    total = documents.agg(
        F.sum(F.col("n_chars").cast("long")).alias("total_chars")
    )
    top = ranked.filter(F.col("rn") <= k)
    # degenerate tail (every top-k length equals x_tail → Σln = 0):
    # alpha is NULL, not an ANSI divide-by-zero (found via the
    # degree_tail_index sibling's fixture; DuckDB's double division
    # already yields NULL there)
    lnsum = F.sum(
        F.log(F.col("x").cast("double") / F.col("x_tail").cast("double"))
    )
    return (
        top.crossJoin(F.broadcast(xk1))
        .agg(
            F.lit(k).cast("long").alias("k"),
            F.max("x_tail").cast("long").alias("x_tail"),
            F.round(
                F.when(lnsum > 0, F.lit(float(k)) / lnsum), 6
            ).alias("alpha"),
            F.sum("x").cast("long").alias("topk_chars"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "x_tail",
            "alpha",
            F.round(
                F.col("topk_chars") / F.col("total_chars").cast("double"),
                6,
            ).alias("tail_mass_frac"),
        )
    )


def gram_hash_set(
    n: int = 5, toks: F.Column | None = None
) -> F.Column:
    """DISTINCT 60-bit hashes of a document's word n-grams (normalized
    tokens, hashed at birth — the narrow-shuffle-row convention shared
    by ngram_novelty and the streaming novelty monitor). Empty array
    for docs shorter than n tokens.

    ``toks``: pass the PROJECTED token-array column (r15, guide §4.1 —
    see repetition_stats: the default expression captured inside the
    gram lambda re-runs the split+regexp chain once per gram slot;
    callers should ``.select(_norm_tokens().alias("__toks"))`` first
    and pass ``F.col("__toks")``)."""
    if toks is None:
        toks = _norm_tokens()
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda i: F.conv(
            F.substring(
                F.md5(F.array_join(F.slice(toks, i, n), " ")), 1, 15
            ),
            16,
            10,
        ).cast("long"),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, gram_hashes).otherwise(
            F.array().cast("array<long>")
        )
    )


def ngram_novelty(documents: DataFrame, n: int = 5) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word n-grams that appear in no other document — the
    memorization/diversity audit (a corpus of templated near-copies
    scores ~0; genuinely novel text ~1), and the per-doc complement of
    the pairwise dedup screens: it quantifies how much of each doc is
    corpus-unique without enumerating pairs. Same normalized tokens as
    the fingerprint/winnowing family; docs shorter than n grams emit
    n_grams = 0 with NULL novelty (no fake 0-or-1 score).

    Scale shape: grams are 60-bit HASHES from the moment they exist
    (narrow shuffle rows, the winnowing convention; collisions at
    2⁻⁶⁰ are part of the documented estimator, mirrored bit-for-bit
    in the oracle), derived ONCE (checkpointed — two aggregate
    consumers would otherwise re-run the explode). A gram is
    corpus-unique iff its doc-count is 1, and THAT doc's identity
    rides the same aggregate as min(doc_id) — so novelty needs zero
    gram-grain joins: one (gram)-keyed aggregate, one doc-keyed
    count, one doc-grain left join. Measured 7.3 → ~3.5 s at sf0.1
    vs the join-back form. Output: doc_id, n_grams, novel_grams,
    novelty."""
    # lazy since r14: the explode materializes inside the first
    # consumer's stage (both aggregates run under the query's single
    # action anyway) — same one-pass guarantee, one fewer driver job
    grams = (
        documents.filter(F.col("text").isNotNull())
        .select("doc_id", _norm_tokens().alias("__toks"))
        .select(
            "doc_id",
            F.explode(gram_hash_set(n, F.col("__toks"))).alias("g"),
        )
        .localCheckpoint(eager=False)
    )
    per_doc_n = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    gd = grams.groupBy("g").agg(
        F.count("*").alias("doc_n"), F.min("doc_id").alias("only_doc")
    )
    novel = (
        gd.filter(F.col("doc_n") == 1)
        .groupBy(F.col("only_doc").alias("doc_id"))
        .agg(F.count("*").alias("novel_grams"))
    )
    return (
        documents.filter(F.col("text").isNotNull())
        .select("doc_id")
        .join(per_doc_n, "doc_id", "left")
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("novel_grams"), F.lit(0)).alias("novel_grams"),
            F.round(
                F.when(
                    F.col("n_grams") > 0,
                    F.coalesce(F.col("novel_grams"), F.lit(0))
                    / F.col("n_grams").cast("double"),
                ),
                6,
            ).alias("novelty"),
        )
    )


def keyness_by_source(
    documents: DataFrame, top_k: int = 5, min_count: int = 5
) -> DataFrame:
    """Per-source distinctive vocabulary by Dunning log-likelihood
    keyness (G² = 2·[a·ln(a/E_a) + b·ln(b/E_b)], the corpus-linguistics
    standard): for each (source, token), how surprising the token's
    in-source frequency is against the rest of the corpus under the
    pooled rate — the "what is this slice actually about" audit that
    tf-idf's document grain can't give (keyness is SLICE-vs-corpus,
    tf-idf is doc-vs-corpus). Top ``top_k`` tokens per source by G²,
    ranked on round-6 G² with token tie-break (the family's
    determinism convention); tokens rarer than ``min_count`` in-source
    are excluded (G² is unstable at tiny a). Zero counts on either
    side contribute 0 to G² (the x·ln x → 0 limit, guarded).

    Scale shape: one token explode → one (source, token) aggregate →
    token totals by a second aggregate off the first (no re-scan) →
    per-source rank window over the min_count survivors. Vocabulary
    grain, never broadcast. Output: source, token, count_in,
    count_rest, g2, rank."""
    from pyspark.sql.window import Window

    toks = documents.filter(F.col("text").isNotNull()).select(
        "source", F.explode(_norm_tokens()).alias("token")
    )
    st = toks.groupBy("source", "token").agg(F.count("*").alias("a"))
    tok_tot = st.groupBy("token").agg(F.sum("a").alias("t_tok"))
    src_tot = st.groupBy("source").agg(F.sum("a").alias("t_src"))
    grand = st.agg(F.sum("a").alias("t_all"))
    j = (
        st.join(tok_tot, "token")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(grand))
    )
    a = F.col("a").cast("double")
    b = (F.col("t_tok") - F.col("a")).cast("double")
    ta = F.col("t_src").cast("double")
    tb = (F.col("t_all") - F.col("t_src")).cast("double")
    ea = ta * F.col("t_tok").cast("double") / F.col("t_all").cast("double")
    eb = tb * F.col("t_tok").cast("double") / F.col("t_all").cast("double")
    term = lambda x, e: F.when(x > 0, x * F.log(x / e)).otherwise(  # noqa: E731
        F.lit(0.0)
    )
    g2 = F.round(2.0 * (term(a, ea) + term(b, eb)), 6)
    ranked = (
        j.filter(F.col("a") >= min_count)
        .select(
            "source",
            "token",
            F.col("a").cast("long").alias("count_in"),
            (F.col("t_tok") - F.col("a")).cast("long").alias("count_rest"),
            g2.alias("g2"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("g2").desc(), F.col("token").asc()
                )
            ),
        )
        .filter(F.col("rank") <= top_k)
    )
    return ranked.select(
        "source",
        "token",
        "count_in",
        "count_rest",
        "g2",
        F.col("rank").cast("long").alias("rank"),
    )


def source_token_counts(documents: DataFrame) -> DataFrame:
    """(source, token, cnt) unigram counts — the mergeable state grain
    of the keyness-drift monitor (lifetime state = SUM of per-batch
    count frames; summing commutes, so crash-replay and out-of-order
    compaction both reproduce the same totals)."""
    return (
        documents.filter(F.col("text").isNotNull())
        .select("source", F.explode(_norm_tokens()).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("cnt"))
    )


def keyness_drift(
    batch_counts: DataFrame,
    lifetime_counts: DataFrame,
    min_count: int = 5,
    alert_above: float = 20.0,
) -> DataFrame:
    """Per-source vocabulary-drift release (r11, VERDICT r10 next #7):
    Dunning G² of THIS batch's vocabulary against the lifetime index,
    per source — the ingest-gate family member that catches a source
    whose language shifts (template change, spam injection, wrong-site
    crawl) even when volume and quality scores hold steady. For each
    (source, token with batch count ≥ ``min_count``) the 2×2 is
    batch-vs-lifetime WITHIN the source: a = batch count, b = lifetime
    count, column totals = the source's batch/lifetime token masses;
    G²_token = 2·[a·ln(a/E_a) + b·ln(b/E_b)] (x·ln x → 0 guarded).
    Tokens absent from the batch are EXCLUDED by design — the monitor
    is O(batch vocabulary) per release, never O(lifetime vocabulary);
    vocabulary DISAPPEARANCE shows up in the quality-drift monitor's
    distributional stats instead. A source with no lifetime mass
    yields G² = 0 for every token (E_a = a exactly): a brand-new
    source is a different alert class, not drift.

    Determinism (the events_granger convention): each per-token G² is
    one fixed double expression off exact integer counts, rounded to
    6 before any aggregation; the per-source total then sums
    DECIMAL(38,6) — exact and order-independent, so the cross-engine
    hash can't drift on float addition order. Top token ranks on
    (round-6 G² desc, token asc).

    Inputs are (source, token, cnt) frames (:func:`source_token_counts`).
    Output: source, n_batch_tokens, n_lifetime_tokens, n_drift_tokens,
    g2_total, top_token, top_g2, alert (mean G² per tested token >
    ``alert_above``)."""
    from pyspark.sql.window import Window

    b = batch_counts.select("source", "token", F.col("cnt").alias("a"))
    life = lifetime_counts.select(
        "source", "token", F.col("cnt").alias("b")
    )
    bt = b.groupBy("source").agg(F.sum("a").alias("ta"))
    lt = life.groupBy("source").agg(F.sum("b").alias("tb"))
    j = (
        b.filter(F.col("a") >= min_count)
        .join(life, ["source", "token"], "left")
        .join(F.broadcast(bt), "source")
        .join(F.broadcast(lt), "source", "left")
        .na.fill({"b": 0, "tb": 0})
    )
    a = F.col("a").cast("double")
    bb = F.col("b").cast("double")
    ta = F.col("ta").cast("double")
    tb = F.col("tb").cast("double")
    tok_tot = (F.col("a") + F.col("b")).cast("double")
    ea = ta * tok_tot / (ta + tb)
    eb = tb * tok_tot / (ta + tb)
    term = lambda x, e: F.when(  # noqa: E731
        (x > 0) & (e > 0), x * F.log(x / e)
    ).otherwise(F.lit(0.0))
    scored = j.select(
        "source",
        "token",
        "ta",
        "tb",
        F.round(2.0 * (term(a, ea) + term(bb, eb)), 6).alias("g2"),
    )
    agg = scored.groupBy("source", "ta", "tb").agg(
        F.count("*").alias("n_drift_tokens"),
        F.sum(F.col("g2").cast("decimal(38,6)")).alias("g2_dec"),
    )
    top = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("g2").desc(), F.col("token").asc()
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            "source",
            F.col("token").alias("top_token"),
            F.col("g2").alias("top_g2"),
        )
    )
    return agg.join(top, "source").select(
        "source",
        F.col("ta").cast("long").alias("n_batch_tokens"),
        F.col("tb").cast("long").alias("n_lifetime_tokens"),
        F.col("n_drift_tokens").cast("long").alias("n_drift_tokens"),
        F.round(F.col("g2_dec").cast("double"), 6).alias("g2_total"),
        "top_token",
        "top_g2",
        (
            F.col("g2_dec").cast("double") / F.col("n_drift_tokens")
            > alert_above
        ).alias("alert"),
    )


def keyness_drift_split(
    documents: DataFrame, modulo: int = 5, min_count: int = 5
) -> DataFrame:
    """Registered batch twin of the streaming keyness-drift monitor:
    docs with doc_id % ``modulo`` == 0 play the arriving batch, the
    rest the lifetime corpus — the deterministic, scale-stable split
    the oracle mirrors (a fixed doc_id threshold would skew across
    SFs). Gates the G² drift arithmetic; the streaming harness reuses
    it verbatim via :func:`keyness_drift`."""
    batch = documents.filter(F.col("doc_id") % modulo == 0)
    life = documents.filter(F.col("doc_id") % modulo != 0)
    return keyness_drift(
        source_token_counts(batch),
        source_token_counts(life),
        min_count=min_count,
    )


def heaps_law_fit(documents: DataFrame) -> DataFrame:
    """Heaps/Herdan law fit of vocabulary growth: V(N) ≈ K·N^β over
    the corpus read in doc_id order — the "how fast does new
    vocabulary appear" exponent that sizes tokenizer vocabularies and
    predicts how much unseen-token mass more data buys (β ≈ 0.5 for
    natural text; β → 0 means the corpus is saturating, β → 1 means
    near-random token soup). Companion of zipf_fit (frequency law) and
    vocab_richness (asymptote estimates): Heaps gives the GROWTH
    CURVE.

    Construction: a token's first-seen doc rides min(doc_id) on the
    same vocabulary-grain aggregate that counts it (the novelty
    min-carry trick); per-doc new-type and total-token counts then
    take two exact range-exchange cumsums (exact_global_cumsum — no
    single-partition window), and the β/K fit is log-log OLS over the
    per-doc (N, V) points. ln() of identical exact integers is
    engine-identical; the co-moment sums are doubles (round-6 output
    absorbs order effects, the unigram_logprob contract). Output: one
    row — n_docs, total_tokens, vocab, beta, k, r2."""
    from ..pipelines.util import exact_global_cumsum

    toks = documents.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(_norm_tokens()).alias("token")
    )
    per_doc_tokens = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_toks")
    )
    first_seen = toks.groupBy("token").agg(
        F.min("doc_id").alias("first_doc")
    )
    new_types = first_seen.groupBy(
        F.col("first_doc").alias("doc_id")
    ).agg(F.count("*").alias("new_types"))
    base = per_doc_tokens.join(new_types, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.coalesce(F.col("new_types"), F.lit(0)).alias("new_types"),
    )
    cum = exact_global_cumsum(
        base,
        [F.col("doc_id").asc()],
        F.col("n_toks").cast("decimal(38,0)"),
        cum_col="n_cum",
    )
    cum2 = exact_global_cumsum(
        cum,
        [F.col("doc_id").asc()],
        F.col("new_types").cast("decimal(38,0)"),
        cum_col="v_cum",
    )
    pts = cum2.filter(
        (F.col("n_cum") > 0) & (F.col("v_cum") > 0)
    ).select(
        F.log(F.col("n_cum").cast("double")).alias("x"),
        F.log(F.col("v_cum").cast("double")).alias("y"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    totals = cum2.agg(
        F.count("*").alias("n_docs"),
        F.max(F.col("n_cum").cast("long")).alias("total_tokens"),
        F.max(F.col("v_cum").cast("long")).alias("vocab"),
    )
    nn = F.col("n").cast("double")
    sxx_c = nn * F.col("sxx") - F.col("sx") * F.col("sx")
    syy_c = nn * F.col("syy") - F.col("sy") * F.col("sy")
    sxy_c = nn * F.col("sxy") - F.col("sx") * F.col("sy")
    beta = F.when(sxx_c > 0, sxy_c / sxx_c)
    log_k = (F.col("sy") - beta * F.col("sx")) / nn
    r2 = F.when(
        (sxx_c > 0) & (syy_c > 0), sxy_c * sxy_c / (sxx_c * syy_c)
    )
    return (
        m.crossJoin(F.broadcast(totals))
        .select(
            "n_docs",
            "total_tokens",
            "vocab",
            F.round(beta, 6).alias("beta"),
            F.round(F.exp(log_k), 6).alias("k"),
            F.round(r2, 6).alias("r2"),
        )
    )


def source_jsd(documents: DataFrame) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between sources' unigram
    distributions — the symmetric, bounded (≤ ln 2) "how different do
    these two slices read" matrix that keyness can't give (keyness
    ranks tokens; JSD scores the whole distribution). Used to spot
    near-duplicate sources (mirrors, scrapes) and to diversity-weight
    a source mix.

    Determinism: per-shared-token terms are single double expressions
    off exact integer counts, rounded to 6 BEFORE a DECIMAL(38,6) sum;
    the non-shared mass needs no token scan — tokens in a but not b
    have m = p/2, so their total contribution is 0.5·ln2·(1 − Sp_shared)
    with Sp_shared = (shared_cnt_a / tot_a) derived ONCE from exact
    integer sums (and symmetrically for b). Pairs with no shared
    vocabulary come from the source-dim scaffold (left join) and score
    exactly ln 2.

    Scale shape: one (source, token) aggregate, one token-keyed
    self-join whose fan-out is (sources containing the token)² —
    source-dim-bounded per token, never corpus-bounded; the scaffold
    is a broadcast of the source dim. Output: source_a, source_b,
    shared_tokens, jsd."""
    import math

    st = source_token_counts(documents)
    tot = st.groupBy("source").agg(F.sum("cnt").alias("tot"))
    a = st.select(
        F.col("source").alias("source_a"),
        "token",
        F.col("cnt").alias("cnt_a"),
    )
    b = st.select(
        F.col("source").alias("source_b"),
        "token",
        F.col("cnt").alias("cnt_b"),
    )
    ta = tot.select(
        F.col("source").alias("source_a"), F.col("tot").alias("tot_a")
    )
    tb = tot.select(
        F.col("source").alias("source_b"), F.col("tot").alias("tot_b")
    )
    shared = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
    )
    p = F.col("cnt_a").cast("double") / F.col("tot_a").cast("double")
    q = F.col("cnt_b").cast("double") / F.col("tot_b").cast("double")
    m = (p + q) / 2.0
    term = F.round(0.5 * (p * F.log(p / m) + q * F.log(q / m)), 6)
    sh_agg = shared.groupBy("source_a", "source_b").agg(
        F.count("*").alias("shared_tokens"),
        F.sum(term.cast("decimal(38,6)")).alias("jsd_shared"),
        F.sum("cnt_a").cast("long").alias("shared_cnt_a"),
        F.sum("cnt_b").cast("long").alias("shared_cnt_b"),
    )
    srcs = tot.select("source")
    scaffold = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            srcs.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
    )
    j = scaffold.join(sh_agg, ["source_a", "source_b"], "left").na.fill(
        {"shared_tokens": 0, "shared_cnt_a": 0, "shared_cnt_b": 0}
    )
    ln2 = F.lit(math.log(2.0))
    miss = F.round(
        0.5
        * ln2
        * (
            (F.col("tot_a") - F.col("shared_cnt_a")).cast("double")
            / F.col("tot_a").cast("double")
            + (F.col("tot_b") - F.col("shared_cnt_b")).cast("double")
            / F.col("tot_b").cast("double")
        ),
        6,
    )
    return j.select(
        "source_a",
        "source_b",
        F.col("shared_tokens").cast("long").alias("shared_tokens"),
        F.round(
            F.coalesce(
                F.col("jsd_shared").cast("double"), F.lit(0.0)
            )
            + miss,
            6,
        ).alias("jsd"),
    )
