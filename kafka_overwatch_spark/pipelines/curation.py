"""End-to-end training-data curation: quality filter → exact dedup →
split assignment, fused into one pipeline (the composition a real corpus
build runs nightly — proves the north-star ops compose, not just run
standalone).

Physical shape (the 100 TB story): every per-document signal — quality
metrics, content fingerprint, split bucket — is computed in ONE narrow
map over the documents scan (no self-joins between the stages). The only
shuffle is the dedup keeper election: a window over the content
fingerprint, which is also exactly the shuffle the standalone exact-dedup
op pays. Filters run before the shuffle, so low-quality documents never
enter the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _norm_text
from .sampling import hash_bucket, split_expr
from .text import quality_columns
from .util import spread

QUALITY_THRESHOLD = 0.5


def curate(
    documents: DataFrame, quality_threshold: float = QUALITY_THRESHOLD
) -> DataFrame:
    """The curated corpus: documents that (a) score at or above the
    quality threshold and (b) are the keeper (min doc_id) of their
    exact-content group, each tagged with a reproducible train/val/test
    split. Duplicate elimination runs on the quality-surviving set, so a
    low-quality keeper never shadows a high-quality duplicate.
    """
    cols = quality_columns()
    bucket = hash_bucket(F.col("doc_id"), "split")
    # fingerprint MUST stay byte-identical to dedup_exact_keep's —
    # shared normalization, not a local copy
    enriched = spread(documents).select(
        "doc_id",
        cols["n_tokens"].alias("n_tokens"),
        cols["quality_score"].alias("quality_score"),
        F.md5(_norm_text()).alias("fingerprint"),
        split_expr(bucket).alias("split"),
    )
    survivors = enriched.filter(
        F.col("quality_score") >= quality_threshold
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "split", "n_tokens", "quality_score")
    )


def source_quality_summary(documents: DataFrame) -> DataFrame:
    """Per-source corpus health rollup — the dashboard a data-sourcing
    team watches: document count, mean quality score, language spread,
    and how many of the source's documents are exact duplicates of
    something in the corpus (dup_docs / dup_frac).

    Scale shape: one narrow map computes quality + fingerprint; the dup
    flag is a fingerprint-keyed window count (same shuffle the dedup
    family pays); the final rollup is dim-sized (one row per source)."""
    cols = quality_columns()
    enriched = spread(documents).select(
        "doc_id",
        "source",
        "lang",
        cols["quality_score"].alias("quality_score"),
        F.md5(_norm_text()).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint")
    flagged = enriched.withColumn(
        "is_dup", (F.count("*").over(w) > 1).cast("int")
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("quality_score"), 6).alias("mean_quality"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.sum("is_dup").cast("long").alias("dup_docs"),
        F.round(F.sum("is_dup") / F.count("*"), 6).alias("dup_frac"),
    )


def curate_semantic(
    documents: DataFrame,
    embeddings: DataFrame,
    quality_threshold: float = QUALITY_THRESHOLD,
    bits: int | None = None,
) -> DataFrame:
    """The full production curation chain: quality gate → exact-dedup
    keeper → EMBEDDING semantic-dedup keeper → split tag. Documents and
    embeddings are linked 1:1 on doc_id == vec_id (the fixture's
    convention; a real pipeline carries the id through its embedding
    job). Iterative inside (connected components) → rows-only gate.

    Scale shape: `curate` is one narrow map + one fingerprint shuffle;
    the semantic keep-set adds the LSH bucket join + O(log d) component
    rounds over the PAIR graph (pairs ≪ corpus); the final semi-join is
    keyed by doc_id."""
    from .dedup import embedding_semantic_dedup

    base = curate(documents, quality_threshold)
    keepers = (
        embedding_semantic_dedup(embeddings, bits=bits)
        .filter(F.col("keep"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    return base.join(keepers, "doc_id", "semi")


def dataset_card(documents: DataFrame) -> DataFrame:
    """The corpus "dataset card" — one row of whole-dataset scalars, the
    documents-family analog of the K1 cluster report: inventory (docs,
    sources, languages, chars, tokens), exact-duplication rate, and the
    Gopher-gate keep rate. Every ingredient reuses the SAME expression
    its per-doc surface uses (`dedup._norm_text` fingerprint,
    `text.gopher_flag_columns`) so a card number can never disagree with
    the query it summarizes.

    Physical shape: ONE narrow per-doc projection followed by ONE global
    aggregation — count_distinct carries the two dim-ish keys (source,
    lang) and the md5 fingerprint; at 100 TB the fingerprint distinct is
    the only corpus-cardinality shuffle, the same one exact dedup
    already pays (share the pass in a real deployment)."""
    from pyspark.sql import functions as F

    from .dedup import _norm_text
    from .text import _norm_tokens, gopher_flag_columns
    from .util import spread

    flags = gopher_flag_columns()
    keep = None
    for c in flags.values():
        keep = c if keep is None else keep & c
    per_doc = spread(documents).select(
        "doc_id",
        "source",
        "lang",
        F.col("n_chars"),
        F.size(_norm_tokens()).alias("n_tokens"),
        F.md5(_norm_text()).alias("fingerprint"),
        keep.cast("long").alias("keep"),
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg(F.col("n_tokens").cast("double")), 6).alias(
            "mean_tokens"
        ),
        F.count_distinct("fingerprint").alias("distinct_fingerprints"),
        (F.count("*") - F.count_distinct("fingerprint")).alias("dup_docs"),
        F.sum("keep").alias("gopher_keep_docs"),
        F.round(
            F.sum("keep").cast("double") / F.count("*"), 6
        ).alias("gopher_keep_frac"),
    )


def lang_source_association(documents: DataFrame) -> DataFrame:
    """Chi-square contingency profile of the (lang × source) grid: per
    cell, observed count, expected count under independence
    (row_total × col_total / N), and the χ² contribution — the corpus
    "is language balanced across sources?" audit. Sparse contingency:
    only OBSERVED cells appear; a zero-observed (lang, source)
    combination contributes no row (its expected-only χ² mass is the
    consumer's margin arithmetic, not a stored row).

    One count aggregation + two broadcast margin frames — the χ²
    arithmetic is a narrow map over the dim-sized cell table. Doubles
    rounded to 6."""
    cells = documents.groupBy("lang", "source").agg(
        F.count("*").alias("observed")
    )
    lang_m = cells.groupBy("lang").agg(F.sum("observed").alias("lang_total"))
    src_m = cells.groupBy("source").agg(F.sum("observed").alias("src_total"))
    total = cells.agg(F.sum("observed").alias("total"))
    expected = (
        F.col("lang_total").cast("double")
        * F.col("src_total").cast("double")
        / F.col("total").cast("double")
    )
    return (
        cells.join(F.broadcast(lang_m), "lang")
        .join(F.broadcast(src_m), "source")
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "observed",
            F.round(expected, 6).alias("expected"),
            F.round(
                F.pow(F.col("observed") - expected, F.lit(2.0)) / expected, 6
            ).alias("chi2_term"),
        )
    )


def split_drift_psi(documents: DataFrame) -> DataFrame:
    """Population Stability Index between the train and val hash splits
    over 16-token length buckets — the drift gate a dataset release
    runs before shipping a new split: PSI = Σ (p_a − p_b)·ln(p_a/p_b)
    per bucket (summed by the consumer; emitted per bucket here so the
    offending buckets are visible). Laplace-smoothed bucket shares
    ((n+1)/(N+B)) keep empty buckets finite in both engines.

    The split is the SAME deterministic hash assignment
    `deterministic_split` ships, so this query audits exactly what the
    split produces — no re-derivation drift. One narrow projection, two
    bucket aggregations, a dim-sized join."""
    from .sampling import hash_bucket, split_expr
    from .text import _norm_tokens

    bucket = hash_bucket(F.col("doc_id"), "split")
    tagged = documents.select(
        "doc_id",
        split_expr(bucket).alias("split"),
        (F.size(_norm_tokens()) - F.size(_norm_tokens()) % 16).alias(
            "len_bucket"
        ),
    ).filter(F.col("split").isin("train", "val"))
    counts = tagged.groupBy("split", "len_bucket").agg(
        F.count("*").alias("n")
    )
    a = counts.filter(F.col("split") == "train").select(
        "len_bucket", F.col("n").alias("n_train")
    )
    b = counts.filter(F.col("split") == "val").select(
        "len_bucket", F.col("n").alias("n_val")
    )
    joined = a.join(b, "len_bucket", "full_outer").select(
        "len_bucket",
        F.coalesce("n_train", F.lit(0)).alias("n_train"),
        F.coalesce("n_val", F.lit(0)).alias("n_val"),
    )
    totals = joined.agg(
        F.sum("n_train").alias("t_train"),
        F.sum("n_val").alias("t_val"),
        F.count("*").alias("n_buckets"),
    )
    p_a = (F.col("n_train") + 1).cast("double") / (
        F.col("t_train") + F.col("n_buckets")
    )
    p_b = (F.col("n_val") + 1).cast("double") / (
        F.col("t_val") + F.col("n_buckets")
    )
    return joined.crossJoin(F.broadcast(totals)).select(
        F.col("len_bucket").cast("long").alias("len_bucket"),
        "n_train",
        "n_val",
        F.round((p_a - p_b) * F.log(p_a / p_b), 6).alias("psi_term"),
    )


def split_leakage_audit(
    documents: DataFrame,
    docs: DataFrame | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Train/eval split-leakage audit: near-duplicate pairs that CROSS
    the split boundary (an eval doc ≥ JACCARD_THRESHOLD similar to a
    train doc) — the eval-integrity check a training pipeline runs
    before trusting any benchmark number, because hash-random splits
    happily put both copies of a near-dup on opposite sides.

    Composition of the engine's own primitives: the deterministic hash
    split (sampling.deterministic_split) + the banded-minhash corpus
    screen (dedup.screen_against_corpus) with train as the corpus side
    and val/test as the probe side — so at 100 TB it inherits the
    screen's shape (keyed band join + exact verify, never all-pairs).
    The probe side here is a CONSTANT FRACTION of the corpus, not an
    ingest micro-batch, so the screen runs with broadcast_probe=False
    (ADVICE r6): both probe attaches are keyed shuffle joins.
    Candidate recall is the screen's banding s-curve at the 0.5
    threshold (the same property dedup_minhash_lsh is oracle-proven
    under). Output: eval_doc, eval_split, train_doc, jaccard."""
    from .dedup import screen_against_corpus, shingle_docs

    from .sampling import deterministic_split

    if docs is None:
        docs = shingle_docs(documents)
    splits = deterministic_split(documents).select("doc_id", "split")
    sh = docs.join(splits, "doc_id")
    train = sh.filter(F.col("split") == "train").select("doc_id", "sh")
    ev = sh.filter(F.col("split") != "train").select(
        "doc_id", "sh", "split"
    )
    # band values are per-doc, so a memoized whole-corpus band frame
    # (registry.get_minhash_bands) sliced by split membership equals
    # in-query derivation — neither side re-runs the signature chain
    corpus_bands = new_bands = None
    if bands is not None:
        with_split = bands.join(splits, "doc_id")
        corpus_bands = with_split.filter(
            F.col("split") == "train"
        ).select("doc_id", "band_id", "band_key")
        new_bands = with_split.filter(F.col("split") != "train").select(
            "doc_id", "band_id", "band_key"
        )
    hits = screen_against_corpus(
        ev.select("doc_id", "sh"),
        train,
        corpus_bands=corpus_bands,
        new_bands=new_bands,
        broadcast_probe=False,
    )
    return (
        hits.join(
            ev.select(
                F.col("doc_id").alias("new_doc"),
                F.col("split").alias("eval_split"),
            ),
            "new_doc",
        )
        .select(
            F.col("new_doc").alias("eval_doc"),
            "eval_split",
            F.col("corpus_doc").alias("train_doc"),
            "jaccard",
        )
    )


def source_overlap_matrix(documents: DataFrame) -> DataFrame:
    """Cross-source exact-duplicate overlap matrix: for every ordered
    source pair (src_a ≤ src_b, self-pairs included), how many distinct
    normalized-text fingerprints appear in BOTH — the dataset-report
    diagnostic for which sources copy from which (mirror sites, scraped
    re-posts, benchmark text syndicated across crawls). The self-pair
    row counts fingerprints the source holds at all, giving the
    marginals the off-diagonal cells are read against.

    Scale shape: one distinct on (source, fingerprint) — the only
    data-sized shuffle, keyed on the 128-bit fingerprint — then a
    fingerprint-keyed self-join whose per-key fan-out is bounded by
    |sources|² (sources are a bounded dimension, so a fingerprint
    shared by every source still produces only |sources|² rows), and a
    |sources|²-sized aggregate. No broadcast of anything corpus-sized.
    Output: src_a, src_b, shared_fingerprints."""
    fp = (
        documents.select(
            "source", F.md5(_norm_text()).alias("fingerprint")
        )
        .distinct()
    )
    a = fp.select(F.col("source").alias("src_a"), "fingerprint")
    b = fp.select(F.col("source").alias("src_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("src_a") <= F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("shared_fingerprints"))
    )


def curate_corpus_artifacts(
    documents: DataFrame,
    out_dir: str,
    quality_threshold: float = QUALITY_THRESHOLD,
) -> dict:
    """End-to-end corpus curation with a written artifact set — the
    composition a training-data team actually ships, as one call:

    quality gate → exact-dedup keeper (``curate``) → FUZZY-dedup keeper
    (``dedup.minhash_fuzzy_dedup`` cluster minima, semi-joined like
    ``curate_semantic``'s embedding keep-set) → artifacts:

    - ``corpus/``    kept docs (full text + split/quality columns),
                     parquet partitioned by split
    - ``rejected/``  every dropped doc_id with its FIRST failing stage
                     (quality_fail | exact_dup | fuzzy_dup)
    - ``card.json``  dataset card of the KEPT corpus
    - ``manifest.json`` per-stage counts (the audit trail)

    Returns the manifest dict. Scale shape: each stage is the already-
    audited plan of its operator; the composition adds only doc_id-keyed
    semi/anti joins, and every artifact write is a distributed parquet
    write (the card's one row and the manifest are the only driver-side
    values)."""
    import json as _json
    import os as _os

    from .dedup import minhash_fuzzy_dedup
    from .text import quality_columns as _qc

    total = documents.count()
    # localCheckpoint each stage frame: five artifacts/counts consume
    # them, and the full-corpus quality+fingerprint pass must run once,
    # not once per action (same convention as the streaming screens)
    scored = (
        spread(documents)
        .select("doc_id", _qc()["quality_score"].alias("quality_score"))
        .localCheckpoint(eager=True)
    )
    # null-safe: a NULL-text doc has a NULL score — it has no scoreable
    # content, so it fails the quality gate (a plain `< threshold`
    # filter would drop it from EVERY stage and the remainder bucket
    # would mislabel it exact_dup)
    quality_fail = scored.filter(
        ~(F.col("quality_score") >= quality_threshold)
        | F.col("quality_score").isNull()
    ).select("doc_id")
    base = curate(documents, quality_threshold).localCheckpoint(
        eager=True
    )  # quality ∧ exact-keeper
    exact_dup = (
        scored.join(quality_fail, "doc_id", "left_anti")
        .join(base.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id")
    )
    # fuzzy clusters among the BASE SURVIVORS — not the full corpus: a
    # quality-rejected (or exact-dropped) cluster keeper must never
    # shadow its quality-passing near-dups (the same
    # quality-surviving-set principle curate() applies to exact dedup)
    fuzzy_keepers = (
        minhash_fuzzy_dedup(
            documents.join(base.select("doc_id"), "doc_id", "semi")
        )
        .filter(F.col("keep"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    kept_ids = base.join(
        fuzzy_keepers, "doc_id", "semi"
    ).localCheckpoint(eager=True)
    fuzzy_dup = base.select("doc_id").join(
        fuzzy_keepers, "doc_id", "left_anti"
    )
    kept = documents.join(
        kept_ids.select("doc_id", "split", "n_tokens", "quality_score"),
        "doc_id",
    )
    rejected = (
        quality_fail.withColumn("reason", F.lit("quality_fail"))
        .unionByName(exact_dup.withColumn("reason", F.lit("exact_dup")))
        .unionByName(fuzzy_dup.withColumn("reason", F.lit("fuzzy_dup")))
    )
    kept.write.mode("overwrite").partitionBy("split").parquet(
        f"{out_dir}/corpus"
    )
    rejected.write.mode("overwrite").parquet(f"{out_dir}/rejected")
    card = dataset_card(kept.drop("split", "n_tokens", "quality_score"))
    card_row = card.collect()[0].asDict()
    with open(_os.path.join(out_dir, "card.json"), "w") as fh:
        _json.dump(card_row, fh, indent=1, sort_keys=True, default=str)
    manifest = {
        "total_docs": total,
        "quality_fail": quality_fail.count(),
        "exact_dup": exact_dup.count(),
        "fuzzy_dup": fuzzy_dup.count(),
        "kept": kept_ids.count(),
        "quality_threshold": quality_threshold,
    }
    with open(_os.path.join(out_dir, "manifest.json"), "w") as fh:
        _json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest
