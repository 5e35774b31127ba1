"""Property-based checks (hypothesis): Spark text/dedup operators vs
straight-Python reimplementations on generated documents. Few examples,
batched per example — each example is a Spark job."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

WORD = st.text(
    alphabet=st.sampled_from("abcdefg xyz.,!0123456789"), min_size=1, max_size=12
)
TEXTS = st.lists(
    WORD.filter(lambda s: s.strip()), min_size=1, max_size=25
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_token_stats_matches_python(spark, texts):
    from kafka_overwatch_spark.pipelines.text import token_stats

    rows = {r["doc_id"]: r for r in token_stats(_df(spark, texts)).collect()}
    for i, t in enumerate(texts):
        ws = re.split(r"\s+", t.strip())
        assert rows[i]["ws_tokens"] == len(ws)
        assert rows[i]["distinct_tokens"] == len(set(ws))
        regex_toks = re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]", t)
        assert rows[i]["regex_tokens"] == len(regex_toks)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_fingerprint_md5_matches_python(spark, texts):
    from kafka_overwatch_spark.pipelines.text import fingerprints

    rows = {r["doc_id"]: r for r in fingerprints(_df(spark, texts)).collect()}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.strip()).lower()
        assert rows[i]["content_md5"] == hashlib.md5(norm.encode()).hexdigest()
        bag = " ".join(sorted(set(norm.split(" "))))
        assert rows[i]["bag_fingerprint"] == hashlib.md5(bag.encode()).hexdigest()


def test_redact_pii_counts_and_replacement(spark):
    from kafka_overwatch_spark.pipelines.text import redact_pii

    texts = [
        "mail me at a.b+c@test.org or x@y.io today",
        "see https://ex.com/a?b=1 and http://10.0.0.1/p from 192.168.0.1",
        "plain text, no pii at all",
    ]
    rows = {r["doc_id"]: r for r in redact_pii(_df(spark, texts)).collect()}
    assert (rows[0]["n_email"], rows[0]["n_url"], rows[0]["n_ipv4"]) == (2, 0, 0)
    # the ip inside the url is swallowed by the url pattern count-wise? No:
    # counts are on the ORIGINAL text, so 10.0.0.1 and 192.168.0.1 both hit
    assert (rows[1]["n_email"], rows[1]["n_url"], rows[1]["n_ipv4"]) == (0, 2, 2)
    assert (rows[2]["n_email"], rows[2]["n_url"], rows[2]["n_ipv4"]) == (0, 0, 0)
    # replacement witness: md5 of the fully-redacted strings
    expected = [
        "mail me at <EMAIL> or <EMAIL> today",
        "see <URL> and <URL> from <IPV4>",
        "plain text, no pii at all",
    ]
    for i, exp in enumerate(expected):
        assert rows[i]["redacted_md5"] == hashlib.md5(exp.encode()).hexdigest()


def test_repetition_stats_known_values(spark):
    from kafka_overwatch_spark.pipelines.text import repetition_stats

    texts = [
        "a b a b a b",        # 2-grams: ab ba ab ba ab → top ab=3/5
        "x y z w",            # all grams unique
        "q",                  # too short: no 2-grams → dropped
    ]
    rows = {r["doc_id"]: r for r in repetition_stats(_df(spark, texts)).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["n2_total"] == 5
    assert rows[0]["top_2gram_frac"] == round(3 / 5, 6)
    # distinct 2-grams = {a b, b a} → dup frac = 1 - 2/5
    assert rows[0]["dup_2gram_frac"] == round(1 - 2 / 5, 6)
    assert rows[0]["n3_total"] == 4
    assert rows[1]["top_2gram_frac"] == round(1 / 3, 6)
    assert rows[1]["dup_2gram_frac"] == 0.0


def test_contamination_probe_overlap(spark):
    from kafka_overwatch_spark.pipelines.text import contamination

    # doc_id 0 and 97 are probes (mod 97); doc 1 shares a 3-gram with doc
    # 0, doc 2 shares none, probe self-matches are excluded
    rows_in = [
        (0, "alpha beta gamma delta", "en", "s", 1),
        (1, "zz alpha beta gamma yy", "en", "s", 1),
        (2, "one two three four five", "en", "s", 1),
        (97, "one two three six seven", "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows_in, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    rows = {r["doc_id"]: r for r in contamination(df).collect()}
    # doc 1: hits 'alpha beta gamma' + 'beta gamma delta'? no — only the
    # grams doc 1 itself contains: 'alpha beta gamma' → 1 of its 3 grams
    assert rows[1]["hit_grams"] == 1 and rows[1]["probe_docs"] == 1
    assert rows[1]["contamination_frac"] == round(1 / 3, 6)
    # doc 2 overlaps probe 97 on 'one two three' (1 of 3 grams)
    assert rows[2]["hit_grams"] == 1 and rows[2]["probe_docs"] == 1
    # probes never self-match; 0 and 97 share no gram with the OTHER probe
    assert 0 not in rows and 97 not in rows


@settings(max_examples=4, deadline=None)
@given(TEXTS)
def test_exact_dedup_partitions_docs(spark, texts):
    """Keep-set and dup groups partition the corpus: every doc is either a
    keeper or a member of a group with a smaller keeper."""
    from kafka_overwatch_spark.pipelines.dedup import (
        exact_dedup_keep,
        exact_duplicates,
    )

    df = _df(spark, texts)
    keep = {r["doc_id"] for r in exact_dedup_keep(df).collect()}
    groups = exact_duplicates(df).collect()
    norm = [re.sub(r"\s+", " ", t.strip()).lower() for t in texts]
    for i in range(len(texts)):
        first = norm.index(norm[i])
        assert (i in keep) == (first == i)
    assert sum(g["dup_count"] for g in groups) == sum(
        1 for i in range(len(texts)) if norm.count(norm[i]) > 1
    )


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000_000), min_size=2, max_size=40
    )
)
def test_sessionize_gap_count(spark, offsets):
    """Sessions per user == 1 + gaps > threshold (single-user case)."""
    from kafka_overwatch_spark.operators.relational import sessionize_events

    import datetime

    base = datetime.datetime(2024, 1, 1)
    ts = sorted(offsets)
    rows = [
        (i, base + datetime.timedelta(seconds=s), 7, "click", 1.0, "{}")
        for i, s in enumerate(ts)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = sessionize_events(df, gap_seconds=3600).collect()
    gaps = sum(1 for a, b in zip(ts, ts[1:]) if b - a > 3600)
    assert len(out) == gaps + 1
    assert sum(r["events"] for r in out) == len(ts)


def test_tfidf_top_terms_known_values(spark):
    import math

    from kafka_overwatch_spark.pipelines.text import tfidf_top_terms

    texts = [
        "apple apple banana common",
        "cherry common banana",
        "date common",
    ]
    rows = tfidf_top_terms(_df(spark, texts), k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: apple tf=2 df=1 → 2*ln(3); banana tf=1 df=2 → ln(1.5);
    # common tf=1 df=3 → 0. Top-2 = apple, banana.
    d0 = sorted(by_doc[0], key=lambda r: r["rank"])
    assert [r["token"] for r in d0] == ["apple", "banana"]
    assert d0[0]["tfidf"] == round(2 * math.log(3.0), 6)
    assert d0[1]["tfidf"] == round(math.log(1.5), 6)
    # doc 2: date (ln 3) then common (0)
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert [r["token"] for r in d2] == ["date", "common"]
    assert d2[1]["tfidf"] == 0.0


def test_incremental_screen_consistent_with_full_lsh(spark, snaps):
    """The incremental screen over the (corpus | new) split finds exactly
    the cross-set pairs the full-corpus LSH finds (bucket skew guard
    never trips at this size, so the candidate sets coincide)."""
    from kafka_overwatch_spark.pipelines.dedup import (
        INCREMENTAL_SPLIT_DOC_ID,
        incremental_minhash_screen,
        minhash_lsh_pairs,
    )

    docs = spark.table("documents")
    full = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]), r["jaccard"])
        for r in minhash_lsh_pairs(docs).collect()
        if (r["doc_a"] < INCREMENTAL_SPLIT_DOC_ID)
        != (r["doc_b"] < INCREMENTAL_SPLIT_DOC_ID)
    }
    incr = {
        (min(r["new_doc"], r["corpus_doc"]),
         max(r["new_doc"], r["corpus_doc"]), r["jaccard"])
        for r in incremental_minhash_screen(docs).collect()
    }
    assert incr == full
    assert len(incr) > 0


@settings(max_examples=4, deadline=None)
@given(TEXTS)
def test_repetition_stats_match_python(spark, texts):
    from collections import Counter

    from kafka_overwatch_spark.pipelines.text import repetition_stats

    rows = {r["doc_id"]: r for r in repetition_stats(_df(spark, texts)).collect()}
    for i, t in enumerate(texts):
        toks = re.sub(r"\s+", " ", t.strip()).lower().split(" ")
        for n in (2, 3):
            grams = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
            if not grams:
                assert i not in rows or rows[i][f"n{n}_total"] is None
                continue
            c = Counter(grams)
            r = rows[i]
            assert r[f"n{n}_total"] == len(grams)
            assert r[f"top_{n}gram_frac"] == round(max(c.values()) / len(grams), 6)
            assert r[f"dup_{n}gram_frac"] == round(1 - len(c) / len(grams), 6)


@settings(max_examples=4, deadline=None)
@given(TEXTS)
def test_typicality_matches_python(spark, texts):
    import math
    from collections import Counter

    from kafka_overwatch_spark.pipelines.text import typicality_scores

    rows = {r["doc_id"]: r for r in typicality_scores(_df(spark, texts)).collect()}
    all_grams = Counter()
    per_doc = {}
    for i, t in enumerate(texts):
        toks = re.sub(r"\s+", " ", t.strip()).lower().split(" ")
        grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        per_doc[i] = grams
        all_grams.update(grams)
    for i, grams in per_doc.items():
        if not grams:
            assert i not in rows
            continue
        want = sum(math.log2(all_grams[g]) for g in grams) / len(grams)
        assert rows[i]["n_grams"] == len(grams)
        assert abs(rows[i]["typicality"] - round(want, 6)) <= 1e-6


def test_line_dedup_known_values(spark):
    """Hand-built corpus: doc 0 and doc 1 share their first 5-token
    segment; doc 2 is unrelated. The shared line must be flagged in both
    carriers, the kept text witness must equal the python fold."""
    from kafka_overwatch_spark.pipelines.text import line_dedup

    shared = "a b c d e"
    texts = [
        shared + " unique0 tail0 x0 y0 z0",
        shared + " unique1 tail1 x1 y1 z1",
        "totally different words here now and more words beyond",
    ]
    rows = {
        r["doc_id"]: r
        for r in line_dedup(_df(spark, texts)).collect()
    }
    # each doc chunks into ceil(10/5)=2 lines
    assert all(rows[i]["n_lines"] == 2 for i in range(3))
    assert rows[0]["dup_lines"] == 1 and rows[1]["dup_lines"] == 1
    assert rows[2]["dup_lines"] == 0
    # witness: doc 0 keeps only its second line; doc 2 keeps both
    kept0 = hashlib.md5("unique0 tail0 x0 y0 z0".encode()).hexdigest()
    assert rows[0]["kept_md5"] == kept0
    kept2 = hashlib.md5(
        "totally different words here now\nand more words beyond".encode()
    ).hexdigest()
    assert rows[2]["kept_md5"] == kept2
    # all-dup doc: identical pair → every line dup → md5 of empty string
    all_dup = line_dedup(
        _df(spark, ["p q r s t", "p q r s t"])
    ).collect()
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert all(
        r["dup_lines"] == r["n_lines"] and r["kept_md5"] == empty_md5
        for r in all_dup
    )


def test_vocab_and_length_histogram_match_python(spark):
    from kafka_overwatch_spark.pipelines.text import (
        length_histogram,
        vocab_stats,
    )

    texts = ["a b a c", "b b b", "a"]
    vs = {r["lang"]: r for r in vocab_stats(_df(spark, texts)).collect()}
    # corpus: a×3 b×4 c×1 → 8 tokens, 3 types, 1 hapax
    assert vs["en"]["total_tokens"] == 8
    assert vs["en"]["distinct_types"] == 3
    assert vs["en"]["hapax_types"] == 1
    hist = {
        r["bucket_lo"]: r
        for r in length_histogram(_df(spark, texts)).collect()
    }
    # all three docs have <16 tokens → one bucket [0,16)
    assert hist[0]["docs"] == 3 and hist[0]["total_tokens"] == 8
    assert hist[0]["min_tokens"] == 1 and hist[0]["max_tokens"] == 4


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_line_dedup_matches_python(spark, texts):
    """Property: line_dedup equals a straight-Python fold of the same
    rule (5-token segment lines, drop lines in ≥2 distinct docs) on
    arbitrary generated corpora."""
    from collections import defaultdict

    from kafka_overwatch_spark.pipelines.text import line_dedup

    def norm_toks(t):
        return re.sub(r"\s+", " ", t.strip()).lower().split(" ")

    def lines_of(t):
        toks = norm_toks(t)
        n = (len(toks) + 4) // 5
        return [" ".join(toks[i * 5:(i + 1) * 5]) for i in range(n)]

    docs_of = defaultdict(set)
    for i, t in enumerate(texts):
        for ln in lines_of(t):
            docs_of[ln].add(i)
    rows = {r["doc_id"]: r for r in line_dedup(_df(spark, texts)).collect()}
    for i, t in enumerate(texts):
        lns = lines_of(t)
        dup = [ln for ln in lns if len(docs_of[ln]) >= 2]
        kept = "\n".join(ln for ln in lns if len(docs_of[ln]) < 2)
        assert rows[i]["n_lines"] == len(lns)
        assert rows[i]["dup_lines"] == len(dup)
        assert rows[i]["kept_md5"] == hashlib.md5(kept.encode()).hexdigest()


def test_asof_attribution_inclusive_tie_matches_duckdb(spark):
    """ASOF `v.ts <= p.ts` is INCLUSIVE: a view at exactly the purchase
    timestamp must be the match regardless of event-id order. Built
    frame with ties checked against DuckDB's native ASOF LEFT JOIN."""
    import duckdb

    from kafka_overwatch_spark.operators.relational import asof_attribution

    rows = [
        # purchase id 1 and view id 5 share ts 1000s — view must match
        (5, "2024-01-01 00:16:40.000000", 1, "view"),
        (1, "2024-01-01 00:16:40.000000", 1, "purchase"),
        # ordinary prior view
        (6, "2024-01-01 00:10:00.000000", 2, "view"),
        (2, "2024-01-01 00:20:00.000000", 2, "purchase"),
        # purchase with NO prior view → null match
        (3, "2024-01-01 00:01:00.000000", 3, "purchase"),
        (7, "2024-01-01 00:02:00.000000", 3, "view"),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, et, 0.0, "{}") for (i, t, u, et) in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id",
        "event_type", "value", "props",
    )
    got = sorted(map(tuple, asof_attribution(ev).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id "
        "BIGINT, event_type VARCHAR)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?)",
        [(i, t, u, et) for (i, t, u, et) in rows],
    )
    from kafka_overwatch_spark.oracles_pipelines import pipeline_oracles

    want = sorted(
        tuple(r) for r in con.execute(
            pipeline_oracles()["events_asof_attribution"]
        ).fetchall()
    )
    assert got == want
    # the tie case specifically: purchase 1 matched by same-ts view 5
    by_pid = {g[0]: g for g in got}
    assert by_pid[1][3] == 5
    assert by_pid[3][3] is None


def test_asof_attribution_duplicate_view_ts_is_deterministic(spark):
    """Two views by the same user at the SAME timestamp: DuckDB's ASOF is
    documented nondeterministic on a non-unique right side, so the oracle
    pre-dedups views to max(event_id) per (user_id, ts) — and the Spark
    carry-forward (ordered ts, side, event_id) must land on that same max
    without any dedup pass of its own."""
    import duckdb

    from kafka_overwatch_spark.operators.relational import asof_attribution
    from kafka_overwatch_spark.oracles_pipelines import pipeline_oracles

    rows = [
        # user 1: duplicate views at 00:10:00 (ids 10 < 11), later purchase
        (10, "2024-01-01 00:10:00.000000", 1, "view"),
        (11, "2024-01-01 00:10:00.000000", 1, "view"),
        (1, "2024-01-01 00:20:00.000000", 1, "purchase"),
        # user 2: duplicate views AT the purchase instant (inclusive tie)
        (12, "2024-01-01 00:30:00.000000", 2, "view"),
        (13, "2024-01-01 00:30:00.000000", 2, "view"),
        (2, "2024-01-01 00:30:00.000000", 2, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, et, 0.0, "{}") for (i, t, u, et) in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id",
        "event_type", "value", "props",
    )
    got = sorted(map(tuple, asof_attribution(ev).collect()))
    by_pid = {g[0]: g for g in got}
    assert by_pid[1][3] == 11  # max event_id among the duplicate views
    assert by_pid[2][3] == 13
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id "
        "BIGINT, event_type VARCHAR)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?)",
        [(i, t, u, et) for (i, t, u, et) in rows],
    )
    want = sorted(
        tuple(r) for r in con.execute(
            pipeline_oracles()["events_asof_attribution"]
        ).fetchall()
    )
    assert got == want


def test_fuzzy_join_complete_on_adversarial_strings(spark, snaps):
    """The deletion-neighborhood candidate scheme must be COMPLETE on
    inputs the fixture never exercises: length-1/2 strings, repeated
    characters, unicode, near-empty — compared against brute-force
    Levenshtein over all pairs (seeded generator, one Spark round)."""
    import itertools
    import random

    from kafka_overwatch_spark.operators.relational import fuzzy_name_pairs

    rng = random.Random(42)
    alphabet = "abcdeé中 "
    names = {"", "a", "aa", "ab"}
    while len(names) < 60:
        n = rng.randint(1, 8)
        names.add("".join(rng.choice(alphabet) for _ in range(n)))
    names = sorted(n for n in names if n)  # part names are non-empty

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(names, 2)
        if a < b and lev(a, b) <= 2
    }
    df = spark.createDataFrame([(n,) for n in names], ["p_name"])
    got = {
        (r["name_a"], r["name_b"], r["distance"])
        for r in fuzzy_name_pairs(df).collect()
    }
    assert got == want, (got ^ want)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=25, deadline=None)
def test_morton_code_is_bijective(pairs):
    """morton_expr must be a bijection on 16-bit pairs: decoding the
    interleaved code recovers (x, y) exactly. Evaluated through DuckDB —
    the SAME generated SQL string the Spark side runs (cross-engine
    equality is covered by the events_zorder_codes oracle)."""
    import duckdb

    from kafka_overwatch_spark.sinks.layout import morton_expr

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    rows = con.execute(
        f"SELECT x, y, {morton_expr('x', 'y')} AS z FROM t"
    ).fetchall()
    for x, y, z in rows:
        dx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        dy = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (dx, dy) == (x, y), (x, y, z)
    # order-of-magnitude locality: codes of equal (x, y) collide only
    # for equal pairs
    assert len({r[2] for r in rows}) == len({(x, y) for x, y in pairs})


def test_source_overlap_marginals(spark, snaps):
    """Overlap-matrix laws: the self-pair row equals the source's own
    distinct-fingerprint count, and every off-diagonal cell is bounded
    by the smaller of its two marginals."""
    from pyspark.sql import functions as F

    from kafka_overwatch_spark.pipelines.curation import (
        source_overlap_matrix,
    )
    from kafka_overwatch_spark.pipelines.dedup import _norm_text

    docs = spark.table("documents")
    rows = source_overlap_matrix(docs).collect()
    diag = {
        r["src_a"]: r["shared_fingerprints"]
        for r in rows
        if r["src_a"] == r["src_b"]
    }
    own = {
        r["source"]: r["n"]
        for r in docs.select(
            "source", F.md5(_norm_text()).alias("fp")
        )
        .filter(F.col("fp").isNotNull())
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert diag == own
    for r in rows:
        if r["src_a"] != r["src_b"]:
            assert r["shared_fingerprints"] <= min(
                diag[r["src_a"]], diag[r["src_b"]]
            )
    # the fixture's dup clusters are within-source by construction, so a
    # constructed cross-source witness proves the off-diagonal counts:
    # "same text" crosses A↔B (and whitespace-normalizes equal), "b only"
    # stays in B
    synth = spark.createDataFrame(
        [
            (1, "same text", "en", "A", 9),
            (2, "same  TEXT ", "en", "B", 11),
            (3, "b only", "en", "B", 6),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    cells = {
        (r["src_a"], r["src_b"]): r["shared_fingerprints"]
        for r in source_overlap_matrix(synth).collect()
    }
    assert cells == {("A", "A"): 1, ("A", "B"): 1, ("B", "B"): 2}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),  # label
            st.lists(
                st.integers(-50, 50).map(lambda v: v / 10.0),
                min_size=4,
                max_size=4,
            ).filter(lambda v: any(x != 0 for x in v)),
        ),
        min_size=2,
        max_size=12,
    )
)
def test_label_centroids_match_numpy(spark, rows):
    """Rocchio vs a straight-numpy reimplementation on generated
    low-dim vectors: same centroids, same rounded cosines, same
    argmax incl. the ties-to-largest-label order."""
    import numpy as np

    from kafka_overwatch_spark.pipelines.similarity import (
        label_centroid_classify,
    )

    df = spark.createDataFrame(
        [(i, vec, lab) for i, (lab, vec) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r["vec_id"]: (r["predicted_label"], r["cosine"])
        for r in label_centroid_classify(df).collect()
    }

    # float32 ingestion first — Spark stores array<float>
    X = np.array(
        [np.array(vec, dtype=np.float32) for _, vec in rows],
        dtype=np.float64,
    )
    labs = np.array([lab for lab, _ in rows])
    cents = {
        lab: X[labs == lab].mean(axis=0) for lab in sorted(set(labs))
    }
    for i in range(len(rows)):
        best = None
        for lab in sorted(cents):
            c = cents[lab]
            denom = np.linalg.norm(X[i]) * np.linalg.norm(c)
            cos = round(float(X[i] @ c) / denom, 6) if denom else None
            if cos is None:
                continue
            if best is None or (cos, lab) > best:
                best = (cos, lab)
        if best is None:
            continue  # zero-norm centroid: cosine undefined, skip
        assert got[i] == (best[1], best[0]), (i, got[i], best)
