"""Winnowing fingerprints (Schleimer/Wilkes/Aiken 2003): bit parity
with a straight-Python reference, the w+k-1 shared-run detection
guarantee, and the JVM-only plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_overwatch_spark.pipelines.text import (
    WINNOW_K,
    WINNOW_W,
    shared_passage_pairs,
    winnow_fingerprints,
)


def _py_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W):
    toks = " ".join(text.strip().split()).lower().split(" ")
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    out = set()
    for i in range(max(len(hs) - w + 1, 1)):
        win = hs[i : i + w]
        m = min(win)
        out.add((i + 1 + win.index(m), m))
    return out


def test_winnow_matches_python_reference(spark, snaps):
    docs = spark.table("documents").filter(F.col("doc_id") < 80)
    got: dict[int, set] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["gram_hash"]))
    want = {
        r["doc_id"]: _py_winnow(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    want = {d: s for d, s in want.items() if s}
    assert got == want and len(got) > 0


def test_winnow_guarantee_shared_run_detected(spark):
    """Any shared token run of ≥ w + k - 1 tokens must contribute at
    least one identical fingerprint to both docs — the paper's
    guarantee, exercised with a run of exactly w + k - 1 embedded in
    otherwise-disjoint documents."""
    run = " ".join(f"shared{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    a = "alpha beta gamma " + run + " delta epsilon"
    b = "one two three four five " + run + " six seven"
    c = "entirely different content with no overlap at all here okay"
    docs = spark.createDataFrame(
        [(1, a, "en"), (2, b, "en"), (3, c, "en")],
        "doc_id long, text string, lang string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in shared_passage_pairs(docs, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_short_doc_single_window(spark):
    """A doc with ≥ k tokens but < w grams winnows its one truncated
    window (exactly one fingerprint); a doc with < k tokens emits
    nothing."""
    docs = spark.createDataFrame(
        [(1, "a b c d e", "en"), (2, "x y", "en")],
        "doc_id long, text string, lang string",
    )
    rows = winnow_fingerprints(docs).collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert len(rows) == 1


def test_winnow_plan_jvm_only(spark, snaps):
    df = winnow_fingerprints(spark.table("documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange SinglePartition" not in plan


def test_shared_passage_spans_localize_the_run(spark):
    """Span output must point INSIDE the shared run: every matched
    fingerprint's k-gram at (pos_a) in doc A textually equals the
    k-gram at (pos_b) in doc B."""
    from kafka_overwatch_spark.pipelines.text import shared_passage_spans

    run = " ".join(f"shared{i}" for i in range(WINNOW_W + WINNOW_K + 4))
    a = "alpha beta gamma " + run + " delta epsilon"
    b = "one two three four five " + run + " six seven"
    docs = spark.createDataFrame(
        [(1, a, "en"), (2, b, "en")],
        "doc_id long, text string, lang string",
    )
    toks = {1: a.lower().split(), 2: b.lower().split()}
    rows = shared_passage_spans(docs, min_shared=1).collect()
    assert rows
    for r in rows:
        ga = toks[r["doc_a"]][r["pos_a"] - 1 : r["pos_a"] - 1 + WINNOW_K]
        gb = toks[r["doc_b"]][r["pos_b"] - 1 : r["pos_b"] - 1 + WINNOW_K]
        assert ga == gb, (r, ga, gb)


def test_shared_passage_pairs_honors_fps(spark):
    """ADVICE r7: a passed-in fps frame must actually feed the posting
    list (the registry hands the memoized winnow frame in; silently
    re-deriving from documents double-executes the winnow chain AND
    ignores a caller's custom fingerprints). Hand a synthetic fps with
    a fabricated shared hash and assert the pair comes from IT, not
    from the (overlap-free) documents."""
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh", "en"),
         (2, "qq rr ss tt uu vv ww xx", "en")],
        "doc_id long, text string, lang string",
    )
    # overlap-free docs: the document-derived posting list yields no pair
    assert shared_passage_pairs(docs, min_shared=1).count() == 0
    fake_fps = spark.createDataFrame(
        [(1, 1, 777), (1, 2, 778), (2, 5, 777), (2, 6, 778)],
        "doc_id long, pos long, gram_hash long",
    )
    got = shared_passage_pairs(docs, min_shared=2, fps=fake_fps).collect()
    assert [(r["doc_a"], r["doc_b"], r["shared_fps"]) for r in got] == [
        (1, 2, 2)
    ]
