"""BPE merge training: the distributed implementation must reproduce the
reference algorithm (Sennrich et al. 2016) exactly — same champion pair,
same tie-breaks, same greedy within-word merge order, every round."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from kafka_overwatch_spark.pipelines import text as textops
from kafka_overwatch_spark.registry import get_raw_tables


def _python_bpe(word_freq: dict[str, int], n_merges: int):
    vocab = {w: list(w) for w in word_freq}
    rules = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freq[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # (freq desc, pair asc) — the engine's deterministic tie-break
        (a, b), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
        rules.append((rank, a, b, a + b, freq))
    return rules


def test_bpe_merges_match_python_reference(spark):
    docs = get_raw_tables(spark, SF_DIR)["documents"]
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in textops.bpe_merges(docs, n_merges=12)
        .orderBy("rank")
        .collect()
    ]
    wf = {
        r.w: r.freq
        for r in docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .collect()
    }
    want = _python_bpe(wf, 12)
    diverge = next(
        ((g, w) for g, w in zip(got, want) if g != w),
        ("<no pairwise diff>", f"lengths {len(got)} vs {len(want)}"),
    )
    assert got == want, f"first divergence: {diverge}"


def test_bpe_tokenize_matches_python_apply(spark):
    """Applying the learned merges through the JVM regexp chain must
    tokenize every document exactly like the python reference apply."""
    docs = get_raw_tables(spark, SF_DIR)["documents"]
    rules_rows = (
        textops.bpe_merges(docs, n_merges=8).orderBy("rank").collect()
    )
    rules = [(r.left, r.right) for r in rules_rows]
    got = {
        r.doc_id: (r.n_tokens, r.token_witness)
        for r in textops.bpe_tokenize(docs, rules=rules).collect()
    }

    import hashlib

    def apply_word(w):
        syms = list(w)
        for a, b in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for row in docs.select("doc_id", "text").collect():
        toks = []
        for w in row.text.lower().split():
            toks.extend(apply_word(w))
        witness = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[row.doc_id] == (len(toks), witness), row.doc_id
