"""Generate sf1-scale probe data under /root/repo/scaledata/ (VERDICT r10
next #3: "run a scale probe above sf0.1").

/root/testdata is read-only and the driver only ships sf0.001/0.01/0.1,
so the 10x tier is built here, from PUBLIC structure only:

- relational tables (customer supplier part orders lineitem events):
  REPLICATE sf0.1 ``copies`` times with disjoint key offsets (stride =
  per-key max+1, applied consistently across fact and dim so every join
  still resolves). This preserves every per-key distribution exactly —
  basket sizes, degree histogram, join fan-outs, zipf skew — which is
  also how a sharded 10x corpus behaves (the co-purchase graph becomes
  ``copies`` disjoint isomorphic components; cross-copy edges are
  absent, noted in SCALE.md).
- documents: FRESH draws from the measured sf0.1 unigram model
  (replication would make every doc an exact 10-way duplicate and turn
  the near-dup probe into a pathological corpus): token count and
  (lang, source) from their empirical distributions, tokens iid from
  the empirical unigram frequencies. Deterministic (PCG64 seed 4242).
- embeddings: unit-norm 64-dim draws around the measured per-label
  centroids with the measured within-label spread (sf0.1 structure:
  centroid norm ~0.07, within-std 0.125 — near-random with faint tilt).

Both a gen-sf0.1 twin (1x, same generator) and gen-sf1 (10x) are
written so probe ratios compare like with like. Usage:

    python scripts/gen_scaledata.py [--copies 10] [--out scaledata]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEYED = {
    # table -> {column: stride_group}; strides shared across tables so
    # fact foreign keys keep resolving into the replicated dims
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
}


def _strides(con: duckdb.DuckDBPyConnection) -> dict[str, int]:
    probes = {
        "cust": ("customer", "c_custkey"),
        "supp": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "order": ("orders", "o_orderkey"),
        "event": ("events", "event_id"),
        "user": ("events", "user_id"),
    }
    return {
        g: con.execute(
            f"SELECT max({c}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        for g, (t, c) in probes.items()
    }


def replicate(out: Path, copies: int) -> None:
    con = duckdb.connect()
    strides = _strides(con)
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, cols in KEYED.items():
        # one part file PER COPY under a directory named {t}.parquet —
        # a single monolithic file under Spark's 128 MB
        # maxPartitionBytes is ONE input split, which serialized every
        # gen1 scan onto one core and read as fake super-linearity in
        # the first probe (events family ~17x); Spark reads the
        # directory transparently
        tdir = out / f"{t}.parquet"
        tdir.mkdir(parents=True, exist_ok=True)
        for k in range(copies):
            shifts = ", ".join(
                f"{c} + {k * strides[g]} AS {c}" for c, g in cols.items()
            )
            others = con.execute(
                f"SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0"
            ).description
            keep = [d[0] for d in others if d[0] not in cols]
            sel = ", ".join([shifts] + keep)
            cols_order = ", ".join(d[0] for d in others)
            con.execute(
                f"COPY (SELECT {cols_order} FROM (SELECT {sel} FROM "
                f"'{SRC}/{t}.parquet')) TO "
                f"'{tdir}/part-{k:04d}.parquet' (FORMAT PARQUET)"
            )
    con.close()


def _write_chunked(tbl: pa.Table, path: Path, rows_per_file: int) -> None:
    """Directory of part files (see replicate: one monolithic file is
    one Spark input split)."""
    path.mkdir(parents=True, exist_ok=True)
    for i, lo in enumerate(range(0, tbl.num_rows, rows_per_file)):
        pq.write_table(
            tbl.slice(lo, rows_per_file), path / f"part-{i:04d}.parquet"
        )


def gen_documents(out: Path, n_docs: int, rng: np.random.Generator) -> None:
    con = duckdb.connect()
    uni = con.execute(
        f"""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok
          FROM '{SRC}/documents.parquet'
        )
        SELECT tok, count(*) AS n FROM toks
        WHERE tok != '' GROUP BY 1 ORDER BY n DESC, tok
        """
    ).fetchall()
    lens = [
        r[0]
        for r in con.execute(
            f"SELECT length(string_split(text, ' ')) "
            f"FROM '{SRC}/documents.parquet'"
        ).fetchall()
    ]
    meta = con.execute(
        f"SELECT lang, source, count(*) FROM '{SRC}/documents.parquet' "
        f"GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    con.close()
    toks = np.array([t for t, _ in uni])
    tok_p = np.array([n for _, n in uni], dtype=float)
    tok_p /= tok_p.sum()
    meta_p = np.array([m[2] for m in meta], dtype=float)
    meta_p /= meta_p.sum()
    lens_arr = np.array(lens)

    doc_lens = rng.choice(lens_arr, size=n_docs)
    meta_idx = rng.choice(len(meta), size=n_docs, p=meta_p)
    texts, langs, sources = [], [], []
    for i in range(n_docs):
        words = rng.choice(toks, size=int(doc_lens[i]), p=tok_p)
        texts.append(" ".join(words))
        langs.append(meta[meta_idx[i]][0])
        sources.append(meta[meta_idx[i]][1])
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    _write_chunked(tbl, out / "documents.parquet", 5000)


def gen_embeddings(out: Path, n_vecs: int, rng: np.random.Generator) -> None:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM '{SRC}/embeddings.parquet'"
    ).fetchall()
    con.close()
    arr = np.array([r[1] for r in rows], dtype=np.float64)
    labs = np.array([r[0] for r in rows])
    uniq = np.sort(np.unique(labs))
    cents = np.stack([arr[labs == ll].mean(axis=0) for ll in uniq])
    spread = float(np.mean([arr[labs == ll].std() for ll in uniq]))
    lab_p = np.array([(labs == ll).sum() for ll in uniq], dtype=float)
    lab_p /= lab_p.sum()

    new_labs = rng.choice(uniq, size=n_vecs, p=lab_p)
    noise = rng.normal(0.0, spread, size=(n_vecs, arr.shape[1]))
    vecs = cents[np.searchsorted(uniq, new_labs)] + noise
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(new_labs.astype(np.int32), pa.int32()),
        }
    )
    _write_chunked(tbl, out / "embeddings.parquet", 2000)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="scaledata")
    ap.add_argument(
        "--tiers",
        default="gen0.1:1,gen1:10",
        help="comma list of name:copies tiers (r12 adds gen10:100 for "
        "the two-decade probe — VERDICT r11 next #8)",
    )
    args = ap.parse_args()
    root = Path(args.out)
    for spec in args.tiers.split(","):
        name, copies_s = spec.split(":")
        copies = int(copies_s)
        out = root / name
        out.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(4242)
        replicate(out, copies)
        gen_documents(out, 5000 * copies, rng)
        gen_embeddings(out, 2000 * copies, rng)
        print(f"{out}: done ({copies}x)")


if __name__ == "__main__":
    main()
