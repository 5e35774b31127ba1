"""Text → embedding encoder seam: the in-engine bridge from the
`documents` table to the `embeddings`-shaped surface every similarity /
ANN / semantic-dedup operator consumes.

Same honest-stub convention as the multimodal decode
(`pipelines/multimodal.py`): the REAL encoder (sentence-transformers /
any torch model) is import-guarded because no model runtime ships in
this container, while the Spark-side plumbing — Arrow-batched
mapInPandas, pinned output schema, partition-invariant determinism,
unit-norm contract — is real and tested. The fake encoder is a
deterministic md5-seeded unit vector per NORMALIZED text, so exact
duplicates (and only whitespace/case variants) land on identical
vectors — which makes the downstream wiring testable end-to-end:
encode → embedding_neardup finds exactly the exact-dup clusters.

Scale shape: one narrow Arrow-batched map over (doc_id, text) — no
shuffle, no driver collect; at 100 TB this is the GPU-batched encode
stage of a real pipeline, and batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` exactly as the
multimodal decode documents.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ENCODE_DIM = 64

ENCODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("model", StringType()),
    ]
)


def _fake_vector(norm_text: str, dim: int) -> np.ndarray:
    """Deterministic unit vector: md5 of the normalized text seeds a
    PCG64 stream — same text ⇒ same vector on any partition, any
    engine, any worker count."""
    seed = int.from_bytes(
        hashlib.md5(norm_text.encode()).digest()[:8], "big"
    )
    v = np.random.Generator(np.random.PCG64(seed)).standard_normal(dim)
    n = float(np.linalg.norm(v))
    return (v / n) if n > 0 else v


def encode_documents(
    documents: DataFrame,
    model: str = "fake-md5-gaussian",
    dim: int = ENCODE_DIM,
    use_real_model: bool = False,
) -> DataFrame:
    """Encode `documents` text into unit embeddings. The registered
    surface uses the deterministic fake encoder; ``use_real_model=True``
    is the import-guarded seam a GPU deployment fills in. NULL-text
    docs are dropped (nothing to encode — same contract as
    simhash_fingerprints). Output: doc_id, embedding float[dim],
    model."""

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        if use_real_model:
            try:
                from sentence_transformers import (  # noqa: F401
                    SentenceTransformer,
                )
            except ImportError as exc:
                raise NotImplementedError(
                    "real text encoding requires sentence-transformers "
                    "(not present in this environment); use "
                    "use_real_model=False"
                ) from exc
            # the runtime being importable is NOT enough — the model
            # load/encode wiring is the seam a GPU deployment fills in;
            # silently falling through to the fake encoder here would
            # label md5 noise with a real model's name
            raise NotImplementedError(
                "real-model encode is not wired in this build: replace "
                "this branch with SentenceTransformer(model).encode "
                "over the batch"
            )
        import re

        for pdf in batches:
            if pdf.empty:
                continue
            # EXACT python mirror of dedup._norm_text — Spark trim()
            # strips SPACES only, so strip(" ") here, not strip() (a
            # bare strip() would also eat tab/newline edges and merge
            # texts the fingerprint family keeps distinct)
            norm = [
                re.sub(r"\s+", " ", t.strip(" ")).lower()
                for t in pdf["text"]
            ]
            vecs = [
                _fake_vector(t, dim).astype(np.float32).tolist()
                for t in norm
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "embedding": vecs,
                    "model": model,
                }
            )

    return (
        documents.filter(documents.text.isNotNull())
        .select("doc_id", "text")
        .mapInPandas(encode_batches, ENCODED_SCHEMA)
    )
