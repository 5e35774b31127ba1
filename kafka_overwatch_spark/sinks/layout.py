"""Physical storage layout for the 100 TB deployment (SCALE.md):

- `partition_offsets` is append-only and every report query prunes to one
  cluster and a bounded scan range → write it **partitioned by
  (cluster, scan_id)** so those predicates become partition pruning
  (zero data read outside the slice), not row filters.
- The lag join shuffles `group_offsets ⋈ partition_offsets` on
  (topic, partition_id) every scan → persist both **bucketed by
  (topic, partition_id)** so the join is co-located and plans with NO
  exchange on either side.

Both claims are plan-asserted in tests/test_layout.py against real
writes; the utilities below are the write path a deployment would run
per scan batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAG_JOIN_KEYS = ("topic", "partition_id")


def write_offsets_partitioned(df: DataFrame, path: str) -> None:
    """partition_offsets → parquet partitioned by (cluster, scan_id).
    Partition columns are low-cardinality by construction (clusters ×
    scans), so file counts stay sane; within a partition the data is
    whatever the scan produced (append-only)."""
    (
        df.write.mode("overwrite")
        .partitionBy("cluster", "scan_id")
        .parquet(path)
    )


def write_bucketed_for_lag_join(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    n_buckets: int = 8,
) -> None:
    """Persist a fact table bucketed + sorted by the lag-join key so the
    per-scan join runs with no exchange. Bucketed tables require the
    catalog (`saveAsTable`); `spark.sql.sources.bucketing.enabled` is on
    by default."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *LAG_JOIN_KEYS)
        .sortBy(*LAG_JOIN_KEYS)
        .format("parquet")
        .saveAsTable(table)
    )


def write_minhash_index(corpus_shingles: DataFrame, base_path: str) -> None:
    """Persist the LSH corpus index the incremental dedup screen reads:
    the band table partitioned by band_id (NUM_BANDS directories —
    selective per-band maintenance and pruning) plus the shingle frame
    (the verify-join side). At 100 TB this is THE dedup index layout:
    ingestion batches probe the band table (bounded-key join) and verify
    against only candidate shingle rows — the corpus text is never
    rescanned."""
    from ..pipelines.dedup import minhash_bands

    (
        minhash_bands(corpus_shingles)
        .write.mode("overwrite")
        .partitionBy("band_id")
        .parquet(f"{base_path}/bands")
    )
    corpus_shingles.write.mode("overwrite").parquet(f"{base_path}/shingles")


def read_minhash_index(spark: SparkSession, base_path: str):
    """(bands, shingles) back from storage. band_id returns as a
    partition-directory column (int-inferred) — cast back to long so
    joins against freshly-derived band frames stay type-identical."""
    from pyspark.sql import functions as F

    bands = (
        spark.read.parquet(f"{base_path}/bands")
        .withColumn("band_id", F.col("band_id").cast("long"))
        .select("doc_id", "band_id", "band_key")
    )
    return bands, spark.read.parquet(f"{base_path}/shingles")


def write_pq_index(
    embeddings: DataFrame, base_path: str, codebooks=None
) -> None:
    """Persist the PQ ANN index: the packed code table (two int64
    columns — the 8-byte-per-vector artifact ADC scans) plus the
    codebook tensor as a flat (subspace, centroid, dim, weight) parquet
    so ANY engine can reload it. At 100 TB the code table is the
    memory-resident retrieval index; re-encoding only runs when
    codebooks retrain, so persisting both is what makes PQ
    train-once/serve-forever."""
    from ..pipelines.similarity import pq_encode, pq_train

    cb = pq_train(embeddings) if codebooks is None else codebooks
    pq_encode(embeddings, cb).write.mode("overwrite").parquet(
        f"{base_path}/codes"
    )
    m, k, sub = cb.shape
    spark = embeddings.sparkSession
    rows = [
        (int(i), int(j), int(d), float(cb[i, j, d]))
        for i in range(m)
        for j in range(k)
        for d in range(sub)
    ]
    spark.createDataFrame(
        rows, "subspace INT, centroid INT, dim INT, weight DOUBLE"
    ).coalesce(1).write.mode("overwrite").parquet(f"{base_path}/codebooks")


def read_pq_index(spark: SparkSession, base_path: str):
    """(codebooks ndarray, codes DataFrame) back from storage — the
    codebook tensor is rebuilt index-positionally, so a persisted index
    serves ann_pq_topk bit-identically to the inline-trained one
    (asserted in tests/test_persisted_index.py)."""
    import numpy as np

    rows = spark.read.parquet(f"{base_path}/codebooks").collect()
    m = max(r["subspace"] for r in rows) + 1
    k = max(r["centroid"] for r in rows) + 1
    sub = max(r["dim"] for r in rows) + 1
    cb = np.zeros((m, k, sub), dtype=np.float64)
    for r in rows:
        cb[r["subspace"], r["centroid"], r["dim"]] = r["weight"]
    return cb, spark.read.parquet(f"{base_path}/codes")


def morton_expr(x: str, y: str, bits: int = 16) -> str:
    """Z-order (Morton) bit-interleave of two non-negative integer
    expressions as a pure arithmetic/bitwise SQL expression that parses
    IDENTICALLY in Spark SQL and DuckDB — one generator is the single
    source of truth for the cross-engine parity gate. Disjoint bit
    positions mean ``+`` is exact OR; everything stays in BIGINT.

    Why it matters at 100 TB: sorting a fact table by a Morton key of
    its two hottest filter columns gives every file a TIGHT min/max box
    in BOTH dimensions, so parquet zone-map pruning works for either
    predicate — a single-column sort only prunes its own column (see
    test_layout.py for the measured file-overlap comparison)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_write(
    df: DataFrame, path: str, x: str, y: str, files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of (x, y):
    range-repartition on the key (contiguous, balanced key ranges per
    file — the layout step data warehouses call OPTIMIZE ZORDER BY) then
    sort within partitions so row groups inherit the clustering."""
    keyed = df.withColumn(
        "_zkey", F.expr(morton_expr(f"({x} & {(1 << bits) - 1})",
                                    f"({y} & {(1 << bits) - 1})", bits))
    )
    (
        keyed.repartitionByRange(files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: tuple[str, ...] = (),
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_bytes)`` files (optionally re-sorted so
    zone maps stay tight), writing to a NEW directory — the caller swaps
    the pointer (same generation-flip discipline as
    streaming/events_stream.py's sketch state; an in-place overwrite
    that dies mid-write torches the dataset).

    Returns {files_before, files_after, bytes_total}. At 100 TB this is
    the nightly maintenance job streaming-ingest tables need: thousands
    of per-trigger micro-files → scan-sized files; the repartition count
    comes from real byte size, not a guess.

    Hive-partitioned sources (key=... subdirs) are rewritten WITH the
    same partitionBy — silently flattening them would turn partition
    columns into data columns and drop partition pruning for every
    downstream reader of the compacted copy (ADVICE r5)."""
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)

    def _parquet_files(path):
        # RECURSIVE walk: partitioned datasets keep files in key=...
        # subdirectories — a flat listStatus would see only directories,
        # size the rewrite at 0 bytes, and coalesce everything to 1 file
        it = fs.listFiles(path, True)
        out = []
        while it.hasNext():
            f = it.next()
            if f.getPath().getName().endswith(".parquet"):
                out.append(f)
        return out

    files = _parquet_files(p)
    bytes_total = sum(f.getLen() for f in files)
    n_out = max(1, math.ceil(bytes_total / target_bytes))
    # infer Hive partition columns from the key=value path segments of
    # the leaf files (in directory order), so the rewrite preserves them
    part_cols: list[str] = []
    if files:
        rel = str(files[0].getPath().toUri().getPath())
        base = str(p.getFileSystem(conf).makeQualified(p).toUri().getPath())
        for seg in rel[len(base):].strip("/").split("/")[:-1]:
            if "=" in seg:
                part_cols.append(seg.split("=", 1)[0])
    # partition values must round-trip byte-for-byte: with type
    # inference on, key=01 re-reads as int 1 and the rewrite would emit
    # key=1 — a silent value change for downstream readers. Inference
    # off keeps the directory names identical, so a default reader of
    # the compacted copy infers exactly what it would on the source.
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_old = spark.conf.get(infer_key)
    spark.conf.set(infer_key, "false")
    try:
        df = spark.read.parquet(src_path)
    finally:
        spark.conf.set(infer_key, infer_old)
    if sort_cols:
        # cluster on the partition keys FIRST, then the sort key: a
        # range purely on sort_cols would spread every partition value
        # across every task and the partitioned writer would emit up to
        # n_out×K files — the small-file problem this function removes
        out = df.repartitionByRange(
            n_out, *part_cols, *sort_cols
        ).sortWithinPartitions(*part_cols, *sort_cols)
    elif part_cols:
        # cluster by the partition keys so each task writes few files
        # per partition directory instead of one per (task, key)
        out = df.repartition(n_out, *part_cols)
    else:
        out = df.coalesce(n_out)
    writer = out.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(dst_path)
    files_after = len(
        _parquet_files(jvm.org.apache.hadoop.fs.Path(dst_path))
    )
    return {
        "files_before": len(files),
        "files_after": files_after,
        "bytes_total": int(bytes_total),
    }


def write_centroid_model(embeddings: DataFrame, base_path: str) -> None:
    """Persist the Rocchio label-centroid model as a flat (label, dim,
    mu) parquet — engine-neutral like the PQ codebook tensor; |labels|
    × dims rows, trivially re-loadable anywhere. Train-once/serve-
    forever: classification of unlabeled vectors only ever needs this
    table, never the training corpus."""
    from ..pipelines.similarity import fit_label_centroids

    flat = fit_label_centroids(embeddings).select(
        "label", F.posexplode("c").alias("dim", "mu")
    )
    flat.coalesce(1).write.mode("overwrite").parquet(
        f"{base_path}/centroids"
    )


def read_centroid_model(spark: SparkSession, base_path: str) -> DataFrame:
    """(label, c array<double>) back from storage — index-positional
    rebuild, so a persisted model classifies bit-identically to the
    inline fit (asserted in tests/test_persisted_index.py)."""
    flat = spark.read.parquet(f"{base_path}/centroids")
    return flat.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))),
            lambda x: x["mu"],
        ).alias("c")
    )
