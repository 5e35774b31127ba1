"""Shared pipeline utilities."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_partitions(spark) -> int:
    """Numeric shuffle width with a platform-safe fallback:
    ``spark.sql.shuffle.partitions`` is the string ``"auto"`` on
    AQE-managed platforms (e.g. Databricks), where a bare ``int()``
    raises ValueError (ADVICE r7). Fall back to the cluster's default
    parallelism — the same order of magnitude AQE would pick as its
    initial width."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition a (possibly single-file) input so per-row-heavy
    operators use the whole cluster. Small testdata arrives as one parquet
    file = one partition = one task; at real scale the scan already has
    many splits, and this becomes a cheap no-op-ish rebalance."""
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism * factor, 2)
    # estimate input parallelism WITHOUT df.rdd (which converts the whole
    # plan to an RDD per call): leaf file count is a lower bound on scan
    # splits — many files means the scan is already parallel and the
    # rebalance would only add an exchange. Single/few files (the test
    # fixtures) or non-file sources fall through to the repartition.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


def cumulative_offsets(
    counts: DataFrame,
    key_col: str,
    cnt_col: str,
    off_col: str,
) -> DataFrame:
    """Per-key cumulative start offsets over a SMALL counts frame via a
    triangular self-join (sum of counts of all strictly-smaller keys;
    0 for the first key) — O(K²) on a bounded frame, and unlike a bare
    cumulative window it introduces no Exchange SinglePartition. Shared
    by exact_global_rank (slice offsets) and the per-group rank
    recovery in value_equi_depth_histogram (type offsets).

    NULL keys sort FIRST (offset 0), matching Spark's default
    NULLS-FIRST ascending order that exact_global_rank's range
    partitioner uses — a bare ``<`` would evaluate NULL < key to NULL
    and silently drop the NULL group's counts from every offset
    (ADVICE r6), so the join condition spells the null ordering out."""
    lower = counts.select(
        F.col(key_col).alias("_co_key_b"),
        F.col(cnt_col).alias("_co_cnt_b"),
    )
    # "strictly smaller" under NULLS-FIRST: NULL < every non-null key,
    # no key < NULL
    smaller = (F.col("_co_key_b") < F.col(key_col)) | (
        F.col("_co_key_b").isNull() & F.col(key_col).isNotNull()
    )
    return (
        counts.join(lower, smaller, "left")
        .groupBy(key_col, cnt_col)
        .agg(F.coalesce(F.sum("_co_cnt_b"), F.lit(0)).alias(off_col))
    )


def exact_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    rank_col: str = "i",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global ``row_number`` over a total order WITHOUT the
    single-partition sort a bare ``Window.orderBy`` plans (the classic
    100 TB scale-killer: every row shuffles to ONE task).

    Plan shape: ``repartitionByRange`` on the order keys gives each task
    one contiguous slice of the total order; a ``row_number`` window
    partitioned by ``spark_partition_id()`` ranks each slice locally (in
    parallel); then each slice shifts by the cumulative row count of the
    slices before it — a partition-count-sized (tiny) triangular
    aggregate that broadcasts back. Every stage is parallel; the only
    data-sized shuffles are the range exchange and the pid hash
    exchange, both balanced by construction. Result is bit-identical to
    the global-window form (exact rank, same total order), so DuckDB
    oracles keep passing unchanged.

    ``total_col`` optionally attaches the total row count to every row
    (needed by :func:`ntile_from_rank`)."""
    spark = df.sparkSession
    n = num_partitions or shuffle_partitions(spark)
    from pyspark.sql.window import Window

    # localCheckpoint pins the (row → slice) assignment: range boundaries
    # come from SAMPLING seeded per materialized RDD, so without the pin
    # two consumers of this frame inside one plan (the counts subtree
    # here, or a caller's self-join on the rank) can each re-execute the
    # exchange with DIFFERENT boundaries whenever exchange reuse fails
    # to kick in — silently corrupting ranks. The checkpoint makes every
    # consumer read the one materialized assignment; lazy (eager=False)
    # keeps construction job-free.
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_egr_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = ranged.withColumn(
        "_egr_rn",
        F.row_number().over(
            Window.partitionBy("_egr_pid").orderBy(*order_cols)
        ),
    )
    counts = ranged.groupBy("_egr_pid").agg(
        F.count("*").alias("_egr_cnt")
    )
    offsets = cumulative_offsets(
        counts, "_egr_pid", "_egr_cnt", "_egr_off"
    ).select("_egr_pid", "_egr_off")
    out = (
        local.join(F.broadcast(offsets), "_egr_pid")
        .withColumn(
            rank_col,
            (F.col("_egr_off") + F.col("_egr_rn")).cast("long"),
        )
        .drop("_egr_pid", "_egr_rn", "_egr_off")
    )
    if total_col is not None:
        total = counts.agg(
            F.coalesce(F.sum("_egr_cnt"), F.lit(0))
            .cast("long")
            .alias(total_col)
        )
        out = out.crossJoin(F.broadcast(total))
    return out


def ntile_from_rank(i: Column, n: Column, k: int) -> Column:
    """SQL-standard ``NTILE(k)`` computed arithmetically from an exact
    1-based rank ``i`` over ``n`` rows: the first ``n % k`` buckets hold
    ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — bit-identical to the
    window NTILE both Spark and DuckDB implement, but expressible on top
    of :func:`exact_global_rank` with no global-sort window."""
    q = F.floor(n / F.lit(k)).cast("long")
    r = (n % F.lit(k)).cast("long")
    big = r * (q + F.lit(1))
    return (
        F.when(i <= big, F.floor((i - F.lit(1)) / (q + F.lit(1))) + F.lit(1))
        .otherwise(
            r
            + F.floor(
                (i - big - F.lit(1)) / F.greatest(q, F.lit(1))
            )
            + F.lit(1)
        )
        .cast("long")
    )


def exact_global_cumsum(
    df: DataFrame,
    order_cols: Sequence[Column],
    weight: Column,
    cum_col: str = "cum",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive global running sum of ``weight`` over a total
    order WITHOUT a single-partition window — the prefix-SUM sibling of
    :func:`exact_global_rank` (same plan shape: range exchange →
    per-slice window → tiny triangular slice-offset broadcast). The
    weight is summed as given; pass an integer/decimal column for
    bit-exact cross-engine prefixes. ``total_col`` optionally attaches
    the grand total to every row."""
    spark = df.sparkSession
    n = num_partitions or shuffle_partitions(spark)
    from pyspark.sql.window import Window

    ranged = (
        df.withColumn("_egc_w", weight)
        .repartitionByRange(n, *order_cols)
        .withColumn("_egc_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = ranged.withColumn(
        "_egc_run",
        F.sum("_egc_w").over(
            Window.partitionBy("_egc_pid")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sums = ranged.groupBy("_egc_pid").agg(F.sum("_egc_w").alias("_egc_cnt"))
    offsets = cumulative_offsets(
        sums, "_egc_pid", "_egc_cnt", "_egc_off"
    ).select("_egc_pid", "_egc_off")
    out = (
        local.join(F.broadcast(offsets), "_egc_pid")
        .withColumn(cum_col, F.col("_egc_off") + F.col("_egc_run"))
        .drop("_egc_pid", "_egc_run", "_egc_off", "_egc_w")
    )
    if total_col is not None:
        total = sums.agg(F.sum("_egc_cnt").alias(total_col))
        out = out.crossJoin(F.broadcast(total))
    return out
