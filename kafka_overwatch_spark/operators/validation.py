"""Declarative data-quality validation (deequ/dbt-test-style): a pinned
suite of constraints — uniqueness, referential integrity, accepted
values, ranges, cross-column consistency — evaluated into one
violations-report frame.

Reference tie-in: the reference trusts its collectors implicitly; the
snapshot model makes ingest auditable instead — and the suite
DELIBERATELY includes two failing checks on the fixture: the ghost
consumer-group offsets (the rows the J1 inner join silently drops,
`overwatch_resources/clusters.py` semantics) surface here as
referential violations, and events.value carries real out-of-range
rows. A validation report where every row passes is untested machinery.

Scale shape: every check is ONE aggregation (uniqueness: count minus
count-distinct; referential: broadcast-able left-anti count; the rest
are conditional sums) over its table, unioned at dim cardinality. At
100 TB the checks share each table's scan via one multi-aggregate pass
per table if desired; the per-check form keeps lineage obvious.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACCEPTED_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
ACCEPTED_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
MAX_EVENT_VALUE = 100.0


def _row(df: DataFrame, check: str, target: str, violations: F.Column) -> DataFrame:
    return df.agg(
        F.count("*").alias("checked"), violations.cast("long").alias("violations")
    ).select(
        F.lit(check).alias("check"),
        F.lit(target).alias("target"),
        "checked",
        "violations",
        (F.col("violations") == 0).alias("pass"),
    )


def _unique(df: DataFrame, cols: list[str], check: str, target: str) -> DataFrame:
    return _row(
        df, check, target, F.count("*") - F.count_distinct(*[F.col(c) for c in cols])
    )


def _in_set(df: DataFrame, col: str, allowed: tuple, check: str, target: str) -> DataFrame:
    return _row(df, check, target, F.sum((~F.col(col).isin(*allowed)).cast("long")))


def _referential(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str,
    check: str, target: str,
) -> DataFrame:
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    total = child.agg(F.count("*").alias("checked"))
    return orphans.agg(F.count("*").alias("violations")).crossJoin(
        F.broadcast(total)
    ).select(
        F.lit(check).alias("check"),
        F.lit(target).alias("target"),
        "checked",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("pass"),
    )


def validation_report(
    raw: dict[str, DataFrame], snaps: dict[str, DataFrame]
) -> DataFrame:
    orders, lineitem = raw["orders"], raw["lineitem"]
    customer, events, documents = raw["customer"], raw["events"], raw["documents"]
    checks = [
        _unique(orders, ["o_orderkey"], "unique", "orders.o_orderkey"),
        _unique(
            lineitem, ["l_orderkey", "l_linenumber"], "unique",
            "lineitem.(l_orderkey,l_linenumber)",
        ),
        _referential(
            lineitem, "l_orderkey", orders, "o_orderkey",
            "referential", "lineitem.l_orderkey->orders",
        ),
        _row(
            lineitem, "range", "lineitem.l_discount in [0,1]",
            F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")),
        ),
        _in_set(
            customer, "c_mktsegment", ACCEPTED_SEGMENTS,
            "accepted_values", "customer.c_mktsegment",
        ),
        _in_set(
            events, "event_type", ACCEPTED_EVENT_TYPES,
            "accepted_values", "events.event_type",
        ),
        _row(
            events, "range", "events.value <= 100",
            F.sum((F.col("value") > MAX_EVENT_VALUE).cast("long")),
        ),
        _row(
            documents, "consistency", "documents.n_chars == length(text)",
            F.sum((F.col("n_chars") != F.length("text")).cast("long")),
        ),
        _referential(
            snaps["group_offsets"].select(F.col("topic")),
            "topic",
            snaps["topics"].select(F.col("name")),
            "name",
            "referential", "group_offsets.topic->topics (ghost rows)",
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
