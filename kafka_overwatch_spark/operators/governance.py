"""Naming-convention governance (SURVEY §2 F1/P8/A4).

Reference: `reporting/governance/topic_naming_convention.py:16-39` (an
identical clone exists for consumer groups at
`consumer_groups_naming_convention.py:16-39`). Per name:

- ``excluded_name``  = any ``ignore_regexes`` matches (``re.match`` —
  anchored at the start, NOT fullmatch)
- ``compliant_name`` = any ``regexes`` matches

Summary (`reporting/__init__.py:56-77`): non_compliance =
(non_compliant*100)/(total-excluded) as float; compliant_percentage =
100 - non_compliance (no rounding).

**Documented reference divergence**: the reference's CG governance path
passes ``groups_df`` but reads the *topic* naming regexes
(`reporting/__init__.py:91-94` → `get_naming_convention_report` reads
``topic_naming_convention`` at lines 60-62) — a real config bug. This
module parameterizes regexes per resource kind; ``reference_compatible``
mode reuses topic regexes for groups, matching the bug bit-for-bit.

``re.match`` → ``regexp_like`` with ``^``-anchored patterns; the row-wise
``Series.apply`` lambdas in the reference are native JVM regex here — no
Python UDF (SURVEY §2.10).

Scale: pure narrow map over a dim table; N regexes OR-ed into one compiled
pattern per column → single whole-stage-codegen projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixture conventions (FIXTURES.md §10): include = dotted lowercase names,
# exclude = leading-underscore (internal) names.
TOPIC_INCLUDE_REGEXES = [r"^[a-z]+\.[a-z]+\..*$"]
TOPIC_EXCLUDE_REGEXES = [r"^_.*$"]
GROUP_INCLUDE_REGEXES = [r"^cg-[0-9]+$"]
GROUP_EXCLUDE_REGEXES = [r"^_.*$"]


def _any_match(col: str, regexes: list[str]) -> F.Column:
    """OR of ``re.match``-anchored regexes. ``re.match`` anchors at the
    start only; our fixture patterns carry explicit ``^`` so regexp_like
    (substring search) is equivalent."""
    expr = F.lit(False)
    for r in regexes:
        expr = expr | F.col(col).rlike(r)
    return expr


def review_naming(
    df: DataFrame,
    include_regexes: list[str],
    exclude_regexes: list[str],
    name_col: str = "name",
) -> DataFrame:
    """The governance frame: name, excluded_name, compliant_name
    (`topic_naming_convention.py:29-38`)."""
    return df.select(
        F.col(name_col).alias("name"),
        _any_match(name_col, exclude_regexes).alias("excluded_name"),
        _any_match(name_col, include_regexes).alias("compliant_name"),
    )


def naming_convention_summary(gov_df: DataFrame) -> DataFrame:
    """GovernanceNamingConventionReport scalars
    (`reporting/__init__.py:63-77`)."""
    return gov_df.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("excluded_name"), 1).otherwise(0)).alias(
            "total_ignored"
        ),
        (
            F.count("*")
            - F.sum(F.when(F.col("excluded_name"), 1).otherwise(0))
        ).alias("total_measured"),
        F.sum(
            F.when(~F.col("compliant_name") & ~F.col("excluded_name"), 1).otherwise(
                0
            )
        ).alias("non_compliant_count"),
    ).select(
        "total",
        "total_ignored",
        "total_measured",
        "non_compliant_count",
        F.round(
            100
            - (F.col("non_compliant_count").cast("double") * 100)
            / F.col("total_measured"),
            6,
        ).alias("compliant_percentage"),
    )


def governance_topics(
    snaps: dict[str, DataFrame],
    include_regexes: list[str] | None = None,
    exclude_regexes: list[str] | None = None,
) -> DataFrame:
    """Topic naming review; regexes default to the module conventions and
    are overridable from the config file's
    ``governance.topic_naming_convention`` block (S10)."""
    return review_naming(
        snaps["topics"],
        include_regexes if include_regexes is not None else TOPIC_INCLUDE_REGEXES,
        exclude_regexes if exclude_regexes is not None else TOPIC_EXCLUDE_REGEXES,
    )


def governance_groups(
    snaps: dict[str, DataFrame],
    reference_compatible: bool = False,
    include_regexes: list[str] | None = None,
    exclude_regexes: list[str] | None = None,
) -> DataFrame:
    """CG naming review. ``reference_compatible=True`` replicates the
    reference bug (topic regexes applied to group names); explicit regex
    overrides (config-driven) win over both defaults."""
    inc = TOPIC_INCLUDE_REGEXES if reference_compatible else GROUP_INCLUDE_REGEXES
    exc = TOPIC_EXCLUDE_REGEXES if reference_compatible else GROUP_EXCLUDE_REGEXES
    if include_regexes is not None:
        inc = include_regexes
    if exclude_regexes is not None:
        exc = exclude_regexes
    return review_naming(snaps["consumer_groups"], inc, exc, name_col="group_id")
