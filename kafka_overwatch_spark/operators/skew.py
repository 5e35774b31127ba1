"""Skew-handling join utilities — the explicit tools behind SCALE.md's
skew section (AQE skew-join is the backstop; salting is the deterministic
contract for known-hot keys).

``salted_join`` implements the classic pattern: replicate each right-side
row SALT times, scatter left rows uniformly across the salt space, join on
(key, salt). A key carrying 50% of the fact table then spreads over SALT
reducers instead of one. Result is row-identical to the plain join
(verified in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with salt-scattered left side and
    salt-replicated right side. Supports inner/left joins (the fact side
    is ``left``)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_col = "__salt"
    # deterministic scatter: hash of the whole left row modulo salt —
    # avoids rand() (non-reproducible) and monotonically_increasing_id
    # (partition-dependent)
    left_s = left.withColumn(
        salt_col,
        F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt)),
    )
    right_s = right.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    return left_s.join(right_s, [*on, salt_col], how).drop(salt_col)
