"""Tiny cross-dialect SQL renderer.

The correctness gate runs every query twice — once on Spark, once on a
DuckDB oracle — so the *snapshot-table derivation* (fixture logic, not the
engine under test) is written once in a common ANSI subset and rendered per
engine. Only constructs whose semantics are bit-identical on both engines
are allowed in common SQL; the few that differ by name are macro tokens:

- ``@SECDIFF(a, b)`` — whole seconds between two timestamps (a - b).
  Spark: ``unix_timestamp(a) - unix_timestamp(b)`` (each side floored).
  DuckDB: ``date_diff('second', b, a)`` (boundary count == floor diff).
- ``@HASH64(x)`` — deterministic 60-bit non-negative integer hash of a
  string, identical across engines: first 15 hex chars of md5.
  Spark: ``CAST(conv(substring(md5(x),1,15),16,10) AS BIGINT)``.
  DuckDB: ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``.

Both engines were probe-tested for parity (see tests/test_dialect.py).
"""

from __future__ import annotations

import re

SPARK = "spark"
DUCKDB = "duckdb"

_SECDIFF = re.compile(r"@SECDIFF\(\s*([^,@]+?)\s*,\s*([^)@]+?)\s*\)")


def render(sql: str, dialect: str) -> str:
    """Render common SQL for one engine. Macro args must not contain
    commas or parens (column refs / simple literals only)."""
    if dialect == SPARK:
        sql = _SECDIFF.sub(r"(unix_timestamp(\1) - unix_timestamp(\2))", sql)
        return _rewrite_hash64(sql.replace("@HASH64(", "__h64("), SPARK)
    if dialect == DUCKDB:
        sql = _SECDIFF.sub(r"date_diff('second', \2, \1)", sql)
        return _rewrite_hash64(sql.replace("@HASH64(", "__h64("), DUCKDB)
    raise ValueError(f"unknown dialect: {dialect}")


def _rewrite_hash64(sql: str, dialect: str) -> str:
    """Rewrite __h64(expr) with balanced-paren arg extraction so the hash
    macro can wrap arbitrary expressions (concat(...), etc.)."""
    out = []
    i = 0
    token = "__h64("
    while True:
        j = sql.find(token, i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        k = j + len(token)
        depth = 1
        while depth > 0:
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        arg = sql[j + len(token) : k - 1]
        if dialect == SPARK:
            out.append(f"CAST(conv(substring(md5({arg}),1,15),16,10) AS BIGINT)")
        else:
            out.append(f"CAST(concat('0x', substr(md5({arg}),1,15)) AS BIGINT)")
        i = k
    return "".join(out)
