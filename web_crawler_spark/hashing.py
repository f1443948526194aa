"""Deterministic, engine-portable hashing.

The reference generates nondeterministic ids (``job_{Date.now()}_{rand36}``,
progress-tracker.service.js:192-194; ``loc_{ts}_{urlhash}_{rand}``,
address-normalizer.service.js:262-280). For bit-identical reruns we replace
every id/choice with a seeded hash of stable inputs.

Two hash families:

- ``hash64`` / ``hash64_col``: md5-based 60-bit hash that computes the SAME
  value in Python, Spark SQL, and DuckDB — used everywhere a DuckDB oracle
  must reproduce our derivation (15 hex chars = 60 bits, always fits a
  signed int64).
- Spark's native ``xxhash64`` is used only where no cross-engine oracle is
  needed (it's faster, JVM-side).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(*parts: object) -> int:
    """Python-side md5 60-bit hash; mirror of hash64_col / hash64_sql."""
    s = "|".join("" if p is None else str(p) for p in parts)
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def hash64_col(*cols: Column | str) -> Column:
    """Spark column: md5 60-bit hash of '|'-joined string parts."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    joined = F.concat_ws("|", *[c.cast("string") for c in cs])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same hash64 of a string expr.

    ``expr`` must already be the '|'-joined string (use ``concat_ws('|',...)``).
    """
    return f"cast(('0x' || substr(md5({expr}), 1, 15)) as ubigint)::bigint"


def stable_row_id(*cols: Column | str) -> Column:
    """Deterministic row id (replaces reference X29 nondeterministic ids)."""
    return hash64_col(*cols)
