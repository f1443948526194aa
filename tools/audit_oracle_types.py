"""Audit every registry oracle's DuckDB result types for values the
external driver's hash normalizer renders differently from Spark.

DuckDB silently widens in ways that keep rows/schema green but break the
value hash:
- sum(INTEGER)            -> HUGEINT (int128 -> decimal128 via Arrow)
- bare decimal literals / -> DECIMAL128 (str() renders trailing zeros)
  decimal arithmetic
- bit_count / small ints  -> int8/int16

(Exactly this produced the only driver hash failures in rounds 1-2: the
three sessionize oracles' bare `sum(new_session)`.) The registry invariant
is therefore: every numeric oracle output is BIGINT or DOUBLE. Run this
after adding or editing any oracle:

    python tools/audit_oracle_types.py [sf_dir]

Exit code 1 if any oracle errors or yields a flagged column type.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
RISKY = {"int8", "int16", "uint8", "uint16", "uint32", "uint64"}


def main() -> int:
    from web_crawler_spark.analytics import queries as Q

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    flagged = []
    oracles = Q.oracle_sql()
    for name, sql in oracles.items():
        try:
            res = con.execute(sql).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            flagged.append((name, "<error>", str(e).splitlines()[0][:160]))
            continue
        for fld in res.schema:
            ts = str(fld.type)
            if "decimal" in ts or "int128" in ts or ts in RISKY:
                flagged.append((name, fld.name, ts))
    for name, col, ts in flagged:
        print(f"FLAG {name}.{col}: {ts}")
    print(f"audited {len(oracles)} oracles; flagged {len(flagged)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
