"""Seen-filter probe-mode crossover benchmark: broadcast vs cogroup for
BOTH sketch families (bloom, cuckoo) at three declared filter sizes, with
byte-agreement checked at every cell.

What it answers: at which filter size does collecting + broadcasting the
whole filter stop beating the bucket-cogroup shuffle — i.e. where should
``BROADCAST_BYTES_MAX`` (the ``mode='auto'`` threshold in
operators/seen_filter.py) sit? The probe workload is fixed (same
candidate table every cell); only the filter geometry and mode vary, so
the timing differences are the mode costs themselves.

Caveat recorded with the numbers: in local mode "broadcast" is an
intra-process copy, so the measured crossover UNDERSTATES broadcast cost
vs a real cluster (per-executor network fan-out + driver memory
pressure); the cluster crossover arrives earlier, which is why the
shipped default (64 MiB, seen_filter.BROADCAST_BYTES_MAX — tuned FROM
this benchmark) sits at the measured knee rather than past it.

Usage: python tools/bench_seen_filter.py [--rows 2000000] [--cores 8]
Prints one JSON line per (sketch, size, mode) cell plus a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, bloom geometry, cuckoo geometry) — bytes are derived, not declared
SIZES = [
    ("S", dict(n_buckets=32, m_bits=1 << 20), dict(n_buckets=32, n_cells=1 << 13, n_slots=4)),
    ("M", dict(n_buckets=64, m_bits=1 << 23), dict(n_buckets=64, n_cells=1 << 16, n_slots=4)),
    ("L", dict(n_buckets=64, m_bits=1 << 26), dict(n_buckets=64, n_cells=1 << 19, n_slots=4)),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--members", type=int, default=500_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from web_crawler_spark.operators import seen_filter as SF
    from web_crawler_spark.session import get_spark

    spark = get_spark(
        "bench_seen_filter", cores=args.cores, shuffle_partitions=args.cores,
        extra_conf={
            "spark.driver.memory": "12g",
            "spark.ui.showConsoleProgress": "false",
        },
    )

    def urls(n: int) -> "object":
        return spark.range(n).select(
            F.concat(F.lit("https://h"), (F.col("id") % 9973).cast("string"),
                     F.lit(".example.com/p"), F.col("id")).alias("url")
        )

    cands = urls(args.rows).persist()
    cands.count()
    members = urls(args.members)

    results = []
    for label, bl_geom, ck_geom in SIZES:
        bl_bytes = bl_geom["n_buckets"] * (bl_geom["m_bits"] // 8)
        ck_bytes = ck_geom["n_buckets"] * ck_geom["n_cells"] * ck_geom["n_slots"] * 2
        for sketch, geom, nbytes, build_fn, probe_fn in (
            ("bloom", bl_geom, bl_bytes, SF.build_bloom, SF.prune),
            ("cuckoo", ck_geom, ck_bytes, SF.build_cuckoo, SF.prune_cuckoo),
        ):
            filt = build_fn(members, **geom).persist()
            filt.count()
            counts = {}
            for mode in ("broadcast", "cogroup"):
                t0 = time.time()
                n_seen = (
                    probe_fn(cands, filt, mode=mode, **geom)
                    .filter(F.col("maybe_seen")).count()
                )
                dt = time.time() - t0
                counts[mode] = n_seen
                row = {
                    "sketch": sketch, "size": label, "bytes": nbytes,
                    "mode": mode, "sec": round(dt, 2),
                    "rows": args.rows, "maybe_seen": n_seen,
                }
                results.append(row)
                print(json.dumps(row), flush=True)
            # byte-agreement: identical flagged counts AND identical rows
            a = probe_fn(cands, filt, mode="broadcast", **geom)
            b = probe_fn(cands, filt, mode="cogroup", **geom)
            mismatch = (
                a.withColumnRenamed("maybe_seen", "ma")
                .join(b.withColumnRenamed("maybe_seen", "mb"), "url")
                .filter(F.col("ma") != F.col("mb")).count()
            )
            assert mismatch == 0, f"{sketch}/{label}: modes disagree on {mismatch} rows"
            assert counts["broadcast"] == counts["cogroup"]
            filt.unpersist()

    print("\nsketch size    bytes  broadcast  cogroup  winner")
    by = {(r["sketch"], r["size"], r["mode"]): r for r in results}
    for label, *_ in SIZES:
        for sketch in ("bloom", "cuckoo"):
            br = by[(sketch, label, "broadcast")]
            cg = by[(sketch, label, "cogroup")]
            win = "broadcast" if br["sec"] <= cg["sec"] else "cogroup"
            print(f"{sketch:6s} {label:4s} {br['bytes']:>9d}  "
                  f"{br['sec']:>8.2f} {cg['sec']:>8.2f}  {win}")
    spark.stop()


if __name__ == "__main__":
    main()
