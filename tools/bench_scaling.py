"""North-star scaling benchmark: frontier URLs scheduled + deduped / sec,
measured at two parallelism levels on the same input (sandbox stand-in for
N vs 4N executors per BASELINE.json).

One "wave" of the crawl scheduler at synthetic scale, never materialized
to disk (SURVEY.md §7.3.7): candidate URLs and the URL-seen set are both
generated distributed from ``spark.range`` + hash-derived attributes.
Pipeline measured (the north_rule's scheduling+dedup path):

  candidates → canonicalize (F3) → exclusion filter (F1)
  → Bloom-free exact anti-join vs seen set (J1, hash-partitioned)
  → per-host politeness window rank with budget (W1/W4, salted by design:
    hosts are the partition key and the generator spreads URLs uniformly)
  → scheduled count

Usage:
  python tools/bench_scaling.py --cores 8  --rows 4000000   # one level
  python tools/bench_scaling.py --sweep                     # 8 then 32, prints summary

--sweep runs each level in a fresh subprocess (own JVM) and reports
throughput at both plus efficiency = (thr_hi / thr_lo) / (hi / lo).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOSTS = 10_000
HOST_BUDGET = 200


def _timed(action) -> float:
    t0 = time.time()
    action()
    return time.time() - t0


def build_urls(spark, n: int, offset: int = 0):
    """Deterministic URL table: ~uniform across N_HOSTS hosts, mixed
    priority-tier paths, some with query/fragment junk and excluded
    extensions. Pure column expressions from spark.range."""
    from pyspark.sql import functions as F

    segs = ["contact", "products", "location", "blog", "office",
            "about", "news", "store", "company", "item"]
    exts = ["", ".html", ".jpg", "", ".pdf", "", ""]
    df = spark.range(offset, offset + n)
    h = F.xxhash64("id")
    seg = F.element_at(F.array(*[F.lit(s) for s in segs]), (F.pmod(h, 10) + 1).cast("int"))
    ext = F.element_at(F.array(*[F.lit(e) for e in exts]), (F.pmod(h, 7) + 1).cast("int"))
    tail = F.when(F.pmod(h, 11) == 0, F.lit("?session=1")).otherwise(F.lit(""))
    host = F.concat(F.lit("host"), F.pmod(h, N_HOSTS).cast("string"), F.lit(".com"))
    return df.select(
        F.concat(
            F.lit("https://"), host, F.lit("/"), seg, F.lit("/p"),
            F.col("id").cast("string"), ext, tail,
        ).alias("url"),
        host.alias("host"),
        F.col("id").alias("discovery_seq"),
    )


def run_once(cores: int, rows: int, seen_rows: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_crawler_spark.functions import urls as U
    from web_crawler_spark.session import get_spark

    # 16g heap: an oversized (32g+) heap measurably anti-scales at high
    # thread counts (G1 region churn); a real cluster sizes executor heaps
    # per-core, which this mirrors.
    # 4 partitions/core: smaller sort buffers per concurrent task keep
    # execution memory stable at high thread counts (oversized heaps +
    # fat partitions measurably GC-thrash at 32 threads)
    spark = get_spark(
        f"wcs_scale_{cores}", cores=cores, shuffle_partitions=cores * 4,
        extra_conf={
            "spark.driver.memory": "16g",
            # shuffle files on tmpfs: local-mode stand-in for cluster-grade
            # shuffle I/O; on a real cluster this is the external shuffle
            # service / NVMe path
            "spark.local.dir": "/dev/shm/wcs-shuffle",
        },
    )

    cand = build_urls(spark, rows)
    # 30% of candidates overlap the seen range → real dedup work
    seen = build_urls(spark, seen_rows, offset=int(rows * 0.7)).select("host", "url")

    # ONE shuffle total: hash-partition both sides by host; HashPartitioning
    # on a subset of the join keys satisfies the join's ClusteredDistribution,
    # and the politeness window (partitionBy host) reuses the same exchange.
    n_part = cores * 4
    pipeline = (
        cand.withColumn("url", U.canonicalize("url"))
        .filter(~U.is_excluded("url"))
        .repartition(n_part, "host")
        .join(seen.repartition(n_part, "host"), ["host", "url"], "left_anti")
        .withColumn("tier", U.priority_tier("url"))
    )
    w = Window.partitionBy("host").orderBy("tier", "discovery_seq")
    scheduled = (
        pipeline.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HOST_BUDGET)
    )
    # cold pass: JIT + whole-stage-codegen compile of the regex kernels;
    # warm passes are the steady-state throughput a long crawl actually
    # runs at — best-of-3 to damp sandbox noisy-neighbor variance
    t0 = time.time()
    n_sched = scheduled.count()
    cold = time.time() - t0
    warm = min(
        _timed(scheduled.count) for _ in range(3)
    )
    out = {
        "cores": cores,
        "rows": rows,
        "seen_rows": seen_rows,
        "scheduled": n_sched,
        "cold_sec": round(cold, 3),
        "sec": round(warm, 3),
        "urls_per_sec": round(rows / warm, 1),
    }
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--rows", type=int, default=12_000_000)
    ap.add_argument("--seen-rows", type=int, default=6_000_000)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--levels", type=str, default="2,8")
    args = ap.parse_args()

    if not args.sweep:
        print(json.dumps(run_once(args.cores, args.rows, args.seen_rows)))
        return

    levels = [int(x) for x in args.levels.split(",")]
    results = []
    for c in levels:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(c),
             "--rows", str(args.rows), "--seen-rows", str(args.seen_rows)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
        print(f"# local[{c}]: {results[-1]['urls_per_sec']} urls/s "
              f"({results[-1]['sec']}s)", file=sys.stderr)
    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / ratio
    print(json.dumps({
        "metric": "frontier URLs scheduled+deduped/sec",
        "levels": results,
        "scaling_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
