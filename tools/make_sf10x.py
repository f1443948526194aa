"""Synthesize an sf1.0-equivalent dataset (10x sf0.1) for the
scale-linearity evidence run — /root/testdata is read-only and ships no
sf1.0, so this derives one deterministically: 10 key-shifted copies of
every fact table (keys offset by copy * stride so joins stay consistent
within each copy and keys never collide across copies), dims
(region/nation) kept as-is.

Document text gets a per-copy prefix so the dedup surfaces see a 10x
CORPUS, not the same corpus 10 times (identical texts would turn every
near-dup band into a 10-member clique and measure pair explosion, not
scale). Embedding vectors get a tiny per-copy deterministic offset for
the same reason.

Usage: python tools/make_sf10x.py [/tmp/sf1.0]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10
STRIDE = 10_000_000


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    from pyspark.sql import functions as F

    from web_crawler_spark.session import get_spark

    spark = get_spark(
        "make_sf10x", cores=8, shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g",
                    "spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(out_dir, exist_ok=True)

    shifts = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"{t}: copied dim")
    for t, keys in shifts.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast("long"))
            if t == "documents" and i > 0:
                # rewrite high-frequency tokens per copy so shingle sets
                # REALLY diverge: a prefix alone leaves Jaccard ≈ 0.99 and
                # every doc gains 9 planted near-dups — the dedup queries
                # would then measure pair-density growth (quadratic by
                # construction), not corpus scaling
                c = c.withColumn(
                    "text",
                    F.concat(
                        F.lit(f"copy{i} variant "),
                        F.regexp_replace(
                            F.regexp_replace("text", r"\bthe\b", f"the{i}"),
                            r"\ba\b", f"a{i}",
                        ),
                    ),
                ).withColumn("n_chars", F.length("text"))
            if t == "embeddings" and i > 0:
                # deterministic per-copy decorrelation strong enough to
                # leave the cosine near-dup radius (0.95): same rationale
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (
                            x + F.cos(j.cast("double") * 2.39996 + F.lit(float(i)))
                            * F.lit(0.3)
                        ).cast("float"),
                    ),
                )
            copies.append(c)
        allc = copies[0]
        for c in copies[1:]:
            allc = allc.unionByName(c)
        allc.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
