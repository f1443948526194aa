"""Image-axis scaling benchmark: image+caption pairs curated + deduped
+ laid out / sec at two parallelism levels on the same input (N vs 4N
stand-in, like tools/bench_scaling.py but over the payload pipeline —
graft cell axis B).

4M (default) input_hint-shaped metadata rows generated distributed from
``spark.range`` (no Python anywhere in the pipeline). Path measured:

  curation gates (regex column algebra, narrow)
  → exact caption dedup (fingerprint groupBy window — shuffle 1)
  → phash near-dup collapse (pigeonhole banding, n_blocks=3 → 22-bit
    blocks sized for random-hash corpora at this scale; the 13-bit
    default would put ~1.5k rows in every block and the candidate join
    goes quadratic — the same bucket-width-vs-corpus-size rule lsh_topk
    documents — shuffle 2)
  → SDXL aspect bucketing (argmin fold, narrow) + batch window
  → WebDataset shard layout (writer-stream cumsum window)

Window parallelism: the batch window runs with n_streams=64 salt
streams per bucket (17 × 64 partitions) and the shard layout with 64
writers, so no window key ceiling sits below the widest level measured.

Usage:
  python tools/bench_pairs_scaling.py --cores 8 --rows 4000000
  python tools/bench_pairs_scaling.py --sweep          # 2 then 8
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(action) -> float:
    t0 = time.time()
    action()
    return time.time() - t0


def build_pairs(spark, n: int):
    """Deterministic input_hint metadata: hash-derived dims/format/caption,
    ~1% planted phash near-dups (1-bit sibling of the previous row) and
    ~0.5% duplicate captions. Pure column expressions."""
    from pyspark.sql import functions as F

    df = spark.range(n)
    h = F.xxhash64("id")
    w = (F.lit(64) + F.pmod(h, 40) * 32).cast("int")
    ht = (F.lit(64) + F.pmod(F.xxhash64("id", F.lit(7)), 40) * 32).cast("int")
    fmt = F.when(F.pmod(h, 19) == 0, F.lit("gif")).when(
        F.pmod(h, 3) == 0, F.lit("jpeg")
    ).otherwise(F.lit("png"))
    cap_key = F.when(F.pmod(h, 200) == 0, F.lit(0)).otherwise(F.col("id"))
    caption = F.when(F.pmod(h, 29) == 0, F.lit("IMG_1234 photo")).otherwise(
        F.concat(F.lit("a photo of scene "), cap_key.cast("string"),
                 F.lit(" in style "), F.pmod(h, 1000).cast("string"))
    )
    phash = F.when(
        F.pmod(h, 100) == 0,
        F.xxhash64((F.col("id") - 1).cast("long")).bitwiseXOR(F.lit(1)),
    ).otherwise(F.xxhash64(F.col("id").cast("long")))
    return df.select(
        F.concat(F.lit("img_"), F.col("id").cast("string")).alias("image_id"),
        w.alias("w"), ht.alias("h"), fmt.alias("fmt"),
        caption.alias("caption"), phash.alias("phash"),
    )


def run_once(cores: int, rows: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from pyspark.sql import functions as F

    from web_crawler_spark.images import aspect_bucket, curate_pairs, shard_pack
    from web_crawler_spark.operators.dedup import (
        dedup_exact_text,
        phash_neardup_pairs,
    )
    from web_crawler_spark.session import get_spark

    spark = get_spark(
        f"wcs_pairs_scale_{cores}", cores=cores, shuffle_partitions=cores * 4,
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.local.dir": "/dev/shm/wcs-shuffle",
        },
    )
    def build():
        # rebuilt per pass: re-collecting ONE DataFrame object reuses its
        # RDD lineage and therefore its shuffle outputs (only the result
        # stage would re-run) — a fresh plan per pass measures the real
        # end-to-end pipeline, matching bench.py's protocol
        pairs = build_pairs(spark, rows)
        kept = (
            curate_pairs(pairs)
            .filter(F.col("keep"))
            .drop("keep", "reject_reason", "aspect", "n_caption_tokens")
        )
        kept = dedup_exact_text(kept, text_col="caption", order="image_id")
        dup = phash_neardup_pairs(
            kept, "image_id", "phash", max_hamming=2, n_blocks=3
        )
        kept = kept.join(
            dup.select(F.col("b").alias("image_id")).distinct(),
            "image_id", "left_anti",
        )
        laid = shard_pack(
            aspect_bucket(kept, n_streams=64).withColumn(
                "_eb", (F.col("w").cast("long") * F.col("h") * 3
                        + F.length("caption")).cast("long")
            ),
            "_eb",
            n_writers=64,
        )
        return laid.select(
            F.count(F.lit(1)).alias("n"), F.sum("shard_idx").alias("chk")
        )

    t0 = time.time()
    out_row = build().collect()[0]
    cold = time.time() - t0
    warm = min(_timed(lambda: build().collect()) for _ in range(3))
    res = {
        "cores": cores,
        "rows": rows,
        "kept": int(out_row["n"]),
        "checksum": int(out_row["chk"]),
        "cold_sec": round(cold, 3),
        "sec": round(warm, 3),
        "pairs_per_sec": round(rows / warm, 1),
    }
    spark.stop()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--levels", type=str, default="2,8")
    args = ap.parse_args()

    if not args.sweep:
        print(json.dumps(run_once(args.cores, args.rows)))
        return

    levels = [int(x) for x in args.levels.split(",")]
    results = []
    for c in levels:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(c),
             "--rows", str(args.rows)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
        print(f"# local[{c}]: {results[-1]['pairs_per_sec']} pairs/s "
              f"({results[-1]['sec']}s)", file=sys.stderr)
    lo, hi = results[0], results[-1]
    assert lo["kept"] == hi["kept"] and lo["checksum"] == hi["checksum"], \
        "levels disagree on output — not a valid scaling pair"
    ratio = hi["cores"] / lo["cores"]
    eff = (hi["pairs_per_sec"] / lo["pairs_per_sec"]) / ratio
    print(json.dumps({
        "metric": "image+caption pairs curated+deduped+laid out/sec",
        "levels": results,
        "scaling_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
