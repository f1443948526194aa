"""Measure ANN tier quality: recall@k of the LSH, IVF, and PQ tiers
against the exact brute-force top-k, on the embeddings table.

The correctness gate proves each tier computes what it CLAIMS (bucket
assignment mirrored in SQL); this tool measures what that buys — the
accuracy/cost trade the tiers exist for. "Measure, don't guess":
a pruning tier whose recall collapses is a bug the row-hash gate cannot
see, because pruning is part of the contract.

Usage: python tools/ann_recall.py [sf_dir] [k]
Prints one JSON line with recall@k per tier at the default pruning
aggressiveness AND one notch wider (probe_hamming / nprobe doubled), so
the accuracy↔cost knob is measured, not asserted. The trained-codebook
IVF row quantifies what the Lloyd iterations buy over hash seeding.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from web_crawler_spark.operators import similarity as S
    from web_crawler_spark.session import get_spark

    spark = get_spark(
        "ann_recall", cores=8, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    corpus = emb.select("vec_id", "embedding")
    queries = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    n_corpus = corpus.count()
    n_queries = queries.count()

    def topk_sets(df):
        rows = df.select("query_id", "vec_id").collect()
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    truth = topk_sets(S.brute_force_topk(corpus, queries, k=k))

    def recall(approx: dict[int, set]) -> float:
        hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
        return round(hits / max(sum(len(v) for v in truth.values()), 1), 4)

    tiers: dict[str, dict] = {}

    tiers["lsh"] = {
        "recall_at_k": recall(topk_sets(S.lsh_topk(corpus, queries, k=k))),
        "recall_probe2": recall(
            topk_sets(S.lsh_topk(corpus, queries, k=k, probe_hamming=2))
        ),
    }
    tiers["ivf"] = {
        "recall_at_k": recall(
            topk_sets(S.ivf_topk(corpus, queries, k=k, n_centroids=8, nprobe=2))
        ),
        "recall_nprobe4": recall(
            topk_sets(S.ivf_topk(corpus, queries, k=k, n_centroids=8, nprobe=4))
        ),
    }
    # PQ-ADC: recall is bounded by quantization distortion, not pruning —
    # m/n_centroids trade code size for fidelity. Note PQ ranks by
    # approximate L2 while truth is cosine top-k; on ~unit-norm synthetic
    # embeddings the two orders mostly agree, so recall@k is still the
    # meaningful quality number for the tier.
    tiers["pq"] = {
        "recall_at_k": recall(
            topk_sets(S.pq_topk(corpus, queries, k=k, m=4, n_centroids=8))
        ),
        "recall_m8": recall(
            topk_sets(S.pq_topk(corpus, queries, k=k, m=8, n_centroids=8))
        ),
        "recall_m8_k16": recall(
            topk_sets(S.pq_topk(corpus, queries, k=k, m=8, n_centroids=16))
        ),
    }
    pcb = S.pq_train_codebooks(corpus, m=8, k=16, iters=3)
    tiers["pq_trained"] = {
        "recall_m8_k16": recall(
            topk_sets(
                S.pq_topk(corpus, queries, k=k, m=8, n_centroids=16, codebooks=pcb)
            )
        ),
        "distortion_drop_pct": round(
            100.0
            * (
                1.0
                - S.pq_distortion(corpus, pcb)
                / S.pq_distortion(corpus, S.pq_codebooks(corpus, m=8, k=16))
            ),
            1,
        ),
    }
    # IVFADC: coarse pruning bounds recall like IVF-flat; residual PQ adds
    # quantization error on top. The interesting delta is vs the pq row
    # (same code budget, residual encoding) and vs ivf (same probe set,
    # exact vs quantized scoring).
    tiers["ivfadc"] = {
        "recall_at_k": recall(
            topk_sets(
                S.ivfadc_topk(corpus, queries, k=k, n_centroids=8, nprobe=2,
                              m=8, pq_k=16)
            )
        ),
        "recall_nprobe4": recall(
            topk_sets(
                S.ivfadc_topk(corpus, queries, k=k, n_centroids=8, nprobe=4,
                              m=8, pq_k=16)
            )
        ),
    }
    cb = S.ivf_train_codebook(corpus, n_centroids=8, iters=3)
    tiers["ivf_trained"] = {
        "recall_at_k": recall(
            topk_sets(
                S.ivf_topk(corpus, queries, k=k, n_centroids=8, nprobe=2, codebook=cb)
            )
        ),
        "recall_nprobe4": recall(
            topk_sets(
                S.ivf_topk(corpus, queries, k=k, n_centroids=8, nprobe=4, codebook=cb)
            )
        ),
    }

    print(
        json.dumps(
            {
                "k": k,
                "n_corpus": n_corpus,
                "n_queries": n_queries,
                "tiers": tiers,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
