"""Partitioned Bloom filter: no false negatives, bounded false positives,
mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_crawler_spark.operators import seen_filter as SF


def _urls(spark, start, n, tag="a"):
    return spark.range(start, start + n).select(
        F.format_string(f"https://h%03d.example.com/{tag}/p%d", (F.col("id") % 50).cast("int"), F.col("id")).alias("url")
    )


def test_no_false_negatives_and_low_fpr(spark):
    members = _urls(spark, 0, 5000).cache()
    bloom = SF.build_bloom(members).cache()

    flagged = SF.prune(members, bloom)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0  # never lose a URL

    outsiders = _urls(spark, 1_000_000, 5000, tag="zz")
    fp = SF.prune(outsiders, bloom).filter(F.col("maybe_seen")).count()
    assert fp / 5000 < 0.02, f"false-positive rate too high: {fp}/5000"


def test_merge_is_union(spark):
    a = _urls(spark, 0, 1000)
    b = _urls(spark, 1000, 1000)
    merged = SF.merge_blooms(SF.build_bloom(a), SF.build_bloom(b)).cache()
    both = a.unionByName(b)
    assert SF.prune(both, merged).filter(~F.col("maybe_seen")).count() == 0
