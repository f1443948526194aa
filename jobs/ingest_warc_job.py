"""Archive-ingestion entry point: spark-submit --py-files wcs.zip
jobs/ingest_warc_job.py

Replays a Common-Crawl-style .warc.gz archive into the pair lake — the
"crawl already happened" twin of jobs/crawl_job.py. One binaryFile +
per-member-gunzip scan (sources/warc.py:read_warc_gz_binary) fans out by
media type:

- text/html 2xx responses: the binary-safe HTTP parse
  (http_response_binary) yields the entity, which decodes to HTML and
  flows through the <img> caption extraction (operators/extract.py:
  extract_images) — captions live in the page markup, not the image
  record;
- image/* 2xx responses keep BYTE bodies end-to-end: the zero-decode
  header audit columns (images.sniff_format/png_ihdr) supply fmt/w/h at
  scan speed, and the decode+phash mapInPandas runs only on records the
  audit admits.

The join on the image URL marries markup captions to image bytes and
lands input_hint-shaped rows (image_id, bytes, w, h, fmt, caption,
phash) in a SnapshotTable with per-host lineage and ingest metrics in
the snapshot summary.

``--synthesize N`` writes a deterministic N-host fixture archive first
(SyntheticWeb HTML + real PNG payloads, gzip member per record, mtime
0), so the job runs end-to-end anywhere.

Usage:
  python tools/package_pyfiles.py
  spark-submit --master local[8] --py-files dist/wcs.zip \
      jobs/ingest_warc_job.py --archive /tmp/arc --out /tmp/pairs \
      --synthesize 3
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def synthesize_archive(archive_dir: str, n_hosts: int, pages: int) -> int:
    """Deterministic fixture archive: one .warc.gz shard per host, html
    response records for every page plus one image/png response per
    distinct <img> the host's markup references. Returns record count."""
    import os
    import re

    from web_crawler_spark.images import encode_png, synth_pixels
    from web_crawler_spark.sources.warc import write_warc_gz
    from web_crawler_spark.synthetic.web import SyntheticWeb

    os.makedirs(archive_dir, exist_ok=True)
    web = SyntheticWeb(n_hosts=n_hosts, pages_per_host=pages, seed=13)
    total = 0
    for h in range(web.n_hosts):
        host = web.host(h)
        recs: list[bytes] = []
        seen_imgs: dict[str, None] = {}
        for p in range(web.n_pages(h)):
            body = web.body(h, p)
            for img in re.findall(r'<img src="/images/(img_\d+)\.png"', body):
                seen_imgs.setdefault(img, None)
            msg = (
                "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
                "\r\n\r\n" + body
            ).encode("utf-8")
            recs.append(
                (
                    f"WARC/1.0\r\nWARC-Type: response\r\n"
                    f"WARC-Target-URI: {web.url(h, p)}\r\n"
                    f"WARC-Date: 2024-01-15T00:00:00Z\r\n"
                    f"Content-Length: {len(msg)}\r\n\r\n"
                ).encode("ascii") + msg + b"\r\n\r\n"
            )
        for img in seen_imgs:
            png = encode_png(synth_pixels(img, 48, 32))
            msg = (
                b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n" + png
            )
            recs.append(
                (
                    f"WARC/1.0\r\nWARC-Type: response\r\n"
                    f"WARC-Target-URI: https://{host}/images/{img}.png\r\n"
                    f"WARC-Date: 2024-01-15T00:00:01Z\r\n"
                    f"Content-Length: {len(msg)}\r\n\r\n"
                ).encode("ascii") + msg + b"\r\n\r\n"
            )
        write_warc_gz(recs, os.path.join(archive_dir, f"{host}.warc.gz"))
        total += len(recs)
    return total


def ingest(spark: SparkSession, archive_dir: str, out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from web_crawler_spark import images as IM
    from web_crawler_spark.lake import SnapshotTable
    from web_crawler_spark.operators.extract import extract_images
    from web_crawler_spark.sources import warc as W

    t0 = time.time()
    recs = W.read_warc_gz_binary(spark, archive_dir)
    h = W.http_response_binary(F.col("body"))
    routed = recs.select(
        "file", "record_ord", "target_uri", "len_ok",
        h["http_status"].alias("http_status"),
        h["http_content_type"].alias("http_content_type"),
        h["payload"].alias("payload"),
    ).filter(F.col("len_ok") & (F.col("http_status") == 200))

    # html lane: markup captions. seed_host from the record URI.
    html = routed.filter(F.col("http_content_type") == "text/html").select(
        F.col("target_uri").alias("url"),
        F.regexp_extract("target_uri", r"https?://([^/]+)", 1).alias("seed_host"),
        F.decode("payload", "UTF-8").alias("body"),
    )
    captions = extract_images(html).select(
        F.concat(
            F.lit("https://"), "seed_host", F.lit("/images/"),
            "image_id", F.lit(".png"),
        ).alias("img_url"),
        "seed_host", "image_id", "caption",
    ).dropDuplicates(["img_url"])

    # image lane: BYTES + zero-decode header fields
    imgs = routed.filter(
        F.col("http_content_type").startswith("image/")
    ).select(F.col("target_uri").alias("img_url"), F.col("payload").alias("bytes"))
    ih = IM.png_ihdr(F.col("bytes"))
    audited = imgs.select(
        "img_url", "bytes",
        IM.sniff_format(F.col("bytes")).alias("fmt"),
        ih["w"].alias("w"), ih["h"].alias("h"), ih["ihdr_ok"].alias("_ok"),
    ).filter(F.col("_ok")).drop("_ok")

    pairs = audited.join(captions, "img_url", "inner").select(
        "image_id", "bytes",
        F.col("w").cast("int"), F.col("h").cast("int"),
        "fmt", "caption", "seed_host", "img_url",
    )
    feats = IM.image_features(
        pairs.select("image_id", "bytes", "w", "h", "fmt", "caption")
    ).select("image_id", "phash")
    out = pairs.join(feats, "image_id").select(
        "image_id", "bytes", "w", "h", "fmt", "caption",
        "phash", "seed_host",
    )

    tbl = SnapshotTable(out_dir)
    n_records = recs.count()
    n_pairs = out.count()
    tbl.append(
        out, partition_by=["seed_host"], lineage_key="seed_host",
        summary={
            "job": "ingest_warc", "n_archive_records": n_records,
            "n_pairs": n_pairs,
        },
    )
    return {
        "records": n_records,
        "pairs": n_pairs,
        "hosts": out.select("seed_host").distinct().count(),
        "seconds": round(time.time() - t0, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--archive", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--synthesize", type=int, default=0,
                    help="write an N-host fixture archive first")
    ap.add_argument("--pages", type=int, default=8)
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    metrics: dict = {}
    if args.synthesize:
        metrics["synthesized_records"] = synthesize_archive(
            args.archive, args.synthesize, args.pages
        )
    metrics.update(ingest(spark, args.archive, args.out))
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
