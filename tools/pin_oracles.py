"""Generate pinned VALUES-literal DuckDB oracles for the registry queries
whose semantics are not directly SQL-expressible (greedy/iterative/
media-synthesis operators).

Provenance, per query (recorded in the generated module docstring):

- ``crawl_bfs_frontier`` — generated from the INDEPENDENT single-threaded
  Python oracle (web_crawler_spark/oracle.py, a from-scratch restatement of
  site-crawler.service.js:129-196 that shares no code with the Spark wave
  loop). This is a genuine cross-implementation oracle.
- ``fuzzy_dedup_greedy``, ``records_pipeline_e2e``, ``image_phash_dedup``,
  ``image_features``, ``audio_features`` — golden pins of the engine's own
  deterministic output at sf0.01 (the driver's correctness scale). These
  catch plumbing/order/regression drift, not independent-semantics bugs;
  kernel-level independence is covered by the pytest oracles
  (tests/test_fuzzy_dedup.py's naive O(n^2) checker, tests/test_images.py
  PSNR/Hamming invariants, tests/test_crawl_identity.py).

Usage: python tools/pin_oracles.py   (rewrites analytics/golden.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
PINNED = [
    "crawl_progress",
    "fuzzy_dedup_greedy",
    "records_pipeline_e2e",
    "image_phash_dedup",
]


def sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr round-trips doubles exactly; ::DOUBLE stops DuckDB from
        # inferring DECIMAL (whose str() renders trailing zeros)
        return f"{repr(v)}::DOUBLE"
    if isinstance(v, int):
        return str(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def values_oracle(cols: list[str], rows: list[tuple]) -> str:
    body = ",\n".join("(" + ", ".join(sql_lit(v) for v in r) + ")" for r in rows)
    collist = ", ".join(cols)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({collist})"


def crawl_oracle_rows() -> tuple[list[str], list[tuple]]:
    """Rows for crawl_bfs_frontier from the independent Python oracle —
    same fixture as the query (n_hosts=3, pages_per_host=25, seed=42,
    max_pages=12, max_depth=3)."""
    from web_crawler_spark.oracle import crawl_all
    from web_crawler_spark.synthetic.web import SyntheticWeb

    web = SyntheticWeb(n_hosts=3, pages_per_host=25, seed=42)
    want = crawl_all(web, max_pages=12, max_depth=3)
    rows = []
    for seed, res in want.items():
        seed_host = seed.split("//", 1)[1].split("/", 1)[0]
        enq = {u: i for i, u in enumerate(res.discovered)}
        for url in res.visit_order:
            rows.append(
                (seed_host, url, res.visit_depth[url], enq[url], "visited")
            )
    return ["seed_host", "url", "depth", "visit_seq", "status"], rows


def main() -> None:
    from web_crawler_spark.analytics import queries as Q
    from web_crawler_spark.session import get_spark

    oracles: dict[str, str] = {}

    cols, rows = crawl_oracle_rows()
    oracles["crawl_bfs_frontier"] = values_oracle(cols, rows)
    print(f"crawl_bfs_frontier: {len(rows)} rows (from Python oracle)")

    spark = get_spark(
        "pin_oracles", cores=8, shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = Q.queries()
    for name in PINNED:
        df = qs[name](spark, SF_DIR)
        rows = [tuple(r) for r in df.collect()]
        oracles[name] = values_oracle(df.columns, rows)
        print(f"{name}: {len(rows)} rows (golden pin)")

    # audio_features retired as a standalone registry query (consolidated
    # into media_features); its golden pin stays the source literal the
    # merged oracle wraps, so keep regenerating it from the helper.
    df = Q._audio_features_rows(spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    oracles["audio_features"] = values_oracle(df.columns, rows)
    print(f"audio_features: {len(rows)} rows (golden pin, media_features source)")

    # image_features was likewise consolidated into a tagged union whose
    # curation arm is closed-form SQL; only the decode-stats arm needs a
    # pin, regenerated from its helper under a non-query key so the
    # composite oracle in queries.py stays authoritative.
    df = Q._image_feature_agg_rows(spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    oracles["image_features_agg"] = values_oracle(df.columns, rows)
    print(f"image_features_agg: {len(rows)} rows (golden pin, image_features source)")

    # per-row emission-invariant arm (north rule: decoded-pixel PSNR >= 40 dB
    # + caption equality), aggregated per format over the SF-independent
    # synthesized fixture — pinned under a non-query key like the above.
    df = Q._image_psnr_agg_rows(spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    oracles["image_psnr_agg"] = values_oracle(df.columns, rows)
    print(f"image_psnr_agg: {len(rows)} rows (golden pin, image_features source)")

    # Hasler–Süsstrunk colorfulness arm, aggregated per format over the
    # same SF-independent fixture — pinned under a non-query key.
    df = Q._image_color_agg_rows(spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    oracles["image_color_agg"] = values_oracle(df.columns, rows)
    print(f"image_color_agg: {len(rows)} rows (golden pin, image_features source)")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "web_crawler_spark", "analytics", "golden.py",
    )
    with open(out, "w") as f:
        f.write(
            '"""Pinned VALUES-literal DuckDB oracles (generated by '
            "tools/pin_oracles.py\n"
            "— regenerate there; do not hand-edit).\n\n"
            "``crawl_bfs_frontier`` is generated from the independent\n"
            "single-threaded Python oracle (web_crawler_spark/oracle.py);\n"
            "the rest are golden pins of the engine's deterministic output\n"
            "at sf0.01 (the driver's correctness scale) — they catch\n"
            "plumbing/order regressions; kernel independence is covered by\n"
            'the pytest oracles.\n"""\n\n'
        )
        f.write("GOLDEN_ORACLES = {\n")
        for name, sql in oracles.items():
            f.write(f"    {name!r}: '''{sql}''',\n")
        f.write("}\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
