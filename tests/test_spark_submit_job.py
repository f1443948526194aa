"""North-rule packaging: the engine must run via
``spark-submit --py-files`` as a self-contained zip, and resume from its
checkpoint with identical final state."""

from __future__ import annotations

import json
import os
import subprocess
import sys

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(workdir: str, *extra: str) -> dict:
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", os.path.join(ROOT, "dist", "wcs.zip"),
        os.path.join(ROOT, "jobs", "crawl_job.py"),
        "--workdir", workdir, "--hosts", "3", "--pages", "10",
        "--max-pages", "8", "--max-depth", "2", *extra,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=400, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_spark_submit_packaged_job(tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        import pytest

        pytest.skip("spark-submit not available")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package_pyfiles.py")],
        check=True,
    )
    wd = str(tmp_path / "job")
    first = _run_job(wd)
    assert first["visited"] > 0 and first["records"] > 0

    resumed = _run_job(wd, "--resume")
    assert resumed["visited"] == first["visited"]
    assert resumed["frontier_rows"] == first["frontier_rows"]
    assert resumed["records"] == first["records"]


def test_spark_submit_corpus_job(tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        import pytest

        pytest.skip("spark-submit not available")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package_pyfiles.py")],
        check=True,
    )

    def run(mode: str, *extra: str) -> dict:
        cmd = [
            SPARK_SUBMIT, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", os.path.join(ROOT, "dist", "wcs.zip"),
            os.path.join(ROOT, "jobs", "corpus_job.py"),
            "--mode", mode, "--out", str(tmp_path / mode), *extra,
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=400, check=True
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    text = run("text", "--sf-dir", "/root/testdata/sf0.001")
    assert 0 < text["rows_out"] <= text["rows_in"]
    assert text["total_tokens"] > 0

    pairs = run("pairs", "--n-pairs", "80", "--elect-caption",
                "--wds-dir", str(tmp_path / "wds"))
    assert 0 < pairs["rows_out"] < pairs["rows_in"]
    assert pairs["shards"] >= 1
    # the WebDataset release materialized real tar shards
    assert pairs["wds_shards"] >= 1 and pairs["wds_bytes"] > 0
    tars = [f for f in os.listdir(tmp_path / "wds") if f.endswith(".tar")]
    assert len(tars) == pairs["wds_shards"]


def test_spark_submit_ingest_warc_job(tmp_path):
    """The archive-replay job end-to-end under spark-submit: synthesized
    .warc.gz shards → binary-lane bytes + markup captions → pair lake
    with lineage + metrics; pairs decode and captions match the page
    markup contract."""
    if not os.path.exists(SPARK_SUBMIT):
        import pytest

        pytest.skip("spark-submit not available")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package_pyfiles.py")],
        check=True,
    )
    arc, out = str(tmp_path / "arc"), str(tmp_path / "pairs")
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--py-files", os.path.join(ROOT, "dist", "wcs.zip"),
        os.path.join(ROOT, "jobs", "ingest_warc_job.py"),
        "--archive", arc, "--out", out, "--synthesize", "3", "--pages", "6",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=400,
                         check=True)
    m = json.loads(res.stdout.strip().splitlines()[-1])
    assert m["pairs"] > 0 and m["records"] > m["pairs"]
    assert m["hosts"] == 3

    # snapshot metadata: lineage per host + the job's summary metrics
    import glob

    snaps = sorted(glob.glob(os.path.join(out, "metadata", "snap-*.json")))
    assert snaps
    snap = json.load(open(snaps[-1]))
    assert snap["summary"]["n_pairs"] == m["pairs"]
    assert len(snap["partition_lineage"]) == 3
    assert sum(snap["partition_lineage"].values()) == m["pairs"]
