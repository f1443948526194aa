"""The golden pins for the greedy-fuzzy queries must equal the output of
the INDEPENDENT naive O(n^2) checker (tools/naive_fuzzy.py) at the
driver's correctness SF — i.e. the pins are a cross-implementation
oracle, not the engine grading its own homework. Regenerating the pins
(tools/pin_oracles.py) after an engine change cannot silently launder a
semantics bug past this test unless the naive checker reproduces it too.
"""

from __future__ import annotations

import duckdb
import pytest

from web_crawler_spark.analytics.golden import GOLDEN_ORACLES

DRIVER_SF = "/root/testdata/sf0.01"


def _duck_rows(sql: str) -> set[tuple]:
    con = duckdb.connect()
    try:
        return {tuple(r) for r in con.execute(sql).fetchall()}
    finally:
        con.close()


def test_provenance_names_naive_checker():
    import web_crawler_spark.analytics.golden as G

    assert "naive" in (G.__doc__ or ""), (
        "golden.py provenance must name the naive checker"
    )
    assert "tools/naive_fuzzy.py" in (G.__doc__ or "")


def test_fuzzy_greedy_pin_equals_naive_checker(spark):
    from tools.pin_oracles import fuzzy_greedy_rows

    cols, rows = fuzzy_greedy_rows(spark)
    got = {tuple(r) for r in rows}
    pinned = _duck_rows(GOLDEN_ORACLES["fuzzy_dedup_greedy"])
    assert got == pinned


def test_records_e2e_pin_equals_naive_composition(spark):
    from tools.pin_oracles import records_e2e_rows

    cols, rows = records_e2e_rows(spark)

    def norm(r):
        # absorb float formatting between the VALUES literal round-trip
        # and the Spark doubles (both carry repr-exact doubles; rounding
        # here is belt-and-braces for the comparison only)
        return tuple(
            round(v, 9) if isinstance(v, float) else v for v in r
        )

    got = {norm(r) for r in rows}
    pinned = {norm(r) for r in _duck_rows(GOLDEN_ORACLES["records_pipeline_e2e"])}
    assert got == pinned
