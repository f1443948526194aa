"""Property-based tests for the pure-numpy/int sketch kernels.

These layers have no Spark in them (the DataFrame operators call them
inside applyInPandas), so hypothesis can hammer them with hundreds of
randomized cases per run at near-zero cost — fixed-example tests in
tests/test_seen_filter.py already cover the documented behaviors; these
explore the state space the examples can't reach:

- the cuckoo build's round-based kicking loop under arbitrary collision
  patterns and loads up to 0.8 (the path a fixed fixture exercises only
  for one hash layout),
- entry-set/table roundtrip exactness (a cuckoo filter's no-false-
  negative guarantee IS this roundtrip),
- byte-determinism of the table under input permutation (the property
  merge/replay-safety is built on),
- `_iroot` floor-root exactness on integers far beyond float precision
  (the temperature-mixing allocation is engine-exact only if this is).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from web_crawler_spark.operators.dedup import _iroot, temperature_allocation
from web_crawler_spark.operators.seen_filter import (
    _ck_build_table,
    _ck_dedup,
    _ck_entries,
    _ck_extract_entries,
)

N_CELLS = 64  # deliberately tiny: high load → many kick rounds
N_SLOTS = 4


def _entry_keys(fp: np.ndarray, canon: np.ndarray) -> set:
    return set(((canon.astype(np.uint64) << np.uint64(16)) | fp).tolist())


@st.composite
def hash_pairs(draw):
    n = draw(st.integers(min_value=1, max_value=int(0.8 * N_CELLS * N_SLOTS)))
    seed = draw(st.integers(min_value=0, max_value=2**32 - 1))
    rng = np.random.default_rng(seed)
    h1 = rng.integers(-(2**63), 2**63 - 1, n, dtype=np.int64)
    h2 = rng.integers(-(2**63), 2**63 - 1, n, dtype=np.int64)
    return h1, h2


@settings(max_examples=200, deadline=None)
@given(hash_pairs())
def test_cuckoo_build_extract_roundtrip_is_exact(pair):
    """No false negatives and no phantom entries: the packed table decodes
    to exactly the canonical entry set that went in, whatever the
    collision pattern forced the kicking loop to do."""
    h1, h2 = pair
    fp, canon = _ck_entries(h1, h2, N_CELLS)
    fp, canon = _ck_dedup(fp, canon)
    table = _ck_build_table(fp, canon, N_CELLS, N_SLOTS)
    efp, ecanon = _ck_extract_entries(table, N_CELLS)
    assert _entry_keys(efp, ecanon) == _entry_keys(fp, canon)
    # every stored fingerprint sits in one of its two legal cells: the
    # canon recomputed from its actual cell must be an inserted entry
    from web_crawler_spark.operators.seen_filter import _ck_cellhash

    cells, slots = np.nonzero(table)
    stored = table[cells, slots]
    recanon = np.minimum(cells, cells ^ _ck_cellhash(stored, N_CELLS))
    assert _entry_keys(stored, recanon) <= _entry_keys(fp, canon)


@settings(max_examples=100, deadline=None)
@given(hash_pairs(), st.integers(min_value=0, max_value=2**32 - 1))
def test_cuckoo_table_bytes_invariant_under_input_order(pair, perm_seed):
    """merge/replay-safety rests on 'same entry set → byte-identical
    table'; _ck_dedup's sort must erase any trace of arrival order."""
    h1, h2 = pair
    perm = np.random.default_rng(perm_seed).permutation(len(h1))
    fp_a, canon_a = _ck_dedup(*_ck_entries(h1, h2, N_CELLS))
    fp_b, canon_b = _ck_dedup(*_ck_entries(h1[perm], h2[perm], N_CELLS))
    ta = _ck_build_table(fp_a, canon_a, N_CELLS, N_SLOTS)
    tb = _ck_build_table(fp_b, canon_b, N_CELLS, N_SLOTS)
    assert ta.tobytes() == tb.tobytes()


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**40),
    st.integers(min_value=1, max_value=7),
)
def test_iroot_is_exact_floor_root(n, k):
    r = _iroot(n, k)
    assert r**k <= n
    assert (r + 1) ** k > n


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=4),
                  st.integers(min_value=1, max_value=10**12)),
        min_size=1, max_size=8, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=0, max_value=10**9),
)
def test_temperature_allocation_never_overspends(sizes, budget):
    alloc = temperature_allocation(sizes, budget)
    assert sum(alloc.values()) <= budget
    assert all(v >= 0 for v in alloc.values())
    # alpha = 1 degenerates to plain proportional allocation
    flat = temperature_allocation(sizes, budget, alpha=(1, 1))
    w = {name: sz for name, sz in sizes}
    tot = sum(w.values())
    assert flat == {name: budget * w[name] // tot for name in w}


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=4),
                  st.integers(min_value=1, max_value=10**9)),
        min_size=1, max_size=10, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=1, max_value=8),
)
def test_unimax_allocation_invariants(sizes, budget, max_epochs):
    """The three contracts of Chung et al.'s allocation: never overspend,
    never exceed the per-stratum epoch cap, and leave slack only when
    EVERY stratum is capped (otherwise an uncapped stratum would have
    absorbed it)."""
    from web_crawler_spark.operators.dedup import unimax_allocation

    alloc = unimax_allocation(sizes, budget, max_epochs)
    assert set(alloc) == {name for name, _ in sizes}
    assert sum(alloc.values()) <= budget
    w = dict(sizes)
    assert all(0 <= alloc[nm] <= max_epochs * w[nm] for nm in alloc)
    spent = sum(alloc.values())
    if spent < budget:
        # slack implies the LARGEST stratum hit its cap (it sees all the
        # remaining budget last and absorbs anything under its cap; only
        # integer floor dust < n_strata may remain otherwise)
        largest = max(sizes, key=lambda kv: (kv[1], kv[0]))[0]
        n = len(sizes)
        assert alloc[largest] == max_epochs * w[largest] or budget - spent < n
