"""Round-5 property sweep of the ANN recall envelope (r4 verdict item 8):
the cell_cap/n_bands recall trades were measured at ONE shape in
test_round4_fixes — here hypothesis sweeps (n_planes, n_bands, n_cells,
n_probe, cell_cap) against brute force on planted near-dup fixtures, so
the auto-sizing claims hold across shapes, not just the benched one.

All properties are deterministic given the drawn inputs (planes are md5
replays, centroids are md5-sampled/Lloyd-rounded), so none of these can
flake — they assert structure (monotonicity, containment, bounds), plus
one fixed-seed absolute-recall floor."""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

DIM = 8


def _planted_corpus(seed: int, n_base: int, n_dups: int):
    """Deterministic corpus: n_base unit-ish vectors + n_dups planted
    near-duplicates (base + small perturbation → cosine ≈ 0.99+)."""
    rng = np.random.RandomState(seed)
    base = rng.randn(n_base, DIM)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    for j in range(n_dups):
        src = j % n_base
        noisy = base[src] + 0.02 * rng.randn(DIM)
        rows.append((n_base + j, [float(x) for x in noisy]))
    return rows


def _pairs(df_rows):
    return {(r["q_id"], r["n_id"]) for r in df_rows}


@given(
    seed=st.integers(0, 10_000),
    n_planes=st.integers(4, 10),
    n_base=st.integers(8, 25),
)
@settings(**_SETTINGS)
def test_lsh_candidates_monotone_in_bands(spark, seed, n_planes, n_base):
    """Band b uses the plane family at offset b*n_planes, so band 0 of a
    multi-band run IS the 1-band family — more bands can only ADD
    candidate pairs, never lose one: results(b=1) ⊆ results(b=3) as
    candidate sets, and found pairs carry exact cosines."""
    from upgini_spark.functions.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    rows = _planted_corpus(seed, n_base, n_base // 2)
    df = spark.createDataFrame(rows, "vid int, v array<double>")
    kw = dict(k=3, n_planes=n_planes, dims=DIM)
    got1 = cosine_topk_lsh(df, df, "vid", "vid", "v", "v", n_bands=1, **kw).collect()
    got3 = cosine_topk_lsh(df, df, "vid", "vid", "v", "v", n_bands=3, **kw).collect()
    brute = cosine_topk_bruteforce(df, df, "vid", "vid", "v", "v", k=3).collect()

    # recall against brute top-3 never drops when bands grow
    b_pairs = _pairs(brute)
    r1 = len(_pairs(got1) & b_pairs)
    r3 = len(_pairs(got3) & b_pairs)
    assert r3 >= r1
    # approximation soundness: per query, the LSH best cosine never
    # exceeds the exact best cosine, and equal pairs carry equal scores
    best_b = {r["q_id"]: r["cos"] for r in brute if r["rank"] == 1}
    for r in got3:
        if r["rank"] == 1:
            assert r["cos"] <= best_b[r["q_id"]] + 1e-9
    exact = {(r["q_id"], r["n_id"]): r["cos"] for r in brute}
    for r in got3:
        if (r["q_id"], r["n_id"]) in exact:
            assert r["cos"] == pytest.approx(exact[(r["q_id"], r["n_id"])], abs=2e-6)


@given(
    seed=st.integers(0, 10_000),
    n_cells=st.integers(2, 6),
    n_probe=st.integers(1, 3),
    cap_small=st.integers(2, 6),
)
@settings(**_SETTINGS)
def test_ivf_cell_cap_recall_envelope(spark, seed, n_cells, n_probe, cap_small):
    """A cap ≥ corpus size is EXACTLY the uncapped index; under a small
    cap the candidate set is a SUBSET of the uncapped one, so the
    per-query best cosine can never improve, and any pair present in
    both results carries the identical exact score. (Top-k MEMBERSHIP is
    not monotone — cutting a strong candidate legitimately promotes a
    weaker one into the capped top-k, which is standard IVF list
    truncation.)"""
    from upgini_spark.functions.similarity import cosine_topk_ivf_kmeans

    rows = _planted_corpus(seed, 20, 10)
    df = spark.createDataFrame(rows, "vid int, v array<double>")
    kw = dict(k=3, n_cells=n_cells, n_probe=n_probe, n_iter=1)
    uncapped = cosine_topk_ivf_kmeans(df, df, "vid", "vid", "v", "v", **kw).collect()
    capped = cosine_topk_ivf_kmeans(
        df, df, "vid", "vid", "v", "v", cell_cap=cap_small, **kw
    ).collect()
    huge_cap = cosine_topk_ivf_kmeans(
        df, df, "vid", "vid", "v", "v", cell_cap=len(rows) + 5, **kw
    ).collect()

    key = lambda rs: sorted((r["q_id"], r["n_id"], r["cos"]) for r in rs)
    assert key(huge_cap) == key(uncapped)  # cap beyond corpus == no cap
    best_un = {r["q_id"]: r["cos"] for r in uncapped if r["rank"] == 1}
    for r in capped:
        if r["rank"] == 1:
            assert r["cos"] <= best_un[r["q_id"]] + 1e-9
    exact = {(r["q_id"], r["n_id"]): r["cos"] for r in uncapped}
    for r in capped:
        if (r["q_id"], r["n_id"]) in exact:
            assert r["cos"] == pytest.approx(exact[(r["q_id"], r["n_id"])], abs=1e-9)


@given(n=st.integers(1, 10**12), target=st.integers(16, 512))
@settings(max_examples=50, deadline=None)
def test_auto_n_planes_bucket_bound(n, target):
    """The sizing guarantee the docstring claims: expected bucket
    N / 2^planes ≤ target for any N above target, and planes ≥ the
    floor."""
    from upgini_spark.functions.similarity import auto_n_planes

    p = auto_n_planes(n, target_bucket_rows=target)
    assert p >= 8
    if n > target:
        assert n / (2 ** p) <= target or p == 8 and n / 2**8 <= target
        # the log2 sizing itself: one fewer plane would overflow the
        # target whenever the returned value is above the floor
        if p > 8:
            assert n / (2 ** (p - 1)) > target


@given(n=st.integers(0, 10**12))
@settings(max_examples=50, deadline=None)
def test_auto_n_cells_sqrt_band(n):
    from upgini_spark.functions.similarity import auto_n_cells

    c = auto_n_cells(n)
    assert 8 <= c <= 65_536
    if 64 <= n <= 65_536 ** 2:
        assert c == min(65_536, max(8, math.ceil(math.sqrt(n))))


def test_lsh_fixed_seed_recall_floor(spark):
    """Absolute recall floor on a fixed fixture (deterministic — planes
    are md5 replays): with auto-sized planes and 6 bands, at least 90%
    of planted near-dup pairs (cos ≥ 0.98) surface as their base's
    top-1/2 neighbor."""
    from upgini_spark.functions.similarity import cosine_topk_lsh

    rows = _planted_corpus(123, 30, 30)
    df = spark.createDataFrame(rows, "vid int, v array<double>")
    got = cosine_topk_lsh(
        df, df, "vid", "vid", "v", "v", k=2, n_planes=6, n_bands=6, dims=DIM
    ).collect()
    found = _pairs(got)
    hits = sum(1 for j in range(30) if (30 + j, j % 30) in found or (j % 30, 30 + j) in found)
    assert hits >= 27, f"recall {hits}/30 below floor"
