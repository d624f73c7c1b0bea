"""Pallas wavefront kernel vs the XLA scan and the numpy oracle.

Runs in Pallas interpret mode on CPU (the compiled path is exercised on the
real chip by bench.py / the TPU stages)."""

import numpy as np
import pytest

import jax

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.ops import dp as dp_ops
from tests import oracle
from tests.test_dp import _make_path


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_oracle_and_scan(seed):
    from svecalign_tpu.ops.dp_pallas import pallas_supported, run_banded_dp_pallas

    rng = np.random.default_rng(seed)
    n, m = 15, 12
    types = [(1, 1), (1, 2), (2, 1), (2, 2)]
    w2 = 4
    path = _make_path(rng, n, m)
    b_off = costs_ops.path_to_band_offsets(path, w2)

    a_len = len(path)
    cost = rng.uniform(0, 2, (len(types), a_len, 2 * w2)).astype(np.float32)
    pen = float(rng.uniform(0.2, 0.8))

    assert pallas_supported(cost.shape, types)
    csum_p, xp_p, yp_p, boff_p = run_banded_dp_pallas(cost, b_off, types, pen, n, m)
    csum_s, xp_s, yp_s, boff_s = dp_ops.run_banded_dp(cost, b_off, types, pen, n, m)
    r_csum, r_xp, r_yp, _ = oracle.banded_dp_oracle(cost, b_off, types, pen, n, m)

    np.testing.assert_array_equal(boff_p, boff_s)
    finite = np.isfinite(r_csum)
    np.testing.assert_array_equal(np.isfinite(csum_p), finite)
    np.testing.assert_allclose(csum_p[finite], r_csum[finite], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(xp_p, r_xp)
    np.testing.assert_array_equal(yp_p, r_yp)
    # scan and pallas agree bit-for-bit on the same float32 arithmetic
    np.testing.assert_array_equal(xp_p, xp_s)
    np.testing.assert_array_equal(yp_p, yp_s)
    np.testing.assert_allclose(csum_p[finite], csum_s[finite], rtol=1e-6)


def test_pallas_support_guard():
    from svecalign_tpu.ops.dp_pallas import pallas_supported

    assert pallas_supported((14, 500, 16), [(x, y) for x in range(1, 6) for y in range(1, 6) if x + y <= 6])
    # many-to-one M=50 -> K=51: B + K <= 128 lanes, still supported
    assert pallas_supported((50, 300, 32), [(m, 1) for m in range(1, 51)])
    # wide bands tile the lane axis now (B + K > 128 is fine)
    assert pallas_supported((4, 500, 120), [(1, 1), (8, 8)])
    assert pallas_supported((4, 500, 700), [(1, 1), (2, 2)])
    # only the VMEM safety cap rejects
    assert not pallas_supported((4, 500, 5000), [(1, 1)])


@pytest.mark.parametrize("w2", [70, 130])
def test_pallas_wide_band_matches_scan(w2):
    """B + K > 128: multi-tile lane rows (roll across 2-4 lane tiles)."""
    from svecalign_tpu.ops.dp_pallas import pallas_supported, run_banded_dp_pallas

    rng = np.random.default_rng(7)
    n, m = 60, 55
    types = [(1, 1), (1, 2), (2, 1)]
    path = _make_path(rng, n, m)
    b_off = costs_ops.path_to_band_offsets(path, w2)
    a_len = len(path)
    cost = rng.uniform(0, 2, (len(types), a_len, 2 * w2)).astype(np.float32)
    pen = float(rng.uniform(0.2, 0.8))

    assert pallas_supported(cost.shape, types)
    csum_p, xp_p, yp_p, _ = run_banded_dp_pallas(cost, b_off, types, pen, n, m)
    csum_s, xp_s, yp_s, _ = dp_ops.run_banded_dp(cost, b_off, types, pen, n, m)
    finite = np.isfinite(csum_s)
    np.testing.assert_array_equal(np.isfinite(csum_p), finite)
    np.testing.assert_allclose(csum_p[finite], csum_s[finite], rtol=1e-6)
    np.testing.assert_array_equal(xp_p, xp_s)
    np.testing.assert_array_equal(yp_p, yp_s)


def test_pallas_batched_matches_per_pair():
    """The (pairs, chunks) grid with a shared ring scratch must reproduce
    every pair's single-pair result exactly (no state leakage across the
    pair boundary)."""
    import jax.numpy as jnp

    from svecalign_tpu.ops.dp_pallas import banded_dp_pallas_batched, run_banded_dp_pallas

    rng = np.random.default_rng(11)
    types = [(1, 1), (1, 2), (2, 1), (2, 2)]
    w2 = 5
    P = 3
    sizes = [(20, 18), (15, 19), (12, 12)]

    # build per-pair bands, pad to a common A
    pairs = []
    for n, m in sizes:
        path = _make_path(rng, n, m)
        b_off = costs_ops.path_to_band_offsets(path, w2)
        cost = rng.uniform(0, 2, (len(types), len(path), 2 * w2)).astype(np.float32)
        pen = float(rng.uniform(0.2, 0.8))
        pairs.append((cost, b_off, pen, n, m))

    a_pad = max(c.shape[1] for c, *_ in pairs)
    costs_b = np.full((P, len(types), a_pad, 2 * w2), np.inf, np.float32)
    boff_in = np.zeros((P, a_pad), np.int32)
    boff_out = np.zeros((P, a_pad + 2), np.int32)
    pens = np.zeros(P, np.float32)
    ns = np.zeros(P, np.int32)
    ms = np.zeros(P, np.int32)
    for i, (cost, b_off, pen, n, m) in enumerate(pairs):
        a = cost.shape[1]
        costs_b[i, :, :a] = cost
        boff_in[i, :a] = b_off
        boff_in[i, a:] = b_off[-1]
        boff_out[i] = dp_ops.extend_band_offsets(boff_in[i])
        pens[i], ns[i], ms[i] = pen, n, m

    x_off = tuple(x for x, _ in types)
    y_off = tuple(y for _, y in types)
    csum_b, xp_b, yp_b = banded_dp_pallas_batched(
        jnp.asarray(costs_b), jnp.asarray(boff_in), jnp.asarray(boff_out),
        x_off, y_off, jnp.asarray(pens), jnp.asarray(ns), jnp.asarray(ms),
    )
    csum_b, xp_b, yp_b = np.asarray(csum_b), np.asarray(xp_b), np.asarray(yp_b)

    for i, (cost, b_off, pen, n, m) in enumerate(pairs):
        csum_1, xp_1, yp_1, _ = run_banded_dp_pallas(cost, b_off, types, pen, n, m)
        a2 = cost.shape[1] + 2
        finite = np.isfinite(csum_1)
        np.testing.assert_array_equal(np.isfinite(csum_b[i, :a2]), finite)
        np.testing.assert_allclose(
            csum_b[i, :a2][finite], csum_1[finite], rtol=1e-6
        )
        np.testing.assert_array_equal(xp_b[i, :a2], xp_1)
        np.testing.assert_array_equal(yp_b[i, :a2], yp_1)
