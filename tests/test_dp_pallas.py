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
    # band too wide for the lane trick
    assert not pallas_supported((4, 500, 120), [(1, 1), (8, 8)])
