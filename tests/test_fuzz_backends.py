"""Cross-backend fuzz: the XLA scan, the Pallas kernel (interpret mode) and
the C++ float64 kernel must agree on random banded-DP instances."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast parity gate

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.ops import dp as dp_ops
from svecalign_tpu.ops.dp_native import run_banded_dp_native
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


CASES = [
    # (n, m, types, width_over2, seed)
    (10, 30, [(1, 1), (1, 2)], 3, 0),                      # very asymmetric
    (30, 10, [(1, 1), (2, 1), (3, 1), (4, 1)], 4, 1),      # many-to-one-ish
    (25, 25, [(x, y) for x in range(1, 5) for y in range(1, 5) if x + y <= 5], 6, 2),
    (7, 7, [(1, 1)], 3, 3),                                # minimal
    (40, 13, [(1, 1), (2, 2), (3, 3)], 5, 4),              # gappy types
]


@pytest.mark.parametrize("n,m,types,w2,seed", CASES)
def test_backends_agree(n, m, types, w2, seed):
    from svecalign_tpu.ops.dp_pallas import pallas_supported, run_banded_dp_pallas

    rng = np.random.default_rng(seed)
    path = _make_path(rng, n, m)
    b_off = costs_ops.path_to_band_offsets(path, w2)
    cost = rng.uniform(0, 2, (len(types), len(path), 2 * w2)).astype(np.float32)
    pen = float(rng.uniform(0.2, 0.8))

    c_s, xp_s, yp_s, bo_s = dp_ops.run_banded_dp(cost, b_off, types, pen, n, m)
    c_n, xp_n, yp_n, bo_n = run_banded_dp_native(cost, b_off, types, pen, n, m)

    np.testing.assert_array_equal(bo_s, bo_n)
    np.testing.assert_array_equal(xp_s, xp_n)
    np.testing.assert_array_equal(yp_s, yp_n)
    fin = np.isfinite(c_n)
    np.testing.assert_array_equal(np.isfinite(c_s), fin)
    np.testing.assert_allclose(c_s[fin], c_n[fin], rtol=1e-5, atol=1e-5)

    if pallas_supported(cost.shape, types):
        c_p, xp_p, yp_p, _ = run_banded_dp_pallas(cost, b_off, types, pen, n, m)
        np.testing.assert_array_equal(xp_p, xp_s)
        np.testing.assert_array_equal(yp_p, yp_s)
        np.testing.assert_allclose(c_p[fin], c_s[fin], rtol=1e-6)
