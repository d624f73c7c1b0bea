"""Native C++ DP kernels vs the numpy oracle (bit-exact: both use float64)."""

import numpy as np
import pytest

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.ops.dp_native import dense_dp_native, run_banded_dp_native
from tests import oracle
from tests.test_dp import _make_path


@pytest.mark.parametrize("seed", [0, 1])
def test_native_dense_dp_bit_exact(seed):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 1, (25, 19)).astype(np.float32)
    pen = float(rng.uniform(0.1, 0.5))
    csum, bp = dense_dp_native(cost, pen)
    r_csum, r_bp = oracle.dense_dp_oracle(cost, pen)
    np.testing.assert_array_equal(csum, r_csum)
    np.testing.assert_array_equal(bp, r_bp)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_banded_dp_bit_exact(seed):
    rng = np.random.default_rng(seed)
    n, m = 18, 14
    types = [(1, 1), (1, 2), (2, 1), (3, 2)]
    w2 = 4
    path = _make_path(rng, n, m)
    b_off = costs_ops.path_to_band_offsets(path, w2)
    cost = rng.uniform(0, 2, (len(types), len(path), 2 * w2)).astype(np.float32)
    pen = float(rng.uniform(0.2, 0.8))

    csum, xp, yp, boff_out = run_banded_dp_native(cost, b_off, types, pen, n, m)
    r_csum, r_xp, r_yp, r_boff = oracle.banded_dp_oracle(cost, b_off, types, pen, n, m)

    np.testing.assert_array_equal(boff_out, r_boff)
    np.testing.assert_array_equal(xp, r_xp)
    np.testing.assert_array_equal(yp, r_yp)
    finite = np.isfinite(r_csum)
    np.testing.assert_array_equal(np.isfinite(csum), finite)
    np.testing.assert_array_equal(csum[finite], r_csum[finite])
