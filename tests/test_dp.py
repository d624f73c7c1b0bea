"""Unit tests: XLA DP kernels vs the independent numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.ops import dp as dp_ops
from svecalign_tpu.vecalign import pyramid
from tests import oracle


def random_overlap_tensor(rng, n_overlaps, n, d=32):
    v = rng.standard_normal((n_overlaps, n, d)).astype(np.float32)
    return np.asarray(costs_ops.make_norm1(jnp.asarray(v)))


def test_dense_costs_matches_oracle():
    rng = np.random.default_rng(0)
    v0 = rng.standard_normal((11, 16)).astype(np.float32)
    v1 = rng.standard_normal((7, 16)).astype(np.float32)
    n0 = rng.uniform(0.5, 1.5, 11).astype(np.float32)
    n1 = rng.uniform(0.5, 1.5, 7).astype(np.float32)
    got = np.asarray(costs_ops.dense_costs(v0, v1, n0, n1))
    want = oracle.dense_costs_oracle(v0, v1, n0, n1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
# (224, 224) and (256, 230) are in the size class where XLA:TPU's fused
# dual-output gather faulted the worker before the reassembly was rewritten
# as ONE stacked gather (tools/repro_dense_fault.py; see dense_dp)
@pytest.mark.parametrize(
    "shape", [(12, 9), (1, 5), (30, 30), (224, 224), (256, 230)]
)
def test_dense_dp_matches_oracle(seed, shape):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 1, shape).astype(np.float32)
    pen = float(rng.uniform(0.1, 0.5))
    csum, bp = dp_ops.dense_dp(jnp.asarray(cost), jnp.float32(pen))
    csum, bp = np.asarray(csum), np.asarray(bp)
    ref_csum, ref_bp = oracle.dense_dp_oracle(cost, pen)
    np.testing.assert_allclose(csum, ref_csum, rtol=1e-5, atol=1e-5)

    # backpointers must match except at exact-tie cells, where the fp32
    # kernel may legitimately pick the other equal-cost move; there, the
    # chosen move must still be one of the tied minima.
    for r, c in np.argwhere(bp != ref_bp):
        assert r > 0 and c > 0, (r, c)
        cands = np.array(
            [
                ref_csum[r - 1, c - 1] + cost[r - 1, c - 1],
                ref_csum[r, c - 1] + pen,
                ref_csum[r - 1, c] + pen,
            ]
        )
        tied = np.flatnonzero(np.isclose(cands, cands.min(), rtol=1e-6))
        assert len(tied) > 1, f"non-tie bp mismatch at {(r, c)}"
        assert bp[r, c] in tied


def _make_path(rng, n, m):
    """Random monotone unit-step path from (0,0) to (n,m)."""
    steps = ["x"] * n + ["y"] * m
    rng.shuffle(steps)
    path = [(0, 0)]
    for s in steps:
        x, y = path[-1]
        path.append((x + 1, y) if s == "x" else (x, y + 1))
    return path


@pytest.mark.parametrize(
    "seed,n,m,chunk",
    [
        (0, 17, 14, 8),     # several chunks, docs larger than the window
        (1, 17, 14, 8),
        (0, 17, 14, 512),   # chunk window larger than both docs (pad path)
        (2, 130, 41, 32),   # asymmetric, many chunks, boundary replication
        (3, 23, 171, 64),   # y-heavy: negative-b_offset window clamps
    ],
)
def test_banded_costs_matches_oracle(seed, n, m, chunk):
    rng = np.random.default_rng(seed)
    types = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1)]
    w2 = 4
    v0 = random_overlap_tensor(rng, 3, n)
    v1 = random_overlap_tensor(rng, 2, m)
    n0 = rng.uniform(0.5, 1.5, (3, n)).astype(np.float32)
    n1 = rng.uniform(0.5, 1.5, (2, m)).astype(np.float32)
    path = _make_path(rng, n, m)

    b_off = costs_ops.path_to_band_offsets(path, w2)
    got = np.asarray(
        costs_ops.banded_costs(
            jnp.asarray(v0),
            jnp.asarray(v1),
            jnp.asarray(n0),
            jnp.asarray(n1),
            jnp.asarray(b_off),
            tuple(x for x, _ in types),
            tuple(y for _, y in types),
            w2,
            chunk=chunk,
        )
    )
    want, b_off_ref = oracle.banded_costs_oracle(v0, v1, n0, n1, path, types, w2)
    np.testing.assert_array_equal(b_off, b_off_ref)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_banded_dp_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n, m = 15, 12
    types = [(1, 1), (1, 2), (2, 1), (2, 2)]
    w2 = 4
    path = _make_path(rng, n, m)
    b_off = costs_ops.path_to_band_offsets(path, w2)

    a_len = len(path)
    cost = rng.uniform(0, 2, (len(types), a_len, 2 * w2)).astype(np.float32)
    pen = float(rng.uniform(0.2, 0.8))

    csum, xp, yp, boff_out = dp_ops.run_banded_dp(cost, b_off, types, pen, n, m)
    r_csum, r_xp, r_yp, r_boff_out = oracle.banded_dp_oracle(
        cost, b_off, types, pen, n, m
    )

    np.testing.assert_array_equal(boff_out, r_boff_out)
    finite = np.isfinite(r_csum)
    np.testing.assert_array_equal(np.isfinite(csum), finite)
    np.testing.assert_allclose(csum[finite], r_csum[finite], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(xp, r_xp)
    np.testing.assert_array_equal(yp, r_yp)


def test_full_pyramid_runs_and_covers_documents():
    rng = np.random.default_rng(7)
    n, m = 40, 37
    v0 = random_overlap_tensor(rng, 3, n)
    v1 = random_overlap_tensor(rng, 3, m)
    types = [(x, y) for x in range(1, 4) for y in range(1, 4) if x + y <= 4]

    stack = pyramid.vecalign(
        v0,
        v1,
        final_alignment_types=types,
        del_percentile_frac=0.2,
        width_over2=5,
        max_size_full_dp=20,  # force at least one pyramid level
        costs_sample_size=500,
        num_samps_for_norm=30,
    )
    aligns = stack[0]["final_alignments"]
    scores = stack[0]["alignment_scores"]
    assert len(aligns) == len(scores)

    # the alignment must cover every index of both documents exactly once
    xs = [i for x, _ in aligns for i in x]
    ys = [j for _, y in aligns for j in y]
    assert xs == list(range(n))
    assert ys == list(range(m))


def test_identity_alignment_recovered():
    """Two identical documents must align 1-1 on the diagonal."""
    rng = np.random.default_rng(3)
    n = 25
    base = rng.standard_normal((1, n, 32)).astype(np.float32)
    v = np.asarray(costs_ops.make_norm1(jnp.asarray(base)))

    stack = pyramid.vecalign(
        v.copy(),
        v.copy(),
        final_alignment_types=[(1, 1), (1, 2), (2, 1)],
        del_percentile_frac=0.2,
        width_over2=5,
        max_size_full_dp=300,
        costs_sample_size=200,
        num_samps_for_norm=20,
    )
    aligns = stack[0]["final_alignments"]
    assert aligns == [([i], [i]) for i in range(n)]
