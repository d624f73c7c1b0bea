"""Device-side DP traceback == host traceback, exactly.

The batched aligner can walk the backpointer planes ON DEVICE and pull only
the visited path (SVECALIGN_DEVICE_TRACEBACK; ~100x fewer D2H bytes — the
win on the tunneled chip, measured in BASELINE.md). These tests force the
device walk on the CPU backend and require bit-identical alignments AND
scores against the host-pull path, at kernel level and through the full
batched pyramid (multi-level, mixed sizes, deletions).
"""

import numpy as np
import pytest

import jax

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.ops import dp as dp_ops
from svecalign_tpu.vecalign.batch import vecalign_batched
from svecalign_tpu.vecalign.traceback import (
    dense_alignments_from_steps,
    dense_traceback,
    sparse_alignments_from_steps,
    sparse_traceback,
)

import jax.numpy as jnp


def _dense_case(rng, n, m):
    costs = rng.standard_normal((n, m)).astype(np.float32)
    pen = np.float32(rng.uniform(0.2, 1.5))
    return jnp.asarray(costs), jnp.asarray(pen)


@pytest.mark.parametrize("n,m", [(1, 1), (3, 9), (17, 13), (64, 41)])
def test_dense_device_walk_matches_host(n, m):
    rng = np.random.default_rng(n * 100 + m)
    for trial in range(3):
        costs, pen = _dense_case(rng, n, m)
        bp = dp_ops.dense_dp_bp(costs, pen)
        want = dense_traceback(bp)

        _, bd = dp_ops.dense_dp_scan(costs, pen)
        xs, ys, vs = jax.jit(dp_ops.dense_traceback_scan)(
            bd, jnp.int32(n), jnp.int32(m)
        )
        got = dense_alignments_from_steps(
            np.asarray(xs), np.asarray(ys), np.asarray(vs)
        )
        assert got == want


def _run_batched(pairs, env, monkeypatch, **kw):
    monkeypatch.setenv("SVECALIGN_DEVICE_TRACEBACK", env)
    return vecalign_batched(pairs, **kw)


def test_batched_pyramid_device_walk_exact(monkeypatch):
    """Full multi-level batched pyramid: device walk == host pull, for
    every pair — alignment lists equal, score arrays bit-equal."""
    rng = np.random.default_rng(7)
    pairs = []
    for n, m in [(40, 55), (90, 70), (33, 33), (8, 61)]:
        v0 = rng.standard_normal((3, n, 16)).astype(np.float32)
        v1 = rng.standard_normal((3, m, 16)).astype(np.float32)
        v0 = np.asarray(costs_ops.make_norm1(jnp.asarray(v0)))
        v1 = np.asarray(costs_ops.make_norm1(jnp.asarray(v1)))
        pairs.append((v0, v1))
    kw = dict(
        final_alignment_types=[(1, 1), (1, 2), (2, 1), (2, 2)],
        del_percentile_frac=0.2,
        width_over2=4,
        max_size_full_dp=24,  # force banded refinement levels
        costs_sample_size=300,
        num_samps_for_norm=20,
        seed=0,
    )
    host = _run_batched(pairs, "0", monkeypatch, **kw)
    dev = _run_batched(pairs, "1", monkeypatch, **kw)
    for (a_h, s_h), (a_d, s_d) in zip(host, dev):
        assert a_d == a_h
        np.testing.assert_array_equal(s_d, s_h)


def test_batched_dense_only_device_walk_exact(monkeypatch):
    """max_depth == 0 (single dense level + one banded refinement): the
    bench headline workload shape."""
    rng = np.random.default_rng(11)
    pairs = []
    for n, m in [(20, 25), (31, 18)]:
        v0 = rng.standard_normal((2, n, 16)).astype(np.float32)
        v1 = rng.standard_normal((2, m, 16)).astype(np.float32)
        v0 = np.asarray(costs_ops.make_norm1(jnp.asarray(v0)))
        v1 = np.asarray(costs_ops.make_norm1(jnp.asarray(v1)))
        pairs.append((v0, v1))
    kw = dict(
        final_alignment_types=[(1, 1), (1, 2), (2, 1)],
        del_percentile_frac=0.2,
        width_over2=5,
        max_size_full_dp=300,
        costs_sample_size=200,
        num_samps_for_norm=10,
        seed=3,
    )
    host = _run_batched(pairs, "0", monkeypatch, **kw)
    dev = _run_batched(pairs, "1", monkeypatch, **kw)
    for (a_h, s_h), (a_d, s_d) in zip(host, dev):
        assert a_d == a_h
        np.testing.assert_array_equal(s_d, s_h)


def test_per_pair_pyramid_device_walk_exact(monkeypatch):
    """The per-pair pyramid driver (reference CLI surface): forcing the
    device walk must not change alignments or scores."""
    from svecalign_tpu.vecalign import pyramid

    rng = np.random.default_rng(13)
    n, m = 70, 64
    v0 = rng.standard_normal((3, n, 16)).astype(np.float32)
    v1 = rng.standard_normal((3, m, 16)).astype(np.float32)
    v0 = np.asarray(costs_ops.make_norm1(jnp.asarray(v0)))
    v1 = np.asarray(costs_ops.make_norm1(jnp.asarray(v1)))
    kw = dict(
        final_alignment_types=[(1, 1), (1, 2), (2, 1)],
        del_percentile_frac=0.2,
        width_over2=4,
        max_size_full_dp=24,  # force banded refinement levels
        costs_sample_size=300,
        num_samps_for_norm=20,
        seed=0,
        dp_backend="xla",  # native has no device planes to walk
    )
    monkeypatch.setenv("SVECALIGN_DEVICE_TRACEBACK", "0")
    host = pyramid.vecalign(v0, v1, **kw)
    monkeypatch.setenv("SVECALIGN_DEVICE_TRACEBACK", "1")
    dev = pyramid.vecalign(v0, v1, **kw)
    assert dev[0]["final_alignments"] == host[0]["final_alignments"]
    np.testing.assert_array_equal(
        dev[0]["alignment_scores"], host[0]["alignment_scores"]
    )


def test_banded_walk_kernel_matches_host():
    """Kernel-level: banded DP planes walked on device == sparse_traceback,
    including the cumulative-cost scores."""
    rng = np.random.default_rng(5)
    n, m, w2 = 30, 26, 4
    # a plausible monotone search path: strict unit steps from (0,0)
    path = [(0, 0)]
    while path[-1] != (n, m):
        x, y = path[-1]
        if x < n and (y >= m or rng.random() < 0.5):
            path.append((x + 1, y))
        else:
            path.append((x, y + 1))
    from svecalign_tpu.ops.costs import path_to_band_offsets

    boff_in = path_to_band_offsets(path, w2)
    boff_out = dp_ops.extend_band_offsets(boff_in)
    A = len(boff_in)
    B = 2 * w2 + 1
    types = [(1, 1), (1, 2), (2, 1)]
    costs = rng.standard_normal((len(types), A, B)).astype(np.float32)
    pen = np.float32(0.8)

    csum, xp, yp = dp_ops.banded_dp(
        jnp.asarray(costs),
        jnp.asarray(boff_in),
        jnp.asarray(boff_out),
        tuple(x for x, _ in types),
        tuple(y for _, y in types),
        pen,
        jnp.int32(n),
        jnp.int32(m),
    )
    want_a, want_s = sparse_traceback(
        np.asarray(csum).astype(np.float64),
        np.asarray(xp),
        np.asarray(yp),
        boff_out,
        n,
        m,
    )
    sx, sy, sxp, syp, cs = jax.jit(dp_ops.banded_traceback_scan)(
        csum, xp, yp, jnp.asarray(boff_out), jnp.int32(n), jnp.int32(m)
    )
    got_a, got_s = sparse_alignments_from_steps(
        np.asarray(sx), np.asarray(sy), np.asarray(sxp), np.asarray(syp),
        np.asarray(cs),
    )
    assert got_a == want_a
    np.testing.assert_array_equal(got_s, want_s)
