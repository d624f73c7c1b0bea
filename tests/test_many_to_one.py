"""The many-to-one alignment mode (speech-to-text style: M:1 types up to 50).

Exercises the wide-lookback code paths: ring depth K = M + 1 in the scan
kernel and the Pallas support guard."""

import numpy as np
import pytest

import jax.numpy as jnp

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.vecalign import pyramid
from svecalign_tpu.vecalign.vecalign import make_many_to_one_alignment_types


def test_many_to_one_types():
    types = make_many_to_one_alignment_types(50)
    assert types[0] == (1, 1) and types[-1] == (50, 1) and len(types) == 50


def test_many_to_one_alignment_merges_source_runs():
    """y_j = mean of 3 consecutive x segments -> expect mostly 3:1 spans."""
    rng = np.random.default_rng(0)
    m, group = 12, 3
    n = m * group
    d = 32
    base = rng.standard_normal((m, d)).astype(np.float32)
    x = np.repeat(base, group, axis=0) + 0.05 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    # overlap planes for x up to M=6 source segments; single plane for y
    M = 6
    v0 = np.zeros((M, n, d), dtype=np.float32)
    for j in range(M):
        for i in range(n - j):
            v0[j, i + j] = x[i : i + j + 1].mean(axis=0)
    v1 = base[None]

    v0 = np.asarray(costs_ops.make_norm1(jnp.asarray(v0)))
    v1 = np.asarray(costs_ops.make_norm1(jnp.asarray(v1)))

    stack = pyramid.vecalign(
        v0,
        v1,
        final_alignment_types=make_many_to_one_alignment_types(M),
        del_percentile_frac=0.2,
        width_over2=6,
        max_size_full_dp=300,
        costs_sample_size=500,
        num_samps_for_norm=20,
    )
    aligns = stack[0]["final_alignments"]
    # coverage invariants
    assert [i for xx, _ in aligns for i in xx] == list(range(n))
    assert [j for _, yy in aligns for j in yy] == list(range(m))
    # every target index maps to exactly one span (many-to-ONE)
    assert all(len(yy) <= 1 for _, yy in aligns)
    # the dominant span size should be the true group size
    sizes = [len(xx) for xx, yy in aligns if yy]
    assert sizes.count(group) >= m * 0.7, sizes
