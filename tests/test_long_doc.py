"""Hour-scale stress: a deep pyramid (multiple downsampling levels) on a
long synthetic document pair, per-pair and batched."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast parity gate

import jax.numpy as jnp

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.vecalign import pyramid
from svecalign_tpu.vecalign.batch import vecalign_batched


def _long_pair(rng, n, drift=0.05, d=24, n_overlaps=3):
    base = rng.standard_normal((n_overlaps, n, d)).astype(np.float32)
    v0 = np.asarray(costs_ops.make_norm1(jnp.asarray(base)))
    noise = drift * rng.standard_normal((n_overlaps, n, d)).astype(np.float32)
    v1 = np.asarray(costs_ops.make_norm1(jnp.asarray(base + noise)))
    return v0, v1


def test_deep_pyramid_long_document():
    rng = np.random.default_rng(0)
    n = 1200  # forces max_depth >= 2 with max_size_full_dp=300
    v0, v1 = _long_pair(rng, n)
    stack = pyramid.vecalign(
        v0,
        v1,
        final_alignment_types=[(1, 1), (1, 2), (2, 1)],
        del_percentile_frac=0.2,
        width_over2=6,
        max_size_full_dp=300,
        costs_sample_size=2000,
        num_samps_for_norm=50,
    )
    assert max(stack.keys()) >= 2  # really went deep
    aligns = stack[0]["final_alignments"]
    # near-identity data: expect overwhelmingly 1-1 diagonal alignments
    exact = sum(1 for x, y in aligns if x == y and len(x) == 1)
    assert exact / n > 0.95, exact / n


def test_deep_pyramid_batched_long_documents():
    rng = np.random.default_rng(1)
    pairs = [_long_pair(rng, 900), _long_pair(rng, 700)]
    results = vecalign_batched(
        pairs,
        final_alignment_types=[(1, 1), (1, 2), (2, 1)],
        del_percentile_frac=0.2,
        width_over2=6,
        max_size_full_dp=300,
        costs_sample_size=2000,
        num_samps_for_norm=50,
    )
    for (v0, _), (aligns, _) in zip(pairs, results):
        n = v0.shape[1]
        exact = sum(1 for x, y in aligns if x == y and len(x) == 1)
        assert exact / n > 0.95, exact / n
