"""Deletion-penalty estimation via sampled cost percentiles.

Semantics match reference svecalign/vecalign/dp_utils.py:43-79
(``DeletionKnob``) and :278-323 (``make_del_knob``). The reference samples
with an unseeded global RNG; we take a caller-provided seeded generator so
runs are reproducible (the knob is a percentile over 20k samples, so seeded
vs unseeded differ negligibly).
"""



import numpy as np

from svecalign_tpu.ops.costs import score_pairs
from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)


NUM_BINS = 1000


class DeletionKnob:
    """Map a percentile fraction to a deletion penalty via a sampled-cost CDF."""

    def __init__(self, samp: np.ndarray, res_min: float, res_max: float):
        self.res_min = res_min
        self.res_max = res_max
        if self.res_min >= self.res_max:
            logger.warning("res_max <= res_min, increasing it")
            self.res_max = self.res_min + 1e-4

        self.hist, self.bin_edges = np.histogram(
            samp, bins=NUM_BINS, range=[self.res_min, self.res_max], density=True
        )
        dx = self.bin_edges[1] - self.bin_edges[0]
        self.cdf = np.cumsum(self.hist) * dx
        self._build_interp()

    @classmethod
    def from_histogram(
        cls, counts: np.ndarray, res_min: float, res_max: float
    ) -> "DeletionKnob":
        """Build from precomputed NUM_BINS bin counts over [res_min, res_max]
        (e.g. histogrammed on device so only 1000 ints cross the tunnel, not
        the 20k sampled scores). ``cumsum(hist)*dx`` with density=True equals
        ``cumsum(counts)/total``, so the CDF — and hence the knob — matches
        the sample constructor up to bin-edge float rounding."""
        self = cls.__new__(cls)
        self.res_min = res_min
        self.res_max = res_max
        if self.res_min >= self.res_max:
            self.res_max = self.res_min + 1e-4
        counts = np.asarray(counts, dtype=np.float64)
        total = counts.sum()
        self.cdf = np.cumsum(counts) / (total if total > 0 else 1.0)
        self._build_interp()
        return self

    def _build_interp(self):
        num_pts = 30
        interp_points = [(0, self.res_min)]
        for knob_val in np.linspace(0, 1, num_pts - 1)[1:-1]:
            cdf_idx = np.searchsorted(self.cdf, knob_val)
            cdf_val = self.res_min + cdf_idx / float(NUM_BINS) * (
                self.res_max - self.res_min
            )
            interp_points.append((knob_val, cdf_val))
        interp_points.append((1, self.res_max))
        self.x, self.y = zip(*interp_points)

    def percentile_frac_to_del_penalty(self, knob_val: float) -> float:
        return float(np.interp([knob_val], self.x, self.y)[0])


def device_del_penalty(counts, smax, frac: float, valid):
    """Deletion penalties for a batch, entirely on device.

    counts: (P, NUM_BINS) sampled-cost histograms (int); smax: (P,) sample
    maxima; valid: (P,) bool — invalid pairs get the 0.5 placeholder.
    Mirrors DeletionKnob.from_histogram + percentile_frac_to_del_penalty
    (cdf -> 27 interior interp points -> linear interp), so no histogram
    ever crosses the tunnel. float32 vs the host's float64 can shift a bin
    boundary (~res_max/1000) — same tolerance class as device histogramming.
    """
    import jax
    import jax.numpy as jnp

    p = counts.shape[0]
    res_max = jnp.where(smax > 0, smax, 1e-4)
    total = jnp.maximum(jnp.sum(counts, axis=1, keepdims=True), 1)
    cdf = jnp.cumsum(counts, axis=1) / total.astype(jnp.float32)
    kvs = jnp.linspace(0.0, 1.0, 29)[1:-1]  # 27 interior knob points
    idx = jax.vmap(lambda c: jnp.searchsorted(c, kvs))(cdf)  # (P, 27)
    cdf_val = idx.astype(jnp.float32) / NUM_BINS * res_max[:, None]
    x = jnp.concatenate([jnp.zeros((1,)), kvs, jnp.ones((1,))])
    y = jnp.concatenate(
        [jnp.zeros((p, 1)), cdf_val, res_max[:, None]], axis=1
    )
    pen = jax.vmap(lambda yy: jnp.interp(jnp.float32(frac), x, yy))(y)
    return jnp.where(valid, pen, 0.5)


def make_del_knob(
    e_laser: np.ndarray,
    f_laser: np.ndarray,
    e_laser_norms: np.ndarray,
    f_laser_norms: np.ndarray,
    sample_size: int,
    rng: np.random.Generator,
) -> DeletionKnob:
    """Estimate the cost distribution from random index pairs (dp_utils.py:278-323)."""
    e_size = e_laser.shape[0]
    f_size = f_laser.shape[0]

    if e_size > 0 and f_size > 0 and sample_size > 0:
        if e_size * f_size < sample_size:
            # small problem: compute the full cross product
            x_idxs, y_idxs = np.meshgrid(
                np.arange(e_size, dtype=np.int32),
                np.arange(f_size, dtype=np.int32),
                indexing="ij",
            )
            x_idxs = x_idxs.ravel()
            y_idxs = y_idxs.ravel()
        else:
            x_idxs = rng.integers(0, e_size, size=sample_size).astype(np.int32)
            y_idxs = rng.integers(0, f_size, size=sample_size).astype(np.int32)

        random_scores = score_pairs(
            x_idxs, y_idxs, e_laser_norms, f_laser_norms, e_laser, f_laser
        )
        min_score = 0
        max_score = float(random_scores.max())
    else:
        random_scores = np.array([0.0, 0.5, 1.0])
        min_score = 0
        max_score = 1

    return DeletionKnob(random_scores, min_score, max_score)
