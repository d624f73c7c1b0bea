"""Cost-matrix construction as XLA batched matmuls / gathers.

TPU-native replacement for the reference Cython cost kernels
(reference svecalign/vecalign/dp_core.pyx:36-77 ``make_dense_costs`` and
:165-267 ``make_sparse_costs``): the N x M cosine-cost matrix is one MXU
matmul, and the banded cost tensor is a chunked gather + batched dot over
the band, vectorized across alignment types.

Cost convention (dp_core.pyx:73-75, 259-260): aligning an x-span of n
segments with a y-span of m segments costs

    2 * n * m * (1 - cos_sim) / (1e-6 + norm0 + norm1)

where ``norm0/norm1`` are margin-style normalizers (1 - mean similarity vs
random vectors), not vector norms.
"""

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def make_norm1(vecs: Array, eps: float = 1e-5) -> Array:
    """L2-normalize along the last axis: v / (||v|| + eps).

    Matches reference dp_utils.py:32-40 (note the additive epsilon: these are
    not exactly unit vectors).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(vecs), axis=-1, keepdims=True))
    return vecs / (norm + eps)


@jax.jit
def upcast_norm1(vecs: Array) -> Array:
    """Upload-friendly entry: cast (possibly fp16) input to fp32 on device,
    then L2-normalize. Halves host->device transfer for fp16 tensors."""
    return make_norm1(vecs.astype(jnp.float32))


@jax.jit
def downsample_vectors(vecs: Array) -> Array:
    """Halve the sequence: sum consecutive pairs, remove mean, renormalize.

    Matches reference dp_utils.py:362-378. Input (n_overlaps, b, d) ->
    (n_overlaps, b // 2, d). An odd trailing element is dropped.
    """
    n, b, d = vecs.shape
    half = vecs[:, : b - b % 2].reshape(n, b // 2, 2, d).sum(axis=2)
    half = half - jnp.mean(half, axis=1, keepdims=True)
    return make_norm1(half)


@jax.jit
def dense_costs(vecs0: Array, vecs1: Array, norms0: Array, norms1: Array) -> Array:
    """Full N x M 1-1 cost matrix via one MXU matmul.

    Equivalent to reference dp_core.pyx:36-77 with offset0 = offset1 = 0.
    vecs0: (N, d), vecs1: (M, d), norms0: (N,), norms1: (M,). Returns (N, M).
    """
    sim = jnp.dot(
        vecs0,
        vecs1.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    denom = 1e-6 + norms0[:, None] + norms1[None, :]
    return 2.0 * (1.0 - sim) / denom


def compute_norms_from_sample(vecs0: Array, sample: Array) -> Array:
    """Margin normalizers: 1 - mean cosine similarity vs a sample matrix.

    vecs0: (n_overlaps, N, d) unit-ish vectors; sample: (S, d) random vectors
    from the other side. Returns (n_overlaps, N). Mirrors reference
    dp_utils.py:326-359 (the matmul + mean), with the sampling done by the
    caller so the device op stays pure.
    """
    sim = jnp.einsum(
        "ond,sd->ons",
        vecs0,
        sample,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return 1.0 - jnp.mean(sim, axis=-1)


@jax.jit
def _gather_sample_planes(vecs1: Array, idxs: Array) -> Array:
    """vecs1: (n_overlaps, size, d); idxs: (n_overlaps, samps) -> (n_overlaps*samps, d)."""
    gathered = jnp.take_along_axis(vecs1, idxs[:, :, None], axis=1)
    return gathered.reshape(-1, vecs1.shape[-1])


def compute_norms(
    vecs0,
    vecs1,
    num_samples: int,
    rng: np.random.Generator,
) -> Array:
    """Sample ``num_samples`` vectors across all overlap planes of ``vecs1``
    and compute margin normalizers for every overlap plane of ``vecs0``.

    Semantics follow reference dp_utils.py:326-359: ceil(num_samples /
    n_overlaps) draws per overlap plane, with replacement. Returns
    (n_overlaps0, size0) float32. Sampling indices come from a seeded host
    RNG (the reference is unseeded), but the gather and matmul stay on
    device — only the tiny index array crosses the host boundary.
    """
    overlaps1, size1, dim = vecs1.shape
    overlaps0, size0, _ = vecs0.shape

    samps_per_overlap = math.ceil(num_samples / overlaps1) if overlaps1 else 0

    if size1 and samps_per_overlap:
        idxs = rng.integers(0, size1, size=(overlaps1, samps_per_overlap))
        sample = _gather_sample_planes(jnp.asarray(vecs1), jnp.asarray(idxs))
        return compute_norms_from_sample(jnp.asarray(vecs0), sample)
    return jnp.ones((overlaps0, size0), dtype=jnp.float32)


def path_to_band_offsets(path: Sequence[Tuple[int, int]], width_over2: int) -> np.ndarray:
    """Convert a monotone unit-step search path into per-anti-diagonal band
    offsets: b_offset[a] = y(a) - width_over2, in rotated coords a = x + y,
    b = y. (Reference dp_core.pyx:234-244.)
    """
    path = np.asarray(path, dtype=np.int32)
    a_coords = path[:, 0] + path[:, 1]
    assert np.array_equal(a_coords, np.arange(len(path))), (
        "search path must step exactly one position in x XOR y per entry"
    )
    return (path[:, 1] - width_over2).astype(np.int32)


@partial(jax.jit, static_argnames=("x_offsets", "y_offsets", "width_over2", "chunk"))
def banded_costs(
    vecs0: Array,
    vecs1: Array,
    norms0: Array,
    norms1: Array,
    b_offset: Array,
    x_offsets: Tuple[int, ...],
    y_offsets: Tuple[int, ...],
    width_over2: int,
    chunk: int = 512,
) -> Array:
    """Banded cost tensor along a search path, one slice per alignment type.

    Equivalent to reference dp_core.pyx:165-267 but computed as chunked
    gathers + batched dots, vectorized over the band and all alignment
    types. Out-of-document cells are +inf.

    vecs0: (n_overlaps0, N, d), vecs1: (n_overlaps1, M, d)
    norms0: (n_overlaps0, N), norms1: (n_overlaps1, M)
    b_offset: (A,) int32 per-anti-diagonal band start (y coordinate - w/2)
    Returns (len(types), A, 2 * width_over2) float32.
    """
    xsize = vecs0.shape[1]
    ysize = vecs1.shape[1]
    bwidth = 2 * width_over2
    a_len = b_offset.shape[0]

    xo = np.asarray(x_offsets, dtype=np.int32)
    yo = np.asarray(y_offsets, dtype=np.int32)
    # distinct overlap planes actually used on each side
    ux = tuple(sorted(set(int(v) for v in xo)))
    uy = tuple(sorted(set(int(v) for v in yo)))
    xi_map = np.array([ux.index(int(v)) for v in xo])  # type -> plane slot
    yi_map = np.array([uy.index(int(v)) for v in yo])

    # Windowed-tile formulation: because the search path is a monotone
    # unit-step path, both x = a - y and y over any run of ``chunk``
    # anti-diagonals stay inside contiguous windows of W = chunk + bwidth
    # rows. So per chunk we slice those windows, run ONE dense MXU matmul
    # over all plane combinations, and gather *scalars* from the small sim
    # tile — instead of gathering (chunk*B, d) embedding vectors per plane,
    # which costs ~B/1 more HBM traffic and OOMs at large pair batches.
    w = chunk + bwidth
    np0 = max(xsize, w)
    np1 = max(ysize, w)

    v0 = jnp.stack([vecs0[i - 1] for i in ux])  # (nux, N, d)
    v1 = jnp.stack([vecs1[j - 1] for j in uy])  # (nuy, M, d)
    n0 = jnp.stack([norms0[i - 1] for i in ux])  # (nux, N)
    n1 = jnp.stack([norms1[j - 1] for j in uy])
    if np0 > xsize:
        v0 = jnp.pad(v0, ((0, 0), (0, np0 - xsize), (0, 0)))
        n0 = jnp.pad(n0, ((0, 0), (0, np0 - xsize)))
    if np1 > ysize:
        v1 = jnp.pad(v1, ((0, 0), (0, np1 - ysize), (0, 0)))
        n1 = jnp.pad(n1, ((0, 0), (0, np1 - ysize)))

    # pad A to a multiple of chunk for lax.map; replicate the last offset so
    # band monotonicity (boff steps by 0/1) holds into the padding
    n_chunks = -(-a_len // chunk)
    pad_a = n_chunks * chunk - a_len
    b_off_pad = jnp.concatenate(
        [b_offset, jnp.broadcast_to(b_offset[-1], (pad_a,))]
    ) if pad_a else b_offset
    a_idx = jnp.arange(n_chunks * chunk, dtype=jnp.int32).reshape(n_chunks, chunk)
    b_off_chunks = b_off_pad.reshape(n_chunks, chunk)

    band = jnp.arange(bwidth, dtype=jnp.int32)
    type_scale = jnp.asarray(2.0 * xo * yo, dtype=jnp.float32)[:, None, None]
    nux, nuy = len(ux), len(uy)

    def one_chunk(args):
        a_rows, b_rows = args  # (chunk,), (chunk,)
        yy = b_rows[:, None] + band[None, :]  # (chunk, B)
        xx = a_rows[:, None] - yy
        valid = (xx >= 0) & (xx < xsize) & (yy >= 0) & (yy < ysize)

        # window starts (clamped); every in-document band cell of this chunk
        # lands inside [x0, x0+w) x [y0, y0+w)
        y0 = jnp.clip(b_rows[0], 0, np1 - w)
        x0 = jnp.clip(a_rows[0] - b_rows[0] - bwidth + 1, 0, np0 - w)

        xw = jax.lax.dynamic_slice(v0, (0, x0, 0), (nux, w, v0.shape[2]))
        ywv = jax.lax.dynamic_slice(v1, (0, y0, 0), (nuy, w, v1.shape[2]))
        n0w = jax.lax.dynamic_slice(n0, (0, x0), (nux, w))
        n1w = jax.lax.dynamic_slice(n1, (0, y0), (nuy, w))

        sim = jnp.einsum(
            "iwd,jud->ijwu",
            xw,
            ywv,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (nux, nuy, w, w)

        ix = jnp.clip((xx - x0).reshape(-1), 0, w - 1)  # (chunk*B,)
        iy = jnp.clip((yy - y0).reshape(-1), 0, w - 1)
        sims_cb = jnp.take(sim.reshape(nux, nuy, w * w), ix * w + iy, axis=2)
        denom = (
            1e-6
            + jnp.take(n0w, ix, axis=1)[:, None]
            + jnp.take(n1w, iy, axis=1)[None, :]
        )  # (nux, nuy, chunk*B)
        feats_t = ((1.0 - sims_cb) / denom)[xi_map, yi_map]  # (T, chunk*B)
        feats_t = (type_scale * feats_t.reshape(-1, chunk, bwidth))
        return jnp.where(valid[None], feats_t, jnp.inf)

    out = jax.lax.map(one_chunk, (a_idx, b_off_chunks))  # (n_chunks, T, chunk, B)
    out = jnp.moveaxis(out, 1, 0).reshape(len(x_offsets), n_chunks * chunk, bwidth)
    return out[:, :a_len]


@jax.jit
def _score_pairs_device(vecs0, vecs1, norms0, norms1, x_idx, y_idx):
    v0 = jnp.take(vecs0, x_idx, axis=0)
    v1 = jnp.take(vecs1, y_idx, axis=0)
    dots = jnp.einsum(
        "nd,nd->n", v0, v1, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return 2.0 * (1.0 - dots) / (jnp.take(norms0, x_idx) + jnp.take(norms1, y_idx))


def score_pairs(
    x_idx: np.ndarray,
    y_idx: np.ndarray,
    norms0,
    norms1,
    vecs0,
    vecs1,
) -> np.ndarray:
    """Batched cosine-distance costs for sampled index pairs.

    Equivalent to reference dp_core.pyx:143-161 ``score_path`` (note: no
    epsilon in this denominator). Used for deletion-penalty estimation.
    Runs on device; only the sampled scores come back to the host.
    """
    out = _score_pairs_device(
        jnp.asarray(vecs0), jnp.asarray(vecs1),
        jnp.asarray(norms0), jnp.asarray(norms1),
        jnp.asarray(x_idx), jnp.asarray(y_idx),
    )
    return np.asarray(out, dtype=np.float32)
