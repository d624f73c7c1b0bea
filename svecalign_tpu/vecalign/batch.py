"""Batched multi-pair alignment: many document pairs per device program.

The per-pair aligner (pyramid.py) is latency-bound: each level costs a few
host<->device roundtrips regardless of size, so a mining run over thousands
of document pairs wastes the chip. This driver pads a bucket of pairs to
common shapes and runs every device stage — normalization, masked pyramid
downsampling, margin normalizers, deletion-knob sampling, dense costs + DP,
banded costs + DP — batched over the pair axis (vmap), so the roundtrip
count per LEVEL is constant in the batch size. Host bookkeeping (search
paths, tracebacks) stays per-pair.

Semantics match pyramid.vecalign per pair, with one deliberate deviation in
the default mode: the pyramid's mean-removal during downsampling is computed
with per-pair validity masks (so padding rows don't shift the mean), making
padded and unpadded pairs equivalent; sampling draws come from one shared
seeded RNG, so a pair's deletion penalty depends on its batch (same
distribution, same percentile target — quality-equivalent, tested in
tests/test_batch_align.py). Pairs whose size product is below
costs_sample_size use the exhaustive index cross product for the deletion
knob (masked on device), matching make_del_knob's small-problem branch
(reference dp_utils.py:278-323).

``sampling="paired"`` instead gives every pair its own seeded RNG stream
reproducing pyramid.vecalign's exact draw order (norm samples for every
depth, then knob samples for every depth) and evaluates the deletion knob
on host — so a batch of same-sized pairs is sample-identical to per-pair
runs. Used by the CI exactness gate; costs one extra host pull per depth.
"""

import os
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.ops import dp as dp_ops
from svecalign_tpu.vecalign.pyramid import (
    alignment_to_search_path,
    extend_alignments,
    upsample_alignment,
)
from svecalign_tpu.vecalign.traceback import (
    dense_alignments_from_steps,
    dense_traceback,
    sparse_alignments_from_steps,
    sparse_traceback,
)
from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger("vecalign.batch")

Alignment = Tuple[List[int], List[int]]


# ---------------------------------------------------------------------------
# batched device ops
# ---------------------------------------------------------------------------


@jax.jit
def _downsample_masked(vecs: jax.Array, sizes: jax.Array):
    """(P, n_overlaps, b, d) -> halved, with per-pair masked mean removal.

    Equivalent to ops.costs.downsample_vectors applied per pair at its true
    length: pairs are summed, the mean is taken over each pair's valid
    halved rows only, and invalid rows are zeroed.
    """
    p, n, b, d = vecs.shape
    half = vecs[:, :, : b - b % 2].reshape(p, n, b // 2, 2, d).sum(axis=3)
    new_sizes = sizes // 2
    row = jnp.arange(b // 2)
    valid = row[None, :] < new_sizes[:, None]  # (P, b//2)
    vmask = valid[:, None, :, None]
    denom = jnp.maximum(new_sizes, 1).astype(jnp.float32)[:, None, None, None]
    mean = jnp.sum(jnp.where(vmask, half, 0.0), axis=2, keepdims=True) / denom
    half = jnp.where(vmask, half - mean, 0.0)
    return costs_ops.make_norm1(half) * vmask


_batched_dense_costs = jax.jit(jax.vmap(costs_ops.dense_costs))
_batched_dense_scan = jax.jit(jax.vmap(dp_ops.dense_dp_scan, in_axes=(0, 0)))


def _batched_dense_bp(costs, pen):
    """(P, n, m) costs -> host numpy (P, n+1, m+1) backpointers. The scan
    runs on device; the diagonal-major -> (r, c) reassembly runs on host
    (dp_ops.dense_reassemble — device gathers here are an XLA:TPU
    landmine). Only the int8 bp plane crosses the tunnel; the dense
    traceback never reads csum."""
    _, bd = _batched_dense_scan(costs, pen)
    return dp_ops.dense_reassemble(bd)


# the env gate lives with the kernels (ops.dp); re-exported for callers
device_traceback_enabled = dp_ops.device_traceback_enabled


@jax.jit
def _batched_dense_steps(costs, pen, xs, ys):
    """Dense DP + device traceback in ONE program: the bp planes never
    leave the device; only the (P, n_diags, 3) path steps are pulled."""
    _, bd = jax.vmap(dp_ops.dense_dp_scan)(costs, pen)
    return jax.vmap(dp_ops.dense_traceback_scan)(bd, xs, ys)


@jax.jit
def _batched_banded_tb(csum, xp, yp, boff_out, xs, ys):
    return jax.vmap(dp_ops.banded_traceback_scan)(csum, xp, yp, boff_out, xs, ys)


@jax.jit
def _batched_norms_from_sample(vecs0, sample):
    return jax.vmap(costs_ops.compute_norms_from_sample)(vecs0, sample)


@jax.jit
def _batched_gather_sample(vecs1, idxs):
    # vecs1: (P, n_overlaps, b, d); idxs: (P, n_overlaps, s)
    gathered = jnp.take_along_axis(vecs1, idxs[:, :, :, None], axis=2)
    return gathered.reshape(vecs1.shape[0], -1, vecs1.shape[-1])


# ---------------------------------------------------------------------------
# device-side sampling (shared mode): indices come from the device PRNG, so
# NOTHING but a 2-word key and the (P,) size vectors crosses the ~45 MB/s
# tunnel — the round-1 implementation uploaded (P, costs_sample_size) int32
# index tensors per depth per bucket (2.5 MB each at P=32), the single
# largest recurring upload after the embeddings themselves
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("samps",))
def _device_norm_sample(key, vecs1, h_sizes1, samps):
    """Draw ceil(num_samps/overlaps) indices per overlap plane per pair on
    device and gather the sample matrix. Size-0 pairs gather row 0 (zero
    padding -> the compute_norms 'ones' fallback)."""
    p, o1, _, _ = vecs1.shape
    hi = jnp.maximum(h_sizes1, 1)
    u = jax.random.uniform(key, (p, o1, samps))
    idx = jnp.minimum(
        (u * hi[:, None, None]).astype(jnp.int32), (hi - 1)[:, None, None]
    )
    return _batched_gather_sample(vecs1, idx)


@partial(jax.jit, static_argnames=("S", "frac"))
def _device_knob_penalty(key, v0, v1, n0, n1, h0, h1, S, frac):
    """Deletion penalties for a bucket with NO index upload: random pair
    draws (or the exhaustive cross product for pairs smaller than the
    sample budget, reference dp_utils.py:278-323) are generated on device,
    scored, histogrammed, and percentile-interpolated on device."""
    p = v0.shape[0]
    k1, k2 = jax.random.split(key)
    hx = jnp.maximum(h0, 1)
    hy = jnp.maximum(h1, 1)
    xs = jnp.minimum(
        (jax.random.uniform(k1, (p, S)) * hx[:, None]).astype(jnp.int32),
        (hx - 1)[:, None],
    )
    ys = jnp.minimum(
        (jax.random.uniform(k2, (p, S)) * hy[:, None]).astype(jnp.int32),
        (hy - 1)[:, None],
    )
    small = (h0 * h1 < S) & (h0 > 0) & (h1 > 0)
    ar = jnp.arange(S, dtype=jnp.int32)
    ex_x = jnp.minimum(ar[None, :] // hy[:, None], hx[:, None] - 1)
    ex_y = ar[None, :] % hy[:, None]
    x_idx = jnp.where(small[:, None], ex_x, xs)
    y_idx = jnp.where(small[:, None], ex_y, ys)
    valid_pair = (h0 > 0) & (h1 > 0)
    n_valid = jnp.where(valid_pair, jnp.where(small, h0 * h1, S), 0)

    counts, smax = _batched_score_hist(v0, v1, n0, n1, x_idx, y_idx, n_valid)
    from svecalign_tpu.vecalign.deletion import device_del_penalty

    return device_del_penalty(counts, smax, frac, valid_pair)


@jax.jit
def _batched_score_pairs_flat(vecs0, vecs1, norms0, norms1, x_idx, y_idx):
    def one(v0, v1, n0, n1, xi, yi):
        d = jnp.einsum(
            "nd,nd->n",
            jnp.take(v0, xi, axis=0),
            jnp.take(v1, yi, axis=0),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 2.0 * (1.0 - d) / (jnp.take(n0, xi) + jnp.take(n1, yi))

    return jax.vmap(one)(vecs0, vecs1, norms0, norms1, x_idx, y_idx)


@partial(jax.jit, static_argnames=("s_chunk",))
def _batched_score_pairs_scan(vecs0, vecs1, norms0, norms1, x_idx, y_idx, s_chunk):
    """Sample axis chunked through a scan so the gathered (P, chunk, d)
    row matrices stay bounded: the flat gather is (P, S, d) fp32 — 9.8 GB
    per side at P=128, S=20000, d=1024, the pair_batch-128 OOM. Per-row
    arithmetic is unchanged, so results equal the flat version exactly."""
    P, S = x_idx.shape
    pad = -S % s_chunk
    xi = jnp.moveaxis(
        jnp.pad(x_idx, ((0, 0), (0, pad))).reshape(P, -1, s_chunk), 1, 0
    )
    yi = jnp.moveaxis(
        jnp.pad(y_idx, ((0, 0), (0, pad))).reshape(P, -1, s_chunk), 1, 0
    )

    def step(_, idx):
        xc, yc = idx
        return None, _batched_score_pairs_flat(vecs0, vecs1, norms0, norms1, xc, yc)

    _, out = jax.lax.scan(step, None, (xi, yi))  # (nc, P, s_chunk)
    return jnp.moveaxis(out, 0, 1).reshape(P, -1)[:, :S]


# gathered-row HBM cap for the knob sampler: P * s_chunk rows * 1024 fp32
# * 2 sides ~ 1 GB at this budget
_SCORE_GATHER_CELLS = 1 << 17


def _batched_score_pairs(vecs0, vecs1, norms0, norms1, x_idx, y_idx):
    P, S = x_idx.shape
    s_chunk = max(256, _SCORE_GATHER_CELLS // max(P, 1))
    if S <= s_chunk:
        return _batched_score_pairs_flat(vecs0, vecs1, norms0, norms1, x_idx, y_idx)
    return _batched_score_pairs_scan(
        vecs0, vecs1, norms0, norms1, x_idx, y_idx, s_chunk=s_chunk
    )


@jax.jit
def _batched_score_hist(vecs0, vecs1, norms0, norms1, x_idx, y_idx, n_valid=None):
    """Sampled-cost histograms for the deletion knob, computed on device.

    Returns (counts (P, NUM_BINS) int32, smax (P,)): only ~4KB per pair
    crosses the tunnel instead of the raw (P, 20000) score matrix. Binning
    matches np.histogram(range=[0, smax]) (right-closed last bin) up to
    float rounding at bin edges. ``n_valid`` (P,) int32 counts how many
    leading entries of each pair's index row are real (shorter when a small
    pair enumerates its exhaustive cross product); the rest are excluded.
    """
    from svecalign_tpu.vecalign.deletion import NUM_BINS

    scores = _batched_score_pairs(vecs0, vecs1, norms0, norms1, x_idx, y_idx)
    if n_valid is None:
        mask = jnp.ones(scores.shape, dtype=bool)
    else:
        mask = jnp.arange(scores.shape[1])[None, :] < n_valid[:, None]
    smax = jnp.maximum(
        jnp.max(jnp.where(mask, scores, -jnp.inf), axis=1), 0.0
    )  # (P,)
    scale = jnp.where(smax > 0, NUM_BINS / smax, 0.0)
    bins = jnp.clip(
        jnp.floor(scores * scale[:, None]).astype(jnp.int32), 0, NUM_BINS - 1
    )
    p = scores.shape[0]
    counts = jnp.zeros((p, NUM_BINS), jnp.int32).at[
        jnp.arange(p)[:, None], bins
    ].add(mask.astype(jnp.int32))
    return counts, smax


@partial(jax.jit, static_argnames=("frac",))
def _batched_del_penalty(counts, smax, frac, valid):
    from svecalign_tpu.vecalign.deletion import device_del_penalty

    return device_del_penalty(counts, smax, frac, valid)


@partial(jax.jit, static_argnames=("x_offsets", "y_offsets", "width_over2", "chunk"))
def _batched_banded_costs(
    v0, v1, n0, n1, b_offset, x_offsets, y_offsets, width_over2, chunk=512
):
    fn = partial(
        costs_ops.banded_costs,
        x_offsets=x_offsets,
        y_offsets=y_offsets,
        width_over2=width_over2,
        chunk=chunk,
    )
    return jax.vmap(fn)(v0, v1, n0, n1, b_offset)


def _banded_chunk_for_batch(p: int) -> int:
    """Anti-diagonal chunk for banded costs: the per-chunk gather is
    O(P * chunk * band * overlaps * dim), so cap P * chunk to keep peak HBM
    flat as the pair batch grows (P=32 at chunk 512 OOMs a 16G chip)."""
    c = 4096 // max(p, 1)
    return max(64, 1 << (c.bit_length() - 1)) if c >= 64 else 64


@jax.jit
def _prep_band_offsets(boff_in: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Upload-once band offsets: upcast (int16 over the tunnel when the
    document fits) and derive the node-space extension on device (reference
    dp_core.pyx:315-328 — two replicated points at the front, then +1), so
    only the cost-space offsets cross the ~45 MB/s tunnel and only once per
    level instead of the four blocking device_puts the round-1 loop paid
    (boff_in twice, boff_out, h_sizes)."""
    b = boff_in.astype(jnp.int32)
    first = b[:, :1]
    return b, jnp.concatenate([first, first, b + 1], axis=1)


@partial(jax.jit, static_argnames=("x_offsets", "y_offsets"))
def _batched_banded_dp(costs, boff_in, boff_out, x_offsets, y_offsets, pens, xs, ys):
    def fn(c, bi, bo, pen, x, y):
        return dp_ops.banded_dp(c, bi, bo, x_offsets, y_offsets, pen, x, y)

    return jax.vmap(fn)(costs, boff_in, boff_out, pens, xs, ys)


def _pair_mesh(arr):
    """(mesh, axis_name) when ``arr``'s leading (pair) axis is sharded over
    a multi-device mesh axis, else None. This is how the batched pyramid
    detects multi-chip mode: the staging functions place the bucket with a
    NamedSharding over the data axis and every downstream op follows it."""
    sh = getattr(arr, "sharding", None)
    if not isinstance(sh, jax.sharding.NamedSharding) or sh.mesh.size <= 1:
        return None
    spec = sh.spec
    if not len(spec) or spec[0] is None:
        return None
    axis = spec[0]
    if isinstance(axis, tuple):
        if len(axis) != 1:
            return None  # pair axis split over two mesh axes: unsupported
        axis = axis[0]
    return sh.mesh, axis


def _dispatch_banded_dp(
    costs, boff_in, boff_out, pens, xs, ys, *, x_offsets, y_offsets, dp_backend
):
    """Single-device kernel choice: the in-kernel pair-batched Pallas
    wavefront on TPU (one launch for the whole bucket, VMEM-resident state —
    no per-scan-step overhead x P), else the vmapped XLA scan. Outputs are
    identical (tests/test_dp_pallas.py::test_pallas_batched_*)."""
    if dp_backend in ("auto", "pallas"):
        platform = jax.default_backend()
        from svecalign_tpu.ops.dp_pallas import pallas_supported

        types = list(zip(x_offsets, y_offsets))
        if (
            (platform in ("tpu", "axon") or dp_backend == "pallas")
            and pallas_supported(costs.shape[1:], types)
        ):
            from svecalign_tpu.ops.dp_pallas import banded_dp_pallas_batched

            return banded_dp_pallas_batched(
                costs, boff_in, boff_out, x_offsets, y_offsets, pens, xs, ys
            )
    return _batched_banded_dp(
        costs, boff_in, boff_out, x_offsets, y_offsets, pens, xs, ys
    )


def _run_batched_banded_dp(
    costs, boff_in, boff_out, x_offsets, y_offsets, pens, xs, ys,
    dp_backend: str = "auto",
):
    """Banded DP for a bucket. When the pair axis is sharded over a mesh,
    each device runs the kernel on its local pairs via shard_map — the DP
    has no cross-pair dependence, so the program needs zero collectives
    (SURVEY.md section 5.8's "data-parallel docs" analog applied to the
    aligner itself). A Pallas call cannot be auto-partitioned by XLA's SPMD
    pass, which is why the kernel dispatch sits INSIDE the shard_map."""
    info = _pair_mesh(costs)
    if info is not None:
        mesh, axis = info
        spec = jax.sharding.PartitionSpec(axis)
        inner = partial(
            _dispatch_banded_dp,
            x_offsets=x_offsets, y_offsets=y_offsets, dp_backend=dp_backend,
        )
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(spec,) * 6, out_specs=(spec,) * 3,
            check_vma=False,  # pallas_call has no replication rule
        )(costs, boff_in, boff_out, pens, xs, ys)
    return _dispatch_banded_dp(
        costs, boff_in, boff_out, pens, xs, ys,
        x_offsets=x_offsets, y_offsets=y_offsets, dp_backend=dp_backend,
    )


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


@jax.jit
def _build_doc_tensors_q(emb_i8: jax.Array, scale: jax.Array, ids: jax.Array) -> jax.Array:
    """int8 variant: (P, rows, d) int8 + (P, rows) fp32 per-row scales.
    Halves the host->device upload again vs fp16 (the tunnel runs at
    ~45 MB/s once any D2H transfer has happened; see CLAUDE.md). NaN rows
    were mapped to scale 0 on host, so they dequantize to zero vectors."""
    emb = emb_i8.astype(jnp.float32) * scale[:, :, None]
    gathered = jnp.take_along_axis(
        emb[:, None], jnp.maximum(ids, 0)[:, :, :, None], axis=2
    )
    vecs = jnp.where((ids >= 0)[:, :, :, None], gathered, 0.0)
    return costs_ops.make_norm1(vecs)


def _quantize_rows(emb: np.ndarray):
    """Per-row symmetric int8 quantization; NaN rows -> scale 0 (zero vector
    on device, the reference's NaN semantics, embedding_utils.py:183-190)."""
    m = np.abs(emb.astype(np.float32, copy=False)).max(axis=-1)
    m = np.where(np.isnan(m), 0.0, m)
    scale = (m / 127.0).astype(np.float32)
    denom = np.where(scale == 0.0, 1.0, scale)[..., None]
    with np.errstate(invalid="ignore"):
        q = np.rint(emb.astype(np.float32) / denom)
        q = np.where(np.isnan(q), 0.0, np.clip(q, -127, 127)).astype(np.int8)
    return q, scale


def _quantize_rows4(emb: np.ndarray):
    """Per-row symmetric int4 quantization, two codes packed per byte —
    quarter of the fp16 upload. Codes in [-7, 7]; NaN rows -> scale 0.
    ~2% cosine noise on unit-norm speech embeddings; gated by the
    committed-example quality test (tests/test_batch_align.py).

    Packing is HALF-BLOCK, not interleaved: byte j holds columns j (low
    nibble) and j + d/2 (high nibble), so the device unpack is two
    contiguous halves concatenated — the round-2 interleaved layout
    (stack + reshape) lowered to a full lane shuffle on TPU."""
    m = np.abs(emb.astype(np.float32, copy=False)).max(axis=-1)
    m = np.where(np.isnan(m), 0.0, m)
    scale = (m / 7.0).astype(np.float32)
    denom = np.where(scale == 0.0, 1.0, scale)[..., None]
    with np.errstate(invalid="ignore"):
        q = np.rint(emb.astype(np.float32) / denom)
        q = np.where(np.isnan(q), 0.0, np.clip(q, -7, 7)).astype(np.int8)
    half = q.shape[-1] // 2
    lo = q[..., :half] & 0xF
    hi = (q[..., half:] & 0xF) << 4
    return (lo | hi).astype(np.int8), scale


@jax.jit
def _build_doc_tensors_q4(packed: jax.Array, scale: jax.Array, ids: jax.Array) -> jax.Array:
    """int4 variant of _build_doc_tensors_q: unpack two nibbles per byte
    (arithmetic shifts sign-extend), dequantize, gather, normalize."""
    lo = (packed << 4) >> 4  # low nibble, sign-extended int8
    hi = packed >> 4  # high nibble (arithmetic shift keeps sign)
    q = jnp.concatenate([lo, hi], axis=-1)  # half-block layout: no shuffle
    emb = q.astype(jnp.float32) * scale[:, :, None]
    gathered = jnp.take_along_axis(
        emb[:, None], jnp.maximum(ids, 0)[:, :, :, None], axis=2
    )
    vecs = jnp.where((ids >= 0)[:, :, :, None], gathered, 0.0)
    return costs_ops.make_norm1(vecs)


@jax.jit
def _build_doc_tensors(emb: jax.Array, ids: jax.Array) -> jax.Array:
    """(P, rows, d) raw embeddings + (P, n_overlaps, n) row ids (-1 = zero)
    -> (P, n_overlaps, n, d) fp32 normalized overlap tensors, on device.

    NaN rows zero out here (reference embedding_utils.py:183-190) so the
    host staging path never has to scan the fp16 rows."""
    emb = emb.astype(jnp.float32)
    emb = jnp.where(jnp.any(jnp.isnan(emb), axis=-1, keepdims=True), 0.0, emb)
    gathered = jnp.take_along_axis(
        emb[:, None], jnp.maximum(ids, 0)[:, :, :, None], axis=2
    )
    vecs = jnp.where((ids >= 0)[:, :, :, None], gathered, 0.0)
    return costs_ops.make_norm1(vecs)


@jax.jit
def _build_doc_tensors_flat(flat_rows: jax.Array, gids: jax.Array) -> jax.Array:
    """(R, d) fp16 document bank + (P, n_overlaps, n) GLOBAL row ids
    (-1 = zero row) -> (P, n_overlaps, n, d) fp32 normalized overlap
    tensors.

    Gather-first: rows are picked in fp16 and only the gathered
    (P, o, n, d) block is cast to fp32 — casting a per-pair-stacked cache
    (the previous build) materialized a fp32 copy of EVERY pair's whole
    row buffer, the allocation behind the fused pair_batch-128 OOM. NaN
    rows zero after the gather (fp16 NaN survives both the gather and the
    cast), bit-identical to cache-side zeroing."""
    gathered = jnp.take(flat_rows, jnp.maximum(gids, 0), axis=0)
    g = gathered.astype(jnp.float32)
    g = jnp.where(jnp.any(jnp.isnan(g), axis=-1, keepdims=True), 0.0, g)
    vecs = jnp.where((gids >= 0)[:, :, :, None], g, 0.0)
    return costs_ops.make_norm1(vecs)


upload_stats = {"bytes": 0, "buckets": 0, "level_bytes": 0}
"""Cumulative host->device staging bytes — the tunnel-limited resource.
``bytes`` = bucket staging (embeddings/ids/scales); ``level_bytes`` = the
per-refinement-level band-offset uploads. bench.py reports bytes-per-pair
from this."""


def shape_grid_mode() -> str:
    """Padded-shape bucketing mode (SVECALIGN_SHAPE_GRID env var).

    Every jitted stage keys on the bucket's padded dims, and on axon a
    fresh program set costs ~20 s to compile — measured: a 32-pair
    rehearsal corpus split into two buckets paid two full compile bills
    (tools/profile_align.py: 46 s cold vs 1.1 s warm for the same work).
    Rounding the padded doc dims up to a coarse grid (floor 64) and
    deriving the band length from the padded dims (instead of the
    data-dependent longest search path) collapses same-class buckets onto
    one compiled program family. All batched compute is masked by the
    per-pair true sizes, so extra padding never changes valid cells; the
    one semantic shift is that pyramid depth follows the gridded dims, so
    a pair's level count depends on its size class rather than on its
    bucket-mates' exact sizes (arguably more reproducible than before).

    Modes (round-5 A/B, tools/ablate_grid.py — the pow2 grid cost the
    fused headline ~1.27x padded cells at example size):

    - ``"0"`` / ``"off"``: exact bucket-max padding (round-3 behavior);
    - ``"pow2"``: next power of two (round-4 default; <=2x cell inflation,
      1 compile class per octave);
    - ``"quarter"``: next multiple of pow2/8 — 4 grid points per octave
      ({0.625, 0.75, 0.875, 1}x pow2; <=1.25x worst-case inflation per
      dim, ~1.11x mean);
    - ``"eighth"``: next multiple of pow2/16 — 8 points per octave
      (<=1.125x worst-case per dim, ~1.055x mean);
    - ``"1"``: the default mode (currently ``eighth``).

    Measured (tools/ablate_grid.py, 2026-08-19, example pair at fused
    batch 64, 12 interleaved reps): median paired ratio vs off = pow2
    1.18x / quarter 1.13x / eighth 1.01x — tracking the padded-cell
    arithmetic (1.27 / 1.12 / 1.05). Eighth keeps the compile-key win
    (size-sorted buckets cluster onto few classes) at compute parity
    with exact padding, recovering the round-2 fused headline the pow2
    grid had cost.
    """
    v = os.environ.get("SVECALIGN_SHAPE_GRID", "1")
    if v in ("0", "off"):
        return "off"
    if v == "1":
        return "eighth"
    return v


def shape_grid_enabled() -> bool:
    return shape_grid_mode() != "off"


def _grid_dim(n: int, floor: int = 64) -> int:
    """Round up to the active grid (see :func:`shape_grid_mode`)."""
    n = max(int(n), floor)
    p = 1 << (n - 1).bit_length()  # next pow2 >= n
    mode = shape_grid_mode()
    if mode == "pow2":
        return p
    step = p // (8 if mode == "quarter" else 16)
    return -(-n // step) * step


def _grid_rows(r: int) -> int:
    """Embedding-row counts round to multiples of 256: they are upload
    bytes on the file+upload path, so the pow2 grid's <=2x inflation would
    cost real tunnel time; <=256 rows of zero padding is ~0.5 MB fp16."""
    return -(-int(r) // 256) * 256


def _pad_id_maps(pairs):
    """Shared staging bookkeeping: pad each pair's (ids0, ids1) overlap-id
    maps to one (P, n_over, n_pad) int32 block (-1 = PAD) and collect the
    per-pair true sizes. Used by both the upload and the device-resident
    staging paths so the padding/accounting can never drift."""
    P = len(pairs)
    assert P > 0
    n_over0 = pairs[0][1].shape[0]
    n_over1 = pairs[0][3].shape[0]
    n_pad = max(p[1].shape[1] for p in pairs)
    m_pad = max(p[3].shape[1] for p in pairs)
    if shape_grid_enabled():
        n_pad, m_pad = _grid_dim(n_pad), _grid_dim(m_pad)
    ids0 = np.full((P, n_over0, n_pad), -1, dtype=np.int32)
    ids1 = np.full((P, n_over1, m_pad), -1, dtype=np.int32)
    for i, (_, i0, _, i1) in enumerate(pairs):
        ids0[i, :, : i0.shape[1]] = i0
        ids1[i, :, : i1.shape[1]] = i1
    sizes0 = np.array([p[1].shape[1] for p in pairs], dtype=np.int32)
    sizes1 = np.array([p[3].shape[1] for p in pairs], dtype=np.int32)
    return ids0, ids1, sizes0, sizes1


def _pair_put(sharding):
    """Device placement for (P, ...) pair-axis arrays: a plain upload, or a
    sharded device_put (each shard travels straight to its device) when the
    bucket is mesh-sharded."""
    if sharding is None:
        return jnp.asarray
    return lambda a: jax.device_put(a, sharding)


def stage_rows_upload(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    quantize=False,
    sharding=None,
):
    """Pad a bucket of (emb_rows0, ids0, emb_rows1, ids1) pairs and START
    the (asynchronous) upload + device-side tensor build. Returns an opaque
    handle for :func:`run_staged`; uploads overlap with whatever the device
    is doing (double buffering across buckets).

    ``quantize``: False/"fp16" uploads the raw dtype; True/"int8" per-row
    symmetric int8 (+ fp32 scales) — half the fp16 bytes over the
    bandwidth-limited tunnel, ~0.3% cosine noise; "int4" packs two codes
    per byte — quarter of fp16, ~2% cosine noise (both gated by the
    committed-example quality tests in tests/test_batch_align.py).

    ``sharding``: an optional NamedSharding over the pair axis (e.g.
    ``parallel.mesh.batch_sharding(mesh)``); the bucket then lands sharded
    across the mesh and the whole pyramid runs data-parallel over pairs.
    ``len(pairs)`` must divide evenly over the mesh axis."""
    put = _pair_put(sharding)
    P = len(pairs)
    mode = {False: "fp16", True: "int8"}.get(quantize, quantize)
    dim = pairs[0][0].shape[1]
    in_dtype = pairs[0][0].dtype

    r0 = max(p[0].shape[0] for p in pairs)
    r1 = max(p[2].shape[0] for p in pairs)
    if shape_grid_enabled():
        r0, r1 = _grid_rows(r0), _grid_rows(r1)
    ids0, ids1, sizes0, sizes1 = _pad_id_maps(pairs)

    emb0 = np.zeros((P, r0, dim), dtype=in_dtype)
    emb1 = np.zeros((P, r1, dim), dtype=in_dtype)
    for i, (e0, _, e1, _) in enumerate(pairs):
        # NaN rows are zeroed on device in _build_doc_tensors
        emb0[i, : e0.shape[0]] = e0
        emb1[i, : e1.shape[0]] = e1

    if mode == "int4":
        q0, s0 = _quantize_rows4(emb0)
        q1, s1 = _quantize_rows4(emb1)
        v0 = _build_doc_tensors_q4(put(q0), put(s0), put(ids0))
        v1 = _build_doc_tensors_q4(put(q1), put(s1), put(ids1))
        staged = (q0, s0, q1, s1, ids0, ids1)
    elif mode == "int8":
        q0, s0 = _quantize_rows(emb0)
        q1, s1 = _quantize_rows(emb1)
        v0 = _build_doc_tensors_q(put(q0), put(s0), put(ids0))
        v1 = _build_doc_tensors_q(put(q1), put(s1), put(ids1))
        staged = (q0, s0, q1, s1, ids0, ids1)
    else:
        v0 = _build_doc_tensors(put(emb0), put(ids0))
        v1 = _build_doc_tensors(put(emb1), put(ids1))
        staged = (emb0, emb1, ids0, ids1)
    upload_stats["bytes"] += sum(a.nbytes for a in staged)
    upload_stats["buckets"] += 1
    return (v0, v1, sizes0, sizes1)


def stage_rows_device(
    pairs: Sequence[Tuple[object, np.ndarray, object, np.ndarray]],
    sharding=None,
):
    """Fused-pipeline staging: each pair is (dev_rows0, ids0, dev_rows1,
    ids1) where dev_rows are (embed_cache.max_rows, d) fp16 DEVICE arrays
    produced by the embed stage (utils/embed_cache.py). Only the id maps
    (a few KB) cross the tunnel; the embeddings never leave the device.

    The pairs' documents are deduplicated into ONE (U, max_rows, d) fp16
    bank (a document aligning against many counterparts is stored once,
    not once per pair) and the id maps are rebased to global bank rows;
    the overlap tensors gather straight from the flat bank in fp16
    (_build_doc_tensors_flat). The old per-side (P, max_rows, d) stacks —
    fp32-cast in full before the gather — were the fused pair_batch-128
    OOM (2 sides x 128 x 4096 x 1024 x (2 + 4 + 4) bytes > HBM). U pads to
    a power of two with zero slots so compiled shapes stay logarithmic;
    programs key on (P, U_pad, n_overlaps, n_pad) — not on documents."""
    put = _pair_put(sharding)
    ids0, ids1, sizes0, sizes1 = _pad_id_maps(pairs)

    slot_of = {}
    unique = []
    for p in pairs:
        for rows_dev in (p[0], p[2]):
            if id(rows_dev) not in slot_of:
                slot_of[id(rows_dev)] = len(unique)
                unique.append(rows_dev)
    rows = unique[0].shape[0]
    assert all(u.shape == unique[0].shape for u in unique), \
        "embed_cache entries must share one (max_rows, dim) shape"
    u_pad = 1 << (len(unique) - 1).bit_length()
    if u_pad > len(unique):
        zero_slot = jnp.zeros_like(unique[0])
        unique = unique + [zero_slot] * (u_pad - len(unique))
    bank = jnp.stack(unique).reshape(u_pad * rows, -1)
    if sharding is not None:
        # every device needs every document's rows: replicate the bank
        # over the mesh; the id maps (and thus v0/v1) stay pair-sharded
        bank = jax.device_put(
            bank,
            jax.sharding.NamedSharding(
                sharding.mesh, jax.sharding.PartitionSpec()
            ),
        )

    slot0 = np.array([slot_of[id(p[0])] for p in pairs], np.int32)
    slot1 = np.array([slot_of[id(p[2])] for p in pairs], np.int32)
    gids0 = np.where(ids0 >= 0, ids0 + slot0[:, None, None] * rows, -1)
    gids1 = np.where(ids1 >= 0, ids1 + slot1[:, None, None] * rows, -1)

    v0 = _build_doc_tensors_flat(bank, put(gids0))
    v1 = _build_doc_tensors_flat(bank, put(gids1))
    if sharding is not None:
        v0, v1 = jax.device_put(v0, sharding), jax.device_put(v1, sharding)
    upload_stats["bytes"] += gids0.nbytes + gids1.nbytes
    upload_stats["buckets"] += 1
    return (v0, v1, sizes0, sizes1)


def run_staged(handle, **kwargs) -> List[Tuple[List[Alignment], np.ndarray]]:
    """Run the batched pyramid on a bucket staged by stage_rows_upload."""
    v0, v1, sizes0, sizes1 = handle
    return _vecalign_batched_core(v0, v1, sizes0, sizes1, **kwargs)


def vecalign_batched_from_rows(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]],
    quantize: bool = False,
    **kwargs,
) -> List[Tuple[List[Alignment], np.ndarray]]:
    """Like :func:`vecalign_batched`, but each pair is
    (emb_rows0 (r0, d), ids0 (n_overlaps, n0), emb_rows1, ids1) — raw
    embedding rows (any float dtype; fp16 halves upload again vs the
    materialized overlap tensor, which repeats every row ~n_overlaps times)
    plus make_doc_ids index maps. The overlap tensors are gathered and
    normalized on device.
    """
    return run_staged(stage_rows_upload(pairs, quantize=quantize), **kwargs)


def vecalign_batched(
    pairs: Sequence[Tuple[np.ndarray, np.ndarray]],
    final_alignment_types: List[Tuple[int, int]],
    del_percentile_frac: float,
    width_over2: int,
    max_size_full_dp: int,
    costs_sample_size: int,
    num_samps_for_norm: int,
    seed: int = 42,
    sampling: str = "shared",
    dp_backend: str = "auto",
) -> List[Tuple[List[Alignment], np.ndarray]]:
    """Align a bucket of document pairs in one batched pyramid.

    pairs: [(vecs0, vecs1)] overlap tensors, (n_overlaps, n_i, dim) each;
    n_overlaps and dim must agree across the bucket (pad counts differ).
    Returns [(final_alignments, alignment_scores)] per pair.
    """
    P = len(pairs)
    assert P > 0

    n_over0 = pairs[0][0].shape[0]
    n_over1 = pairs[0][1].shape[0]
    dim = pairs[0][0].shape[2]
    sizes0 = np.array([v0.shape[1] for v0, _ in pairs], dtype=np.int32)
    sizes1 = np.array([v1.shape[1] for _, v1 in pairs], dtype=np.int32)
    n_pad = int(sizes0.max())
    m_pad = int(sizes1.max())
    if shape_grid_enabled():
        n_pad, m_pad = _grid_dim(n_pad), _grid_dim(m_pad)

    # pad in the pairs' own dtype (fp16 halves the host->device upload);
    # the normalization jit upcasts to fp32 on device
    in_dtype = pairs[0][0].dtype
    v0 = np.zeros((P, n_over0, n_pad, dim), dtype=in_dtype)
    v1 = np.zeros((P, n_over1, m_pad, dim), dtype=in_dtype)
    for i, (a, b) in enumerate(pairs):
        v0[i, :, : a.shape[1]] = a
        v1[i, :, : b.shape[1]] = b

    # normalize; padding rows stay zero (zero norm -> zero vector)
    v0 = costs_ops.upcast_norm1(jnp.asarray(v0))
    v1 = costs_ops.upcast_norm1(jnp.asarray(v1))
    return _vecalign_batched_core(
        v0, v1, sizes0, sizes1,
        final_alignment_types=final_alignment_types,
        del_percentile_frac=del_percentile_frac,
        width_over2=width_over2,
        max_size_full_dp=max_size_full_dp,
        costs_sample_size=costs_sample_size,
        num_samps_for_norm=num_samps_for_norm,
        seed=seed,
        sampling=sampling,
        dp_backend=dp_backend,
    )


def _vecalign_batched_core(
    v0,
    v1,
    sizes0: np.ndarray,
    sizes1: np.ndarray,
    final_alignment_types: List[Tuple[int, int]],
    del_percentile_frac: float,
    width_over2: int,
    max_size_full_dp: int,
    costs_sample_size: int,
    num_samps_for_norm: int,
    seed: int = 42,
    sampling: str = "shared",
    dp_backend: str = "auto",
) -> List[Tuple[List[Alignment], np.ndarray]]:
    """Shared pyramid over device-resident normalized (P, o, n, d) tensors."""
    if width_over2 < 3:
        width_over2 = 3
    P = v0.shape[0]
    n_pad, m_pad = v0.shape[2], v1.shape[2]

    # shared pyramid depth from the padded shapes
    s0, s1 = n_pad, m_pad
    max_depth = 0
    while s0 * s1 > max_size_full_dp**2:
        max_depth += 1
        s0 //= 2
        s1 //= 2

    # multi-chip: when the staged tensors arrived pair-sharded over a mesh,
    # every host-side upload of a (P, ...) array must land with the SAME
    # sharding, or jit would silently insert resharding collectives
    info = _pair_mesh(v0)
    put_pairs = _pair_put(
        jax.sharding.NamedSharding(info[0], jax.sharding.PartitionSpec(info[1]))
        if info is not None else None
    )

    # sizes live twice: numpy for host bookkeeping (traceback bounds, paired
    # draws) and ONE device copy per side reused by every level's jits —
    # per-level jnp.asarray re-uploads are blocking tunnel roundtrips
    d_sizes0 = put_pairs(sizes0.astype(np.int32))
    d_sizes1 = put_pairs(sizes1.astype(np.int32))
    stack = {0: {"v0": v0, "v1": v1, "h_sizes0": sizes0, "h_sizes1": sizes1,
                 "d_sizes0": d_sizes0, "d_sizes1": d_sizes1}}
    for depth in range(1, max_depth + 1):
        prev = stack[depth - 1]
        stack[depth] = {
            "v0": _downsample_masked(prev["v0"], prev["d_sizes0"]),
            "v1": _downsample_masked(prev["v1"], prev["d_sizes1"]),
            "h_sizes0": prev["h_sizes0"] // 2,
            "h_sizes1": prev["h_sizes1"] // 2,
            "d_sizes0": prev["d_sizes0"] // 2,
            "d_sizes1": prev["d_sizes1"] // 2,
        }

    import math

    paired = sampling == "paired"
    pair_rngs = [np.random.default_rng(seed) for _ in range(P)] if paired else None
    base_key = jax.random.PRNGKey(seed)  # device PRNG for shared mode

    # margin normalizers for every depth BEFORE any knob draw (the per-pair
    # driver's order, so "paired" RNG streams line up with pyramid.vecalign)
    for depth in sorted(stack):
        e = stack[depth]
        e["alignment_types"] = final_alignment_types if depth == 0 else [(1, 1)]
        h_sizes0 = e["h_sizes0"]
        h_sizes1 = e["h_sizes1"]
        o0, o1 = e["v0"].shape[1], e["v1"].shape[1]
        samps1 = math.ceil(num_samps_for_norm / o1)
        samps0 = math.ceil(num_samps_for_norm / o0)

        if paired:
            # per-pair host streams; a size-0 pair draws nothing (its
            # gathered rows are zero, so the normalizers land on
            # compute_norms' "ones" fallback exactly)
            idx1 = np.zeros((P, o1, samps1), dtype=np.int32)
            idx0 = np.zeros((P, o0, samps0), dtype=np.int32)
            for i in range(P):
                if h_sizes1[i] > 0 and samps1:
                    idx1[i] = pair_rngs[i].integers(0, h_sizes1[i], size=(o1, samps1))
                if h_sizes0[i] > 0 and samps0:
                    idx0[i] = pair_rngs[i].integers(0, h_sizes0[i], size=(o0, samps0))
            sample1 = _batched_gather_sample(e["v1"], put_pairs(idx1))
            e["n0"] = _batched_norms_from_sample(e["v0"], sample1)
            sample0 = _batched_gather_sample(e["v0"], put_pairs(idx0))
            e["n1"] = _batched_norms_from_sample(e["v1"], sample0)
        else:
            # shared mode: the device PRNG draws the indices — no upload
            kd = jax.random.fold_in(base_key, depth)
            sample1 = _device_norm_sample(
                jax.random.fold_in(kd, 0), e["v1"], e["d_sizes1"], samps1,
            )
            e["n0"] = _batched_norms_from_sample(e["v0"], sample1)
            sample0 = _device_norm_sample(
                jax.random.fold_in(kd, 1), e["v0"], e["d_sizes0"], samps0,
            )
            e["n1"] = _batched_norms_from_sample(e["v1"], sample0)

    # deletion penalties per depth; pairs smaller than the sample budget use
    # the exhaustive index cross product (reference dp_utils.py:278-323's
    # small-problem branch), masked on device
    for depth in sorted(stack):
        e = stack[depth]
        h_sizes0 = e["h_sizes0"]
        h_sizes1 = e["h_sizes1"]
        S = costs_sample_size

        if paired:
            # host draws (pair-RNG order) + host knob, bit-matching
            # make_del_knob / DeletionKnob
            from svecalign_tpu.vecalign.deletion import DeletionKnob

            x_idx = np.zeros((P, S), dtype=np.int32)
            y_idx = np.zeros((P, S), dtype=np.int32)
            n_valid = np.zeros(P, dtype=np.int32)
            for i in range(P):
                e_size, f_size = int(h_sizes0[i]), int(h_sizes1[i])
                r = pair_rngs[i]
                if e_size > 0 and f_size > 0 and S > 0:
                    if e_size * f_size < S:
                        xi, yi = np.meshgrid(
                            np.arange(e_size, dtype=np.int32),
                            np.arange(f_size, dtype=np.int32),
                            indexing="ij",
                        )
                        n = e_size * f_size
                        x_idx[i, :n] = xi.ravel()
                        y_idx[i, :n] = yi.ravel()
                        n_valid[i] = n
                    else:
                        x_idx[i] = r.integers(0, e_size, size=S).astype(np.int32)
                        y_idx[i] = r.integers(0, f_size, size=S).astype(np.int32)
                        n_valid[i] = S

            scores = np.asarray(
                _batched_score_pairs(
                    e["v0"][:, 0], e["v1"][:, 0], e["n0"][:, 0], e["n1"][:, 0],
                    put_pairs(x_idx), put_pairs(y_idx),
                ),
                dtype=np.float32,
            )
            pens = np.empty(P, dtype=np.float32)
            for i in range(P):
                if n_valid[i]:
                    samp = scores[i, : n_valid[i]]
                    knob = DeletionKnob(samp, 0, float(samp.max()))
                else:
                    knob = DeletionKnob(np.array([0.0, 0.5, 1.0]), 0, 1)
                pens[i] = knob.percentile_frac_to_del_penalty(del_percentile_frac)
            e["del_penalty"] = put_pairs(pens)
        else:
            # fully on device: PRNG draws -> scores -> histogram ->
            # percentile interp; NOTHING crosses the tunnel but the key
            e["del_penalty"] = _device_knob_penalty(
                jax.random.fold_in(base_key, 1000 + depth),
                e["v0"][:, 0], e["v1"][:, 0], e["n0"][:, 0], e["n1"][:, 0],
                e["d_sizes0"], e["d_sizes1"],
                S=S, frac=del_percentile_frac,
            )

    # dense level
    top = stack[max_depth]
    device_tb = device_traceback_enabled()
    costs = _batched_dense_costs(
        top["v0"][:, 0], top["v1"][:, 0], top["n0"][:, 0], top["n1"][:, 0]
    )
    if device_tb:
        steps = _batched_dense_steps(
            costs, top["del_penalty"], top["d_sizes0"], top["d_sizes1"]
        )
        sxs, sys_, svs = jax.device_get(steps)
        top["alignments"] = [
            dense_alignments_from_steps(sxs[i], sys_[i], svs[i]) for i in range(P)
        ]
    else:
        bp = _batched_dense_bp(costs, top["del_penalty"])
        top["alignments"] = [
            dense_traceback(bp[i][: top["h_sizes0"][i] + 1, : top["h_sizes1"][i] + 1])
            for i in range(P)
        ]

    # refinement levels
    upsample_depths = [0] if max_depth == 0 else list(reversed(range(0, max_depth)))
    for depth in upsample_depths:
        e = stack[depth]
        types = e["alignment_types"]
        x_offsets = tuple(x for x, _ in types)
        y_offsets = tuple(y for _, y in types)

        paths = []
        for i in range(P):
            if max_depth > 0:
                coarse = upsample_alignment(stack[depth + 1]["alignments"][i])
                extend_alignments(coarse, int(e["h_sizes0"][i]), int(e["h_sizes1"][i]))
            else:
                coarse = stack[0]["alignments"][i]
            paths.append(alignment_to_search_path(coarse))

        # band length: a unit-step search path over an (s0, s1) pair has
        # exactly s0 + s1 + 1 nodes, so the padded level dims bound every
        # pair's path. Deriving a_pad from the shapes (not the data) keeps
        # the banded-level programs' compile keys stable across buckets —
        # the data-dependent max path length recompiled every level of
        # every bucket on axon (~20 s per bucket, tools/profile_align.py).
        if shape_grid_enabled():
            a_pad = e["v0"].shape[2] + e["v1"].shape[2] + 1
        else:
            a_pad = max(len(p) for p in paths)
        boff_in = np.zeros((P, a_pad), dtype=np.int32)
        for i, path in enumerate(paths):
            bo = costs_ops.path_to_band_offsets(path, width_over2)
            boff_in[i, : len(bo)] = bo
            boff_in[i, len(bo) :] = bo[-1]  # replicate; cells are invalid anyway
        # host copy of the node-space extension for sparse_traceback; the
        # device copy is derived on device from the single boff_in upload
        # (unused when the traceback itself runs on device)
        boff_out = None
        if not device_tb:
            boff_out = np.stack(
                [dp_ops.extend_band_offsets(boff_in[i]) for i in range(P)]
            )
        # int16 over the tunnel when offsets fit (values in [-w2, m_pad+1])
        if m_pad + width_over2 + 2 < np.iinfo(np.int16).max:
            boff_up = boff_in.astype(np.int16)
        else:
            boff_up = boff_in
        upload_stats["level_bytes"] += boff_up.nbytes
        d_boff_in, d_boff_out = _prep_band_offsets(put_pairs(boff_up))

        band_costs = _batched_banded_costs(
            e["v0"], e["v1"], e["n0"], e["n1"], d_boff_in,
            x_offsets, y_offsets, width_over2,
            # paired mode matches the per-pair driver's chunking so the
            # windowed matmul tiles (and thus float rounding) line up
            chunk=512 if paired else _banded_chunk_for_batch(P),
        )
        csum, xp, yp = _run_batched_banded_dp(
            band_costs,
            d_boff_in,
            d_boff_out,
            x_offsets,
            y_offsets,
            e["del_penalty"],
            e["d_sizes0"],
            e["d_sizes1"],
            dp_backend=dp_backend,
        )
        e["alignments"] = []
        e["alignment_scores"] = []
        if device_tb:
            # walk the pointers on device; ONE pull of the visited path
            # (~100x fewer bytes than the full csum+bp planes)
            steps = _batched_banded_tb(
                csum, xp, yp, d_boff_out, e["d_sizes0"], e["d_sizes1"]
            )
            sx_h, sy_h, sxp_h, syp_h, cs_h = jax.device_get(steps)
            for i in range(P):
                aligns, scores = sparse_alignments_from_steps(
                    sx_h[i], sy_h[i], sxp_h[i], syp_h[i], cs_h[i]
                )
                e["alignments"].append(aligns)
                e["alignment_scores"].append(scores)
        else:
            # ONE pull for the whole bucket
            csum_h, xp_h, yp_h = jax.device_get((csum, xp, yp))
            for i in range(P):
                aligns, scores = sparse_traceback(
                    csum_h[i].astype(np.float64),
                    xp_h[i],
                    yp_h[i],
                    boff_out[i],
                    int(e["h_sizes0"][i]),
                    int(e["h_sizes1"][i]),
                )
                e["alignments"].append(aligns)
                e["alignment_scores"].append(scores)

    return list(zip(stack[0]["alignments"], stack[0]["alignment_scores"]))
