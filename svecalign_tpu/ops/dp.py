"""Dynamic-programming alignment kernels, XLA-native.

TPU-first reformulation of the reference Cython DP kernels
(reference svecalign/vecalign/dp_core.pyx:79-141 ``dense_dp`` and
:269-405 ``sparse_dp``):

- ``dense_dp``: the classic 3-move (diag/left/up) DP. The within-row
  "left" dependency is a min-plus prefix scan with a linear penalty, so each
  row is computed in parallel with ``jax.lax.associative_scan`` and rows are
  driven by one ``lax.scan`` — no scalar loops.

- ``banded_dp``: the banded DP along a search path in rotated coordinates
  (a, b) = (x + y, y). Anti-diagonal ``a`` depends only on rows
  ``a-1 .. a-K`` (K = max alignment span), and within a row every band cell
  and every alignment type is independent. The scan carries a K-row ring
  buffer of the cumulative-cost band; each step is a handful of
  dynamic-slices + adds + a min-reduce across types, fully vectorized over
  the band (VPU lanes). Backpointers are emitted per row and traced back on
  the host (:mod:`svecalign_tpu.vecalign.traceback`).

Key algebraic fact exploited (vs the reference's per-cell coordinate
arithmetic): for a fixed output row ``a`` and alignment type ``(xo, yo)``,
the predecessor band position of every cell ``b`` is the SAME uniform shift
``b_offset_out[a] - yo - b_offset_out[a - xo - yo]``, and the cost-band row
aligns exactly (shift 0). This turns the inner double loop into vector ops.

Accumulation is float32 (the reference uses float64); parity is defined as
gold-F1 equality plus cost agreement within tolerance (SURVEY.md section 6).
"""

import os
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_BP = -42  # backpointer marker for unreachable cells (dp_core.pyx:367-368)


# ---------------------------------------------------------------------------
# Dense DP
# ---------------------------------------------------------------------------


def dense_dp_scan(costs: Array, pen: Array) -> Tuple[Array, Array]:
    """Device half of the dense DP: anti-diagonal wavefront ``lax.scan``
    over a (N, M) 1-1 cost matrix. Returns the DIAGONAL-MAJOR planes
    (val_diags, bp_diags) of shape (N+M+1, N+1) — ``plane[d, r]`` is node
    (r, d - r) — deliberately NOT reassembled into (row, col) layout on
    device: see :func:`dense_reassemble` for why.

    Every cell of an anti-diagonal depends only on the two previous
    anti-diagonals, so each step is pure vector math (no within-step
    dependency) and each candidate uses the same arithmetic chain as the
    sequential recurrence — exact ties (e.g. along deletion runs) resolve
    identically. Tie-breaking priority diag > left > up matches reference
    dp_core.pyx:79-141.
    """
    n, m = costs.shape
    rmax, cmax = n + 1, m + 1
    inf = jnp.float32(jnp.inf)

    r_idx = jnp.arange(rmax, dtype=jnp.int32)

    # pre-extract cost anti-diagonals: cost_diag[d, r] = costs[r-1, d-r-1]
    n_diags = rmax + cmax - 1
    dd = jnp.arange(n_diags, dtype=jnp.int32)[:, None]
    rr = r_idx[None, :]
    cc = dd - rr
    cost_valid = (rr >= 1) & (cc >= 1) & (rr - 1 < n) & (cc - 1 < m)
    cost_diag = jnp.where(
        cost_valid,
        costs[jnp.clip(rr - 1, 0, n - 1), jnp.clip(cc - 1, 0, m - 1)],
        inf,
    )  # (n_diags, rmax)

    def shift_down(v):
        # v[r] -> v[r-1] with inf at r=0
        return jnp.concatenate([jnp.full((1,), inf), v[:-1]])

    def step(carry, inputs):
        p1, p2 = carry  # diagonals d-1 and d-2, indexed by r
        cdiag, d = inputs

        c = d - r_idx
        on_grid = (c >= 0) & (c < cmax)

        cost0 = shift_down(p2) + cdiag  # diag move
        cost1 = p1 + pen  # left move (insertion)
        cost2 = shift_down(p1) + pen  # up move (deletion)

        # sequential priority: diag, then strictly-better left, then up
        val = jnp.where(cost1 < cost0, cost1, cost0)
        bp = jnp.where(cost1 < cost0, 1, 0)
        bp = jnp.where(cost2 < val, 2, bp)
        val = jnp.where(cost2 < val, cost2, val)

        # boundary rows/cols (dp_core.pyx:107-119)
        cf = c.astype(jnp.float32)
        rf = r_idx.astype(jnp.float32)
        val = jnp.where(r_idx == 0, cf * pen, val)
        bp = jnp.where(r_idx == 0, 1, bp)
        val = jnp.where((c == 0) & (r_idx > 0), rf * pen, val)
        bp = jnp.where((c == 0) & (r_idx > 0), 2, bp)
        val = jnp.where((r_idx == 0) & (c == 0), 0.0, val)
        bp = jnp.where((r_idx == 0) & (c == 0), 4, bp)

        val = jnp.where(on_grid, val, inf)
        # int8 backpointers: 4x less D2H traffic (the tunnel is the
        # bottleneck, CLAUDE.md); values are in {-1, 0, 1, 2, 4}
        bp = jnp.where(on_grid, bp, -1).astype(jnp.int8)
        return (val, p1), (val, bp)

    p0 = jnp.full((rmax,), inf)
    _, (val_diags, bp_diags) = jax.lax.scan(
        step, (p0, p0), (cost_diag, dd[:, 0])
    )

    return val_diags, bp_diags


_dense_dp_scan_j = jax.jit(dense_dp_scan)


def dense_reassemble(plane: np.ndarray) -> np.ndarray:
    """HOST-side (d, r) diagonal-major -> (r, c) node-matrix reassembly
    (leading batch dims pass through).

    On host, deliberately. The (r, c) gather inside the device program is
    an XLA:TPU landmine (v5e, 2026-08-18, tools/repro_dense_fault.py /
    repro_dense_parts.py): the original two same-index gathers (csum fp32
    + bp int8) got fused into a dual-output gather that KILLED the TPU
    worker ("kernel fault") at e.g. (P>=4, 256,256)/(288,288)/(512,512)
    while each gather alone ran everywhere probed; rewriting them as one
    stacked gather fixed those shapes but faulted at (P=1, 256,256). No
    shape predicate survived probing, so the kernels return the scan's
    raw planes and this numpy gather (sub-ms at dense-level sizes, ~2x
    the pull bytes) does the reassembly where compilers can't hurt it."""
    plane = np.asarray(plane)
    n_diags, rmax = plane.shape[-2:]
    cmax = n_diags - rmax + 1
    r = np.arange(rmax)[:, None]
    c = np.arange(cmax)[None, :]
    return plane[..., r + c, r]


def dense_dp(costs, pen) -> Tuple[np.ndarray, np.ndarray]:
    """Full dense DP: device wavefront scan + host reassembly.

    Returns NUMPY (csum, bp) of shape (N+1, M+1): cumulative cost and
    backpointers on nodes (0 = diag, 1 = left/insertion, 2 = up/deletion),
    matching reference dp_core.pyx:79-141 including tie-breaking priority
    diag > left > up. Use :func:`dense_dp_bp` when only the backpointers
    are needed (skips the fp32 plane pull)."""
    vd, bd = _dense_dp_scan_j(costs, pen)
    return dense_reassemble(vd), dense_reassemble(bd)


def dense_dp_bp(costs, pen) -> np.ndarray:
    """Backpointers-only dense DP — pulls just the int8 plane (the
    traceback never reads csum; the fp32 plane stays on device)."""
    _, bd = _dense_dp_scan_j(costs, pen)
    return dense_reassemble(bd)


def device_traceback_enabled(per_pair: bool = False) -> bool:
    """Walk the DP backpointers ON DEVICE and pull only the visited path
    (~100x fewer D2H bytes than the full planes — the tunnel's pulls are
    superlinear in bytes and stall the host afterwards, ablate_stall.py).
    ``SVECALIGN_DEVICE_TRACEBACK={1,0,auto}``; auto = on for TPU backends
    in the BATCHED aligner (measured 1.85x at the fused headline workload,
    1.35x at hour scale — BASELINE.md round 5), off on CPU (the pull is
    free and the sequential walk-scan isn't) and off for the per-pair
    pyramid (``per_pair=True``): measured 0.82x THERE — one pair pulls
    only ~100 KB, so the walk's extra dispatches cost more than the bytes
    saved (2026-08-19, 8 interleaved reps, example pair). ``1``/``0``
    force both paths. Outputs are identical either way
    (tests/test_device_traceback.py). Note: with the walk on, the pyramid
    debug stack (--debug_save_stack) omits the backpointer planes."""
    v = os.environ.get("SVECALIGN_DEVICE_TRACEBACK", "auto").lower()
    if v in ("1", "on", "true"):
        return True
    if v in ("0", "off", "false"):
        return False
    return not per_pair and jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Device-side traceback
#
# The host traceback needs random access to the FULL backpointer plane, so
# the host path pulls it whole: (n_diags, rmax) int8 per pair for the dense
# level plus (A+2, B) fp32+2*int8 for every banded level. At mining batch
# sizes that is ~10 MB of D2H per 64-pair bucket — and the tunnel's pulls
# are superlinear in bytes with a bytes-proportional host stall afterwards
# (tools/ablate_stall.py: 8 MB ≈ 0.25 s + after-damage). The walk itself is
# a unit-step path of at most n_diags nodes, so a fixed-length lax.scan can
# follow the pointers ON DEVICE and emit only the visited nodes: the pull
# shrinks to the path (~100x fewer bytes). Host code then rebuilds the
# alignment lists from the emitted steps with the exact reference semantics
# (reference svecalign/vecalign/dp_utils.py:105-174).
#
# XLA:TPU gather discipline (the round-4 worker-crash lesson, see
# dense_reassemble): every gather in here is SINGLE-output — xp/yp are
# stacked into ONE array before the walk so the per-step fetch is one
# gather, and the csum path gather runs on its own operand after the scan
# instead of sharing indices with the pointer fetch.
# ---------------------------------------------------------------------------


def dense_traceback_scan(bd_planes: Array, x_size: Array, y_size: Array):
    """Walk the dense DP's diagonal-major bp planes from node
    (x_size, y_size) to (0, 0) on device.

    Returns (xs, ys, vs): the visited node and its bp value per step,
    length n_diags (an upper bound on any unit-step path). After the walk
    reaches the origin it stays there (the origin's bp marker is 4); the
    host conversion stops at the first (0, 0) step, exactly like the host
    traceback's ``if xx == yy == 0: break``.
    """
    n_diags, rmax = bd_planes.shape

    def step(carry, _):
        xx, yy = carry
        v = bd_planes[xx + yy, xx].astype(jnp.int32)  # single-output gather
        dx = jnp.where((v == 0) | (v == 2), 1, 0)
        dy = jnp.where((v == 0) | (v == 1), 1, 0)
        at0 = (xx == 0) & (yy == 0)
        nxx = jnp.where(at0, 0, xx - dx)
        nyy = jnp.where(at0, 0, yy - dy)
        return (nxx, nyy), (xx, yy, v.astype(jnp.int8))

    x0 = x_size.astype(jnp.int32)
    y0 = y_size.astype(jnp.int32)
    (_, _), (xs, ys, vs) = jax.lax.scan(step, (x0, y0), None, length=n_diags)
    return xs.astype(jnp.int32), ys.astype(jnp.int32), vs


def banded_traceback_scan(
    csum: Array,
    xp: Array,
    yp: Array,
    b_offset_out: Array,
    x_size: Array,
    y_size: Array,
):
    """Walk the banded DP's (A+2, B) planes from node (x_size, y_size) to
    (0, 0) on device; gather csum along the visited path.

    Returns (xs, ys, xps, yps, cs) of length A+2 each. The host conversion
    (traceback.sparse_alignments_from_steps) appends the csum value THEN
    stops at the first (0, 0) step — the reference walk's order
    (dp_utils.py:105-143), so the origin's cumulative cost is included.
    """
    A2, B = xp.shape
    # one gather per step for BOTH pointers (never two same-index gathers —
    # XLA fuses those into a dual-output gather, the round-4 TPU landmine)
    xpy = jnp.stack([xp, yp], axis=-1).astype(jnp.int32)  # (A+2, B, 2)
    boff = b_offset_out.astype(jnp.int32)

    def step(carry, _):
        xx, yy = carry
        aa = xx + yy
        bb = yy - boff[aa]
        v = xpy[aa, bb]  # (2,): single gather
        at0 = (xx == 0) & (yy == 0)
        dx = jnp.where(at0, 0, v[0])
        dy = jnp.where(at0, 0, v[1])
        return (xx - dx, yy - dy), (xx, yy, v[0].astype(jnp.int8), v[1].astype(jnp.int8))

    x0 = x_size.astype(jnp.int32)
    y0 = y_size.astype(jnp.int32)
    (_, _), (xs, ys, xps, yps) = jax.lax.scan(step, (x0, y0), None, length=A2)
    aa = xs + ys
    bb = ys - boff[aa]
    cs = csum[aa, bb]  # single gather on its own operand, after the scan
    return xs.astype(jnp.int32), ys.astype(jnp.int32), xps, yps, cs


# ---------------------------------------------------------------------------
# Banded (sparse) DP
# ---------------------------------------------------------------------------


def extend_band_offsets(b_offset_in: np.ndarray) -> np.ndarray:
    """Node-space band offsets: two replicated points at the front, then +1.

    Matches reference dp_core.pyx:315-328 — costs live between nodes, so the
    node grid is shifted by (x=+1, y=+1), i.e. (a=+2, b=+1) in rotated
    coordinates.
    """
    b_offset_in = np.asarray(b_offset_in, dtype=np.int32)
    first = b_offset_in[0]
    return np.concatenate([[first, first], b_offset_in + 1]).astype(np.int32)


@partial(jax.jit, static_argnames=("x_offsets", "y_offsets"))
def banded_dp(
    costs: Array,
    b_offset_in: Array,
    b_offset_out: Array,
    x_offsets: Tuple[int, ...],
    y_offsets: Tuple[int, ...],
    del_penalty: Array,
    x_in_size: Array,
    y_in_size: Array,
) -> Tuple[Array, Array, Array]:
    """Banded wavefront DP along a search path.

    costs: (T, A, B) banded per-type costs from :func:`banded_costs`
    b_offset_in: (A,) band offsets of the cost grid
    b_offset_out: (A+2,) band offsets of the node grid (extend_band_offsets)
    x_offsets / y_offsets: alignment types EXCLUDING ins/del; (0,1) and
        (1,0) are appended internally (dp_core.pyx:305-307), in that order,
        preserving the reference's first-minimum tie-breaking.
    Returns (csum, xp, yp) each of shape (A+2, B).
    """
    T, A, B = costs.shape
    inf = jnp.float32(jnp.inf)

    xo = np.concatenate([np.asarray(x_offsets, np.int32), [0, 1]])
    yo = np.concatenate([np.asarray(y_offsets, np.int32), [1, 0]])
    span = xo + yo  # lookback distance in a per type
    K = int(span.max())  # ring-buffer depth
    bp_dtype = jnp.int8 if int(max(xo.max(), yo.max())) <= 127 else jnp.int32
    P = K + 1  # band padding for predecessor shifts (|shift| <= K)
    n_types = len(xo)
    is_indel = (xo == 0) | (yo == 0)

    xo_j = jnp.asarray(xo)
    yo_j = jnp.asarray(yo)
    span_j = jnp.asarray(span)
    indel_j = jnp.asarray(is_indel)

    x_out_size = x_in_size + 1
    y_out_size = y_in_size + 1

    band = jnp.arange(B, dtype=jnp.int32)

    # costs padded so that row index aa-2 can be fetched unconditionally
    costs_pad = jnp.concatenate(
        [jnp.full((T, 2, B), inf), costs], axis=1
    )  # (T, A+2, B); row aa holds input-cost row aa-2

    def step(ring, aa):
        # ring: (K, B + 2P) float32, padded rows of the last K csum rows
        boff_a = b_offset_out[aa]
        yy = boff_a + band  # y coordinate of each band cell
        xx = aa - yy

        # --- candidate values per type -----------------------------------
        prev_rows_idx = (aa - span_j) % K  # (n_types,)
        boff_prev = b_offset_out[jnp.clip(aa - span_j, 0, None)]
        shifts = boff_a - yo_j - boff_prev  # uniform per type

        def get_prev(t):
            row = ring[prev_rows_idx[t]]
            return jax.lax.dynamic_slice(row, (P + shifts[t],), (B,))

        prev_vals = jax.vmap(get_prev)(jnp.arange(n_types))  # (n_types, B)

        cost_row = costs_pad[:, aa, :]  # (T, B); +inf rows for aa < 2
        # rows beyond the cost grid (aa - 2 >= A) are invalid
        cost_row = jnp.where(aa - 2 < A, cost_row, inf)
        indel_cost = jnp.full((B,), del_penalty, dtype=jnp.float32)
        cost_all = jnp.concatenate([cost_row, indel_cost[None], indel_cost[None]])

        xx_in = xx - 1
        yy_in = yy - 1
        xx_prev = xx[None, :] - xo_j[:, None]  # (n_types, B)
        yy_prev = yy[None, :] - yo_j[:, None]
        valid = (
            (xx_in >= 0)[None]
            & (xx_in < x_in_size)[None]
            & (yy_in >= 0)[None]
            & (yy_in < y_in_size)[None]
            & (xx_prev >= 0)
            & (xx_prev < x_out_size)
            & (yy_prev >= 0)
            & (yy_prev < y_out_size)
            & (aa >= span_j)[:, None]
        )

        cand = jnp.where(valid, prev_vals + cost_all, inf)
        best_t = jnp.argmin(cand, axis=0)  # first minimum wins
        best_val = jnp.take_along_axis(cand, best_t[None], axis=0)[0]
        reachable = jnp.isfinite(best_val)
        xp = jnp.where(reachable, xo_j[best_t], NEG_BP)
        yp = jnp.where(reachable, yo_j[best_t], NEG_BP)
        val = jnp.where(reachable, best_val, inf)

        # --- edge cases override (dp_core.pyx:352-362) --------------------
        edge_y = (xx == 0) & (yy >= 0) & (yy < y_out_size)  # all-insertions column
        edge_x = (~edge_y) & (yy == 0) & (xx >= 0) & (xx < x_out_size)
        val = jnp.where(edge_y, del_penalty * yy, val)
        xp = jnp.where(edge_y, 0, xp)
        yp = jnp.where(edge_y, 1, yp)
        val = jnp.where(edge_x, del_penalty * xx, val)
        xp = jnp.where(edge_x, 1, xp)
        yp = jnp.where(edge_x, 0, yp)

        new_padded = jnp.full((B + 2 * P,), inf).at[P : P + B].set(val)
        ring = ring.at[aa % K].set(new_padded)
        # small backpointers (int8 unless a type offset exceeds 127):
        # 4x less D2H traffic over the tunnel
        return ring, (val, xp.astype(bp_dtype), yp.astype(bp_dtype))

    ring0 = jnp.full((K, B + 2 * P), inf, dtype=jnp.float32)
    _, (csum, xp, yp) = jax.lax.scan(step, ring0, jnp.arange(A + 2, dtype=jnp.int32))
    return csum, xp, yp


def run_banded_dp(
    costs,
    b_offset_in: np.ndarray,
    alignment_types: List[Tuple[int, int]],
    del_penalty: float,
    x_in_size: int,
    y_in_size: int,
    device_planes: bool = False,
):
    """Convenience wrapper matching the reference ``sparse_dp`` signature.

    Returns (csum, xp, yp, b_offset_out) as host numpy arrays — or, with
    ``device_planes=True``, (csum, xp, yp, b_offset_out, d_b_offset_out)
    with the planes AND the already-uploaded node-space offsets ON DEVICE
    (for the device traceback walk — no re-upload), b_offset_out host.
    """
    x_offsets = tuple(x for x, _ in alignment_types)
    y_offsets = tuple(y for _, y in alignment_types)
    b_off_out = extend_band_offsets(np.asarray(b_offset_in))
    d_boff_out = jnp.asarray(b_off_out)
    csum, xp, yp = banded_dp(
        jnp.asarray(costs),
        jnp.asarray(b_offset_in, dtype=jnp.int32),
        d_boff_out,
        x_offsets,
        y_offsets,
        jnp.float32(del_penalty),
        jnp.int32(x_in_size),
        jnp.int32(y_in_size),
    )
    if device_planes:
        return csum, xp, yp, b_off_out, d_boff_out
    # one host pull for all three planes (roundtrip latency dominates on
    # tunneled devices)
    csum_h, xp_h, yp_h = jax.device_get((csum, xp, yp))
    return csum_h.astype(np.float64), xp_h, yp_h, b_off_out
