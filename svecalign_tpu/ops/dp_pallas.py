"""Pallas TPU kernel for the banded wavefront DP.

The banded DP (ops/dp.py ``banded_dp``) is a strict sequential recurrence
over anti-diagonals; the XLA ``lax.scan`` version pays per-step overhead for
HBM round trips of the cost rows and carries. This kernel keeps the entire
state in VMEM: the cost band streams in as one VMEM block, the cumulative
band lives in a K-row ring buffer, and each step is a handful of VPU ops
(dynamic lane roll + add + min) per alignment type.

Key layout trick: ring rows store the B band values in lanes [0, B) with
+inf elsewhere, so the per-type predecessor shift (a uniform lane offset per
row/type, see ops/dp.py docstring) is a single ``pltpu.roll`` — the
wraparound lands in the +inf pad and needs no masking. Wide bands tile the
lane axis: a ring row is ``ceil((B + K) / 128) * 128`` lanes, so any band
width is supported (the roll spans the whole multiple-of-128 row).

Pair batching happens INSIDE the kernel: the grid is (pairs, chunks) with
chunks minor, so each pair's anti-diagonals run sequentially and the ring
scratch carries across its chunk boundaries. No ring reset is needed when
the pair index advances: a cell at anti-diagonal ``aa`` only reads ring rows
``aa - span >= 0``, all of which the SAME pair wrote earlier (reads with
``aa < span`` are gated by ``prev_ok``). This amortizes the per-call
dispatch over the whole bucket — the XLA-level ``vmap`` alternative pays
the scan-step overhead multiplied by the batch.

Semantics are identical to ``banded_dp`` (same outputs, same first-minimum
tie-breaking); ``tests/test_dp_pallas.py`` checks equality against both the
XLA scan and the numpy oracle, including wide-band and batched cases.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svecalign_tpu.ops.dp import NEG_BP, extend_band_offsets

LANES = 128

VMEM_BUDGET = 13 * 1024 * 1024

MAX_BAND_LANES = 4096  # wide-band safety cap (VMEM: ring + cost block)


def _lanes_tot(B: int, K: int) -> int:
    """Lane-row width: the band plus the largest predecessor shift, rounded
    up to whole 128-lane tiles so ``pltpu.roll`` wraparound lands in the
    +inf pad."""
    return -(-(B + K) // LANES) * LANES


def _chunk_rows(n_types: int, lanes_tot: int) -> int:
    """Anti-diagonals per grid step: sized so the double-buffered
    (T, CHUNK, lanes_tot) cost block + 3 output blocks fit the VMEM
    budget."""
    per_row = 2 * (n_types + 3) * lanes_tot * 4
    chunk = (VMEM_BUDGET // per_row) // 8 * 8  # sublane-aligned
    return int(max(8, min(512, chunk)))


def _supported(B: int, K: int, a2: int, n_types: int) -> bool:
    return _lanes_tot(B, K) <= MAX_BAND_LANES


@partial(jax.jit, static_argnames=("x_offsets", "y_offsets"))
def banded_dp_pallas_batched(
    costs: jax.Array,  # (P, T, A, B) float32
    b_offset_in: jax.Array,  # (P, A) int32
    b_offset_out: jax.Array,  # (P, A+2) int32
    x_offsets: Tuple[int, ...],
    y_offsets: Tuple[int, ...],
    del_penalty: jax.Array,  # (P,) float32
    x_in_size: jax.Array,  # (P,) int32
    y_in_size: jax.Array,  # (P,) int32
):
    """P-pair banded DP in one kernel launch. Returns
    (csum (P, A+2, B), xp (P, A+2, B), yp (P, A+2, B))."""
    P, T, A, B = costs.shape
    a2 = A + 2
    inf = float("inf")  # python constant: not captured as a traced value

    xo = np.concatenate([np.asarray(x_offsets, np.int32), [0, 1]])
    yo = np.concatenate([np.asarray(y_offsets, np.int32), [1, 0]])
    span = xo + yo
    K = int(span.max())
    n_types = len(xo)

    assert _supported(B, K, a2, T), (B, K, a2, T)
    W = _lanes_tot(B, K)

    CHUNK = _chunk_rows(T, W)
    n_chunks = -(-a2 // CHUNK)
    rows_pad = n_chunks * CHUNK

    # pre-pad: lane-align the costs and add the two front buffer rows so
    # cost row aa corresponds to input anti-diagonal aa - 2
    costs_pad = jnp.full((P, T, rows_pad, W), inf)
    costs_pad = costs_pad.at[:, :, 2:a2, :B].set(costs)

    scal = jnp.stack(
        [x_in_size.astype(jnp.int32), y_in_size.astype(jnp.int32)], axis=1
    )  # (P, 2)
    boff_pad = jnp.pad(
        b_offset_out.astype(jnp.int32), ((0, 0), (0, rows_pad - a2))
    )  # (P, rows_pad)
    pens = del_penalty.astype(jnp.float32)  # (P,)

    def kernel(boff_ref, scal_ref, pen_ref, costs_ref, csum_ref, xp_ref, yp_ref, ring):
        p = pl.program_id(0)
        chunk_id = pl.program_id(1)
        x_in = scal_ref[p, 0]
        y_in = scal_ref[p, 1]
        x_out = x_in + 1
        y_out = y_in + 1
        pen = pen_ref[p]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        in_band = lane < B

        def step(row, _):
            aa = chunk_id * CHUNK + row  # global anti-diagonal
            boff_a = boff_ref[p, aa]
            yy = boff_a + lane  # (1, W)
            xx = aa - yy

            best = jnp.full((1, W), inf)
            bxp = jnp.full((1, W), NEG_BP, jnp.int32)
            byp = jnp.full((1, W), NEG_BP, jnp.int32)

            for t in range(n_types):
                xo_t = int(xo[t])
                yo_t = int(yo[t])
                s_t = xo_t + yo_t
                prev_ok = aa >= s_t
                prev_slot = jax.lax.rem(
                    jnp.maximum(aa - s_t, 0), jnp.int32(K)
                )
                boff_prev = boff_ref[p, jnp.maximum(aa - s_t, 0)]
                shift = boff_a - yo_t - boff_prev

                prev_row = ring[pl.ds(prev_slot, 1), :]  # (1, W)
                prev_vals = pltpu.roll(prev_row, -shift, axis=1)

                if xo_t == 0 or yo_t == 0:
                    cost_t = jnp.full((1, W), pen)
                else:
                    cost_t = costs_ref[t, pl.ds(row, 1), :]  # chunk-local row

                xx_in_c = xx - 1
                yy_in_c = yy - 1
                xx_prev = xx - xo_t
                yy_prev = yy - yo_t
                valid = (
                    in_band
                    & prev_ok
                    & (xx_in_c >= 0)
                    & (xx_in_c < x_in)
                    & (yy_in_c >= 0)
                    & (yy_in_c < y_in)
                    & (xx_prev >= 0)
                    & (xx_prev < x_out)
                    & (yy_prev >= 0)
                    & (yy_prev < y_out)
                )
                cand = jnp.where(valid, prev_vals + cost_t, inf)
                upd = cand < best  # strict: first minimum wins
                best = jnp.where(upd, cand, best)
                bxp = jnp.where(upd, xo_t, bxp)
                byp = jnp.where(upd, yo_t, byp)

            # unreachable cells keep inf / NEG_BP
            reachable = best < inf
            bxp = jnp.where(reachable, bxp, NEG_BP)
            byp = jnp.where(reachable, byp, NEG_BP)

            # edge-case overrides (all-insertion column / all-deletion row)
            edge_y = (xx == 0) & (yy >= 0) & (yy < y_out) & in_band
            edge_x = (~edge_y) & (yy == 0) & (xx >= 0) & (xx < x_out) & in_band
            best = jnp.where(edge_y, pen * yy.astype(jnp.float32), best)
            bxp = jnp.where(edge_y, 0, bxp)
            byp = jnp.where(edge_y, 1, byp)
            best = jnp.where(edge_x, pen * xx.astype(jnp.float32), best)
            bxp = jnp.where(edge_x, 1, bxp)
            byp = jnp.where(edge_x, 0, byp)

            best = jnp.where(in_band, best, inf)

            ring[pl.ds(jax.lax.rem(aa, jnp.int32(K)), 1), :] = best
            csum_ref[pl.ds(row, 1), :] = best
            xp_ref[pl.ds(row, 1), :] = bxp
            yp_ref[pl.ds(row, 1), :] = byp
            return ()

        # last chunk may extend past a2; extra rows are masked garbage that
        # the host-side slice drops, but keep the ring clean by stopping
        n_rows = jnp.minimum(jnp.int32(CHUNK), a2 - chunk_id * CHUNK)
        jax.lax.fori_loop(0, n_rows, step, ())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # b_offset_out, sizes, penalties
        grid=(P, n_chunks),  # chunks minor: sequential per pair
        in_specs=[
            pl.BlockSpec(
                (1, T, CHUNK, W),
                lambda p, i, *_: (p, 0, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec((1, CHUNK, W), lambda p, i, *_: (p, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, W), lambda p, i, *_: (p, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, W), lambda p, i, *_: (p, i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((K, W), jnp.float32)],
    )

    def kernel4(boff_ref, scal_ref, pen_ref, costs_ref, csum_ref, xp_ref, yp_ref, ring):
        # adapt refs: costs block is (1, T, CHUNK, W), outputs (1, CHUNK, W)
        kernel(
            boff_ref, scal_ref, pen_ref,
            costs_ref.at[0], csum_ref.at[0], xp_ref.at[0], yp_ref.at[0], ring,
        )

    csum, xp, yp = pl.pallas_call(
        kernel4,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((P, rows_pad, W), jnp.float32),
            jax.ShapeDtypeStruct((P, rows_pad, W), jnp.int32),
            jax.ShapeDtypeStruct((P, rows_pad, W), jnp.int32),
        ),
    )(
        boff_pad,
        scal,
        pens,
        costs_pad,
    )
    return csum[:, :a2, :B], xp[:, :a2, :B], yp[:, :a2, :B]


@partial(jax.jit, static_argnames=("x_offsets", "y_offsets"))
def banded_dp_pallas(
    costs: jax.Array,  # (T, A, B) float32
    b_offset_in: jax.Array,  # (A,) int32
    b_offset_out: jax.Array,  # (A+2,) int32
    x_offsets: Tuple[int, ...],
    y_offsets: Tuple[int, ...],
    del_penalty: jax.Array,
    x_in_size: jax.Array,
    y_in_size: jax.Array,
):
    csum, xp, yp = banded_dp_pallas_batched(
        costs[None],
        b_offset_in[None],
        b_offset_out[None],
        x_offsets,
        y_offsets,
        del_penalty.reshape(1),
        x_in_size.reshape(1),
        y_in_size.reshape(1),
    )
    return csum[0], xp[0], yp[0]


def run_banded_dp_pallas(
    costs,
    b_offset_in: np.ndarray,
    alignment_types,
    del_penalty: float,
    x_in_size: int,
    y_in_size: int,
    device_planes: bool = False,
):
    """Wrapper matching ops.dp.run_banded_dp's signature/outputs (incl.
    ``device_planes=True`` returning csum/xp/yp AND the device copy of the
    node-space offsets for the walk — no re-upload)."""
    x_offsets = tuple(x for x, _ in alignment_types)
    y_offsets = tuple(y for _, y in alignment_types)
    b_off_out = extend_band_offsets(np.asarray(b_offset_in))
    d_boff_out = jnp.asarray(b_off_out)
    csum, xp, yp = banded_dp_pallas(
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
    csum_h, xp_h, yp_h = jax.device_get((csum, xp, yp))
    return csum_h.astype(np.float64), xp_h, yp_h, b_off_out


def pallas_supported(costs_shape, alignment_types) -> bool:
    T, A, B = costs_shape
    xo = [x for x, _ in alignment_types] + [0, 1]
    yo = [y for _, y in alignment_types] + [1, 0]
    K = max(x + y for x, y in zip(xo, yo))
    return _supported(B, K, A + 2, T)
