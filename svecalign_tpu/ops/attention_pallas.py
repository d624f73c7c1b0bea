"""Fused rel-key flash attention (Pallas TPU) for the w2v-BERT trunk.

The SONAR conformer's relative_key position term costs half the trunk
forward on the XLA path (BASELINE.md: 25.9% MFU vs 62.8% for the LASER
encoder; ablation tools/ablate_sonar.py). Three exact XLA relayouts all
failed to beat the HF einsum (models/w2v_bert.py docstring) because every
variant still materializes an extra (B, H, T, T) tensor in HBM — the cost
is bandwidth, not FLOPs. This kernel removes the HBM traffic entirely:
scores, the rel-key bias, softmax and the value contraction all live in
VMEM (flash-attention structure), and the bias is reconstructed IN-KERNEL
from a tiny (BL, 73) per-tile projection.

The reconstruction exploits the clipped-distance structure
(clamp(r - l, -64, +8), reference: HF Wav2Vec2BertSelfAttention): with
``p[l, c] = q[l] . table[c] / sqrt(dh)`` (73-wide — T/73x fewer FLOPs than
the HF einsum), the bias tile is

    bias[jl, jr] = p[jl, clip(delta + jr - jl, -64, 8) + 64]

which we build without any gather:
  1. G[c, m] = (clip(delta + m - (BL-1)) + 64 == c) from broadcasted_iota
     compares — the clip means far-from-diagonal tiles automatically
     collapse G to a constant row (the edge columns of p);
  2. H = p_tile @ G on the MXU — a column-uniform index never needs a
     per-row gather;
  3. the per-row shift H[jl, m] -> H[jl, jr - jl + BL-1] is a variable
     rotate, decomposed into log2(BL) masked lane-rolls (pltpu.roll).

Numerics: scores/softmax accumulate in fp32 (the unnormalized-accumulator
flash recurrence); with fp32 inputs the result matches the XLA reference
to ~1e-6, with bf16 compute to bf16 rounding.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BL = 128  # query rows per tile
BR = 128  # key columns per tile
C_PAD = 128  # rel-table entries (left + right + 1 = 73) padded to lanes
NEG = -0.7 * float(np.finfo(np.float32).max)


def _kernel(len_ref, q_ref, k_ref, v_ref, p_ref, o_ref, acc, m_ref, l_ref,
            *, n_heads, scale, left, right):
    bh = pl.program_id(0)
    li = pl.program_id(1)
    ri = pl.program_id(2)
    n_r = pl.num_programs(2)
    dh = q_ref.shape[-1]
    w2 = BL + BR

    @pl.when(ri == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BL, dh)
    k = k_ref[0]  # (BR, dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BL, BR)

    # --- rel-key bias, reconstructed in VMEM ---
    delta = ri * BR - li * BL
    m_ids = jax.lax.broadcasted_iota(jnp.int32, (C_PAD, w2), 1)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (C_PAD, w2), 0)
    c_of_m = jnp.clip(delta + m_ids - (BL - 1), -left, right) + left
    g = (c_of_m == c_ids).astype(q.dtype)  # (C_PAD, w2)
    h = jax.lax.dot_general(
        p_ref[0], g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BL, w2); h[jl, m] = p[jl, c(m)]
    # want bias[jl, jr] = h[jl, jr - jl + BL - 1]: rotate left by BL-1,
    # then rotate row jl right by jl (log-decomposed masked rolls)
    h = pltpu.roll(h, w2 - (BL - 1), axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BL, w2), 0)
    shift = 1
    while shift < BL:
        h = jnp.where((rows & shift) != 0, pltpu.roll(h, shift, axis=1), h)
        shift *= 2
    s = s + h[:, :BR]

    # --- key-side padding mask ---
    length = len_ref[bh // n_heads]
    cols = ri * BR + jax.lax.broadcasted_iota(jnp.int32, (BL, BR), 1)
    s = jnp.where(cols < length, s, NEG)

    # --- streaming softmax (stats lane-broadcast across 128) ---
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # (BL, 128), lanes equal
    p_ij = jnp.exp(s - m_new[:, :1])  # (BL, BR)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p_ij, axis=1, keepdims=True)
    acc[:] = acc[:] * alpha[:, :dh] + jax.lax.dot_general(
        p_ij.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(ri == n_r - 1)
    def _finish():
        o_ref[0] = (acc[:] / l_ref[:, :dh]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("left", "right", "interpret")
)
def relkey_flash_attention(
    q, k, v, table, lengths=None, left: int = 64, right: int = 8,
    interpret: bool = False,
):
    """softmax(q k^T/sqrt(dh) + rel_key_bias + key_pad_mask) v, fused.

    q/k/v: (B, H, T, dh); table: (left+right+1, dh) distance embeddings;
    lengths: (B,) int32 valid key counts (None = all T valid). Matches
    models/w2v_bert._SelfAttention's relative_key branch. Rows at/after
    ``lengths`` hold unspecified (finite) values, exactly like the XLA
    path — downstream masking owns them.
    """
    b, n_heads, t, dh = q.shape
    c = table.shape[0]
    assert c == left + right + 1 <= C_PAD, (c, left, right)
    scale = 1.0 / math.sqrt(dh)

    # tiny projection: (B, H, T, 73) — T/73x fewer FLOPs than the bias
    # einsum, and the only extra HBM the fused path touches
    p = jnp.einsum(
        "bhld,cd->bhlc", q, table.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.pad(p.astype(q.dtype), ((0, 0), (0, 0), (0, 0), (0, C_PAD - c)))

    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    t_pad = -(-t // BL) * BL
    if t_pad != t:
        padT = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        q, k, v, p = (jnp.pad(a, padT) for a in (q, k, v, p))

    qf = q.reshape(b * n_heads, t_pad, dh)
    kf = k.reshape(b * n_heads, t_pad, dh)
    vf = v.reshape(b * n_heads, t_pad, dh)
    pf = p.reshape(b * n_heads, t_pad, C_PAD)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * n_heads, t_pad // BL, t_pad // BR),  # r minor: sequential
        in_specs=[
            pl.BlockSpec((1, BL, dh), lambda bh, l, r, *_: (bh, l, 0)),
            pl.BlockSpec((1, BR, dh), lambda bh, l, r, *_: (bh, r, 0)),
            pl.BlockSpec((1, BR, dh), lambda bh, l, r, *_: (bh, r, 0)),
            pl.BlockSpec((1, BL, C_PAD), lambda bh, l, r, *_: (bh, l, 0)),
        ],
        out_specs=pl.BlockSpec((1, BL, dh), lambda bh, l, r, *_: (bh, l, 0)),
        scratch_shapes=[
            pltpu.VMEM((BL, dh), jnp.float32),   # output accumulator
            pltpu.VMEM((BL, 128), jnp.float32),  # running max
            pltpu.VMEM((BL, 128), jnp.float32),  # running exp-sum
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_heads=n_heads, scale=scale, left=left, right=right
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        interpret=interpret,
    )(jnp.asarray(lengths, jnp.int32), qf, kf, vf, pf)
    return out.reshape(b, n_heads, t_pad, dh)[:, :, :t]


def relkey_attention_reference(q, k, v, table, lengths=None, left=64, right=8):
    """Unfused XLA reference (the HF layout, models/w2v_bert.py:146-168)."""
    b, n_heads, t, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    scores = jnp.einsum("bhld,bhrd->bhlr", q, k) * scale
    pos = jnp.arange(t)
    dist = jnp.clip(pos[None, :] - pos[:, None], -left, right)
    rel = jnp.take(table, dist + left, axis=0).astype(q.dtype)
    scores = scores + jnp.einsum("bhld,lrd->bhlr", q, rel) * scale
    if lengths is not None:
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        scores = jnp.where(mask[:, None, None, :], scores, NEG)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhlr,bhrd->bhld", probs, v)
