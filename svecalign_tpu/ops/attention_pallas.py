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

Outcome (interleaved same-window A/B on v5e, 24-layer trunk, 8x20 s bf16
bucket): 192.9 ms vs 211.2 ms for the XLA layout — a 1.10x trunk-level
win, from +60% slower for the first kernel version. Each step below was
measured to matter; what remains on the VPU (the masked lane rolls and
the softmax exps) keeps the kernel near XLA rather than far ahead.

TPU-specific design points:

1. **No transposes.** The kernel consumes the projection layers' native
   (B, T, D) layout and carves heads with the BlockSpec index map. A
   first version used the (B, H, T, dh) flash convention and was 1.6x
   SLOWER inside the conformer layer — XLA materializes physical
   relayout copies of every operand it feeds a custom call from a
   transpose.
2. **Two heads per 128-lane group.** head_dim 64 fills half a lane tile
   (the reason a plain flash kernel measured 2.5x slower in the wav2vec2
   encoder, models/laser_encoder.py). Each kernel step processes a
   128-lane group = 2 heads: scores come from ONE K=128 matmul against a
   head-masked stacked key block (the cross-head terms are zeroed by
   construction), and the value contraction is ONE K=2*BR, N=128 matmul
   into a both-heads accumulator.
3. **Rank-1 fast path off the band.** The 73-wide clip means ~2/3 of
   score tiles see a constant table edge; they skip the one-hot matmul
   and the masked rolls entirely (the rolls are the VPU hot spot: 7
   masked (256, 256) f32 rotates per band tile).

The bias reconstruction exploits the clipped-distance structure
(clamp(r - l, -64, +8), reference: HF Wav2Vec2BertSelfAttention): with
``p[l, c] = q[l] . table[c] / sqrt(dh)`` (73-wide — T/73x fewer FLOPs than
the HF bias einsum), the bias tile is

    bias[jl, jr] = p[jl, clip(delta + jr - jl, -64, 8) + 64]

built without any gather:
  1. G[c, m] = (clip(delta + m - (BL-1)) + 64 == c) from broadcasted_iota
     compares — the clip means far-from-diagonal tiles automatically
     collapse G to a constant row (the edge columns of p);
  2. H = p_tile @ G on the MXU — a column-uniform index never needs a
     per-row gather;
  3. the per-row shift H[jl, m] -> H[jl, jr - jl + BL-1] is a variable
     rotate, decomposed into log2(BL) masked lane-rolls (pltpu.roll),
     applied to both heads' planes stacked on the sublane axis.

Numerics: scores/softmax accumulate in fp32 (the unnormalized-accumulator
flash recurrence); with fp32 inputs the result matches the XLA reference
to ~1e-6 in interpreter mode, with bf16 compute to bf16 rounding.
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
LANES = 128  # lane group = 2 heads x head_dim 64
NEG = -0.7 * float(np.finfo(np.float32).max)


def _kernel(len_ref, q_ref, k_ref, v_ref, p_ref, o_ref, acc, m_ref, l_ref,
            bias_s, *, dh, scale, left, right):
    b = pl.program_id(0)
    li = pl.program_id(2)
    ri = pl.program_id(3)
    n_r = pl.num_programs(3)
    w2 = BL + BR

    @pl.when(ri == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)

    q2 = q_ref[0]  # (BL, 128): heads (2g, 2g+1) side by side
    k2 = k_ref[0]  # (BR, 128)
    v2 = v_ref[0]  # (BR, 128)

    lane = jax.lax.broadcasted_iota(jnp.int32, (BR, LANES), 1)
    lo = (lane < dh).astype(k2.dtype)
    hi = (lane >= dh).astype(k2.dtype)
    # head-masked stacked keys: q2 @ k_cat^T computes both heads' scores in
    # ONE full-K matmul — the off-head lanes of each k row are zeroed, so
    # the contraction never mixes heads
    k_cat = jnp.concatenate([k2 * lo, k2 * hi], axis=0)  # (2BR, 128)
    s = jax.lax.dot_general(
        q2, k_cat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BL, 2BR): [head0 | head1]

    # --- rel-key bias for both heads, reconstructed in VMEM ---
    # the clip window is only 73 wide, so most score tiles are entirely
    # outside the band: their bias is the edge column of p, a rank-1
    # broadcast. Only tiles intersecting the band pay the one-hot matmul
    # + masked-roll expansion (the rolls are the kernel's VPU hot spot).
    delta = ri * BR - li * BL
    pblk = p_ref[0]  # (BL, 2*C_PAD): [p_head0 | p_head1]
    in_band = (delta <= right + (BL - 1)) & (delta >= -left - (BR - 1))

    @pl.when(in_band)
    def _band_bias():
        m_ids = jax.lax.broadcasted_iota(jnp.int32, (C_PAD, w2), 1)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (C_PAD, w2), 0)
        c_of_m = jnp.clip(delta + m_ids - (BL - 1), -left, right) + left
        g = (c_of_m == c_ids).astype(q2.dtype)  # (C_PAD, w2)
        p_stack = jnp.concatenate([pblk[:, :C_PAD], pblk[:, C_PAD:]], axis=0)
        h = jax.lax.dot_general(
            p_stack, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2BL, w2); h[jl, m] = p[jl, c(m)], heads stacked on sublanes
        # want bias[jl, jr] = h[jl, jr - jl + BL - 1]: rotate left by BL-1,
        # then rotate row jl right by jl (log-decomposed masked rolls —
        # f32: Mosaic's rotate only handles 32-bit lanes; row bits of jl
        # and jl+BL agree below bit 7, so one pass serves both heads)
        h = pltpu.roll(h, w2 - (BL - 1), axis=1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (2 * BL, w2), 0)
        shift = 1
        while shift < BL:
            h = jnp.where((rows & shift) != 0, pltpu.roll(h, shift, axis=1), h)
            shift *= 2
        bias_s[:] = jnp.concatenate([h[:BL, :BR], h[BL:, :BR]], axis=1)

    @pl.when(jnp.logical_not(in_band))
    def _edge_bias():
        # fully clipped tile: every distance hits the same table edge
        # (right edge for tiles right of the band, left edge otherwise)
        hi_edge = delta > 0
        e = left + right
        zeros = jnp.zeros((BL, BR), jnp.float32)
        b0 = jnp.where(
            hi_edge, pblk[:, e : e + 1], pblk[:, 0:1]
        ).astype(jnp.float32) + zeros
        b1 = jnp.where(
            hi_edge, pblk[:, C_PAD + e : C_PAD + e + 1], pblk[:, C_PAD : C_PAD + 1]
        ).astype(jnp.float32) + zeros
        bias_s[:] = jnp.concatenate([b0, b1], axis=1)

    s = s + bias_s[:]

    # --- key-side padding mask (same columns for both heads) ---
    length = len_ref[b]
    cols = ri * BR + jax.lax.broadcasted_iota(jnp.int32, (BL, BR), 1)
    keymask = cols < length
    s = jnp.where(jnp.concatenate([keymask, keymask], axis=1), s, NEG)

    # --- streaming softmax; stats (BL, 256) = [head0 lanes | head1 lanes]
    s0, s1 = s[:, :BR], s[:, BR:]
    zeros = jnp.zeros((BL, LANES), jnp.float32)
    m_tile = jnp.concatenate(
        [jnp.max(s0, axis=1, keepdims=True) + zeros,
         jnp.max(s1, axis=1, keepdims=True) + zeros], axis=1)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, m_tile)
    alpha = jnp.exp(m_prev - m_new)  # (BL, 256), lane-broadcast per head
    p0 = jnp.exp(s0 - m_new[:, 0:1])
    p1 = jnp.exp(s1 - m_new[:, LANES : LANES + 1])
    l_ref[:] = l_ref[:] * alpha + jnp.concatenate(
        [jnp.sum(p0, axis=1, keepdims=True) + zeros,
         jnp.sum(p1, axis=1, keepdims=True) + zeros], axis=1)
    m_ref[:] = m_new

    # one K=2BR, N=128 value contraction into the both-heads accumulator
    p_cat = jnp.concatenate([p0, p1], axis=1).astype(v2.dtype)  # (BL, 2BR)
    v_stack = jnp.concatenate([v2 * lo, v2 * hi], axis=0)  # (2BR, 128)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (BL, LANES), 1)
    alpha_acc = jnp.where(
        out_lane < dh, alpha[:, 0:1], alpha[:, LANES : LANES + 1]
    )
    acc[:] = acc[:] * alpha_acc + jax.lax.dot_general(
        p_cat, v_stack, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ri == n_r - 1)
    def _finish():
        l_acc = jnp.where(
            out_lane < dh, l_ref[:, 0:1], l_ref[:, LANES : LANES + 1]
        )
        o_ref[0] = (acc[:] / l_acc).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("left", "right", "interpret")
)
def relkey_flash_attention(
    q, k, v, table, lengths=None, left: int = 64, right: int = 8,
    interpret: bool = False,
):
    """softmax(q k^T/sqrt(dh) + rel_key_bias + key_pad_mask) v, fused.

    q/k/v: (B, T, H, dh) — the projection layers' native layout (one free
    reshape from the (B, T, D) dense output); requires ``dh == 64`` and an
    even head count (two heads share each 128-lane group). table:
    (left+right+1, dh) distance embeddings; lengths: (B,) int32 valid key
    counts (None = all T valid). Matches models/w2v_bert._SelfAttention's
    relative_key branch; output is (B, T, H, dh). Rows at/after
    ``lengths`` hold unspecified (finite) values, exactly like the XLA
    path — downstream masking owns them.
    """
    b, t, n_heads, dh = q.shape
    c = table.shape[0]
    assert c == left + right + 1 <= C_PAD, (c, left, right)
    assert 2 * dh == LANES and n_heads % 2 == 0, (n_heads, dh)
    scale = 1.0 / math.sqrt(dh)

    # tiny projection: (B, T, H, 73) — T/73x fewer FLOPs than the bias
    # einsum, and the only extra HBM the fused path touches
    p = jnp.einsum(
        "blhd,cd->blhc", q, table.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    p = jnp.pad(p.astype(q.dtype), ((0, 0), (0, 0), (0, 0), (0, C_PAD - c)))

    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    t_pad = -(-t // BL) * BL
    if t_pad != t:
        padT = ((0, 0), (0, t_pad - t), (0, 0), (0, 0))
        q, k, v, p = (jnp.pad(a, padT) for a in (q, k, v, p))

    d = n_heads * dh
    qf = q.reshape(b, t_pad, d)
    kf = k.reshape(b, t_pad, d)
    vf = v.reshape(b, t_pad, d)
    pf = p.reshape(b, t_pad, n_heads * C_PAD)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # one grid row per 128-lane head pair; r minor: sequential
        grid=(b, n_heads // 2, t_pad // BL, t_pad // BR),
        in_specs=[
            pl.BlockSpec((1, BL, LANES), lambda b_, g, l, r, *_: (b_, l, g)),
            pl.BlockSpec((1, BR, LANES), lambda b_, g, l, r, *_: (b_, r, g)),
            pl.BlockSpec((1, BR, LANES), lambda b_, g, l, r, *_: (b_, r, g)),
            pl.BlockSpec((1, BL, 2 * C_PAD), lambda b_, g, l, r, *_: (b_, l, g)),
        ],
        out_specs=pl.BlockSpec(
            (1, BL, LANES), lambda b_, g, l, r, *_: (b_, l, g)
        ),
        scratch_shapes=[
            pltpu.VMEM((BL, LANES), jnp.float32),      # both-heads accumulator
            pltpu.VMEM((BL, 2 * LANES), jnp.float32),  # running max per head
            pltpu.VMEM((BL, 2 * LANES), jnp.float32),  # running exp-sum
            pltpu.VMEM((BL, 2 * BR), jnp.float32),     # bias tile (branch out)
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, dh=dh, scale=scale, left=left, right=right),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        interpret=interpret,
    )(jnp.asarray(lengths, jnp.int32), qf, kf, vf, pf)
    return out.reshape(b, t_pad, n_heads, dh)[:, :t]


def relkey_attention_reference(q, k, v, table, lengths=None, left=64, right=8):
    """Unfused XLA reference (the HF formulation, models/w2v_bert.py).

    Same (B, T, H, dh) in/out layout as the kernel."""
    b, t, n_heads, dh = q.shape
    q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
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
    return jnp.einsum("bhlr,bhrd->bhld", probs, v).transpose(0, 2, 1, 3)
