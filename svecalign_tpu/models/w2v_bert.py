"""Faithful w2v-BERT 2.0 conformer encoder in JAX/flax.

This is the architecture of SONAR's speech encoders (w2v-BERT 2.0 /
SeamlessM4T-v2 speech frontend; reference consumes it through
``SpeechToEmbeddingModelPipeline``, svecalign/utils/embed_model_utils.py:
80-99). The module graph matches ``transformers.Wav2Vec2BertModel``
operation-for-operation so converted checkpoints load and reproduce HF
outputs numerically (tests/test_hf_equivalence.py::test_w2v_bert_*):

  feature_projection (LN + Linear on stacked 160-dim mels)
  -> N conformer layers, each:
       ffn1 (LN -> Linear -> swish -> Linear), half-step residual
       self-attention (LN -> MHSA with relative-position terms)
       conv module (LN -> pointwise 2H + GLU -> CAUSAL depthwise conv k=31
                    -> LN -> swish -> pointwise), residual
       ffn2 half-step residual, final LN

Both w2v-BERT position-embedding flavors are implemented:
- "relative_key": learned distance embeddings, clamp(j-i, -64, +8), the
  SeamlessM4T-v2 / SONAR default;
- "relative": Transformer-XL style sinusoidal + pos_bias_u/v and the
  shift trick (SeamlessM4T-v1 / older conformer checkpoints).

TPU notes: everything is static-shape and jit-friendly; ``dtype`` selects
the compute precision (bf16 for mining throughput, fp32 for parity tests);
params stay fp32. The causal depthwise conv and the LayerNorms follow the
HF eval-mode semantics exactly (dropout is inference-time identity).

NEGATIVE RESULTS (measured on v5e at B=8, T=1000 — don't retry blindly):
the relative_key term costs over half the trunk forward (ablation
tools/ablate_sonar.py: 203 ms with vs 94.6 ms without), and three exact
TPU-oriented relayouts of it all failed to beat the HF einsum below:
  1. q @ table^T then per-score take_along_axis gather: 3.4x SLOWER
     (697 ms extra over pos=none) — TPU per-element gathers on a
     (B,H,T,T) output scatter across lanes.
  2. Transformer-XL-style skew (pad+flatten+re-chunk reshape): 3.9x
     SLOWER — the flatten crosses the (8,128) tile layout and lowers to a
     full shuffle.
  3. Block-diagonal one-hot MXU matmuls (only the 3 near-diagonal block
     classes carry non-clipped values) + contiguous concat assembly:
     EQUAL (25.85% vs 25.86% MFU) — at T=1000 the cost is dominated by
     materializing any extra (B,H,T,T) tensor, not by the HF form's
     batched small GEMMs; with a .at[].add scatter assembly instead it
     was again slower (22.9%).
The fused score kernel those results pointed to now exists
(ops/attention_pallas.py): flash-structured, bias rebuilt in-kernel from
a 73-wide projection (no gather), (B, T, D)-native blocks (a transposed-
layout version made XLA materialize relayout copies around the custom
call and LOST), 2 heads packed per 128-lane group, and a rank-1 fast
path for the ~2/3 of score tiles that sit entirely outside the clip
band. Final interleaved same-window measurement on v5e (24-layer trunk,
8x20 s bucket, bf16): **192.9 ms vs 211.2 ms XLA — a 1.10x trunk win**
(an early standalone 3.9x was a tunnel-window artifact; the masked lane
rolls that expand the bias are the kernel's VPU floor).
``attention_backend="auto"`` uses it on TPU (head_dim 64, even head
count); "xla" keeps the HF layout (the parity/equivalence path, and the
only path on CPU).
"""

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class W2vBertConfig:
    feature_projection_input_dim: int = 160
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_depthwise_kernel_size: int = 31
    layer_norm_eps: float = 1e-5
    position_embeddings_type: str = "relative_key"  # relative_key|relative|none
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    dtype: str = "float32"
    # relative_key attention kernel: "auto" = the fused Pallas flash kernel
    # on TPU (ops/attention_pallas.py — measured 3.9x the XLA layout at
    # mining shapes), the HF-layout XLA einsum elsewhere; "xla" forces the
    # reference layout (parity tests), "pallas" forces the kernel.
    # RESTRICTION ("auto"/"pallas"): the fused kernel rebuilds key masking
    # from lengths = sum(pad_mask), which is only equivalent to attn_bias
    # for CONTIGUOUS padding (pad_mask == arange < lengths). Every current
    # caller satisfies this (the SONAR frontend builds exactly that mask,
    # sonar_encoder.py:152); a non-contiguous mask requires "xla".
    attention_backend: str = "auto"

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _sinusoidal_rel_pe(seq_len: int, d_model: int) -> np.ndarray:
    """Transformer-XL relative positional table, length 2*T-1, laid out
    [pos T-1 .. 1, 0, -1 .. -(T-1)] exactly like HF's
    Wav2Vec2BertRelPositionalEmbedding (positive part flipped, negative
    part from index 1)."""
    position = np.arange(seq_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model)
    )
    pe_pos = np.zeros((seq_len, d_model), np.float32)
    pe_neg = np.zeros((seq_len, d_model), np.float32)
    pe_pos[:, 0::2] = np.sin(position * div_term)
    pe_pos[:, 1::2] = np.cos(position * div_term)
    pe_neg[:, 0::2] = np.sin(-position * div_term)
    pe_neg[:, 1::2] = np.cos(-position * div_term)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)  # (2T-1, d)


class _FeedForward(nn.Module):
    config: W2vBertConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = nn.Dense(cfg.intermediate_size, dtype=dtype,
                     name="intermediate_dense")(x)
        x = nn.silu(x)  # hidden_act = swish
        return nn.Dense(cfg.hidden_size, dtype=dtype, name="output_dense")(x)


class _SelfAttention(nn.Module):
    config: W2vBertConfig

    def _use_fused_kernel(self) -> bool:
        backend = self.config.attention_backend
        if backend == "pallas":
            return True
        if backend == "auto":
            import jax

            return jax.default_backend() in ("tpu", "axon")
        return False

    @nn.compact
    def __call__(self, x, attn_bias, rel_pe, lengths=None):
        """x: (B, T, H); attn_bias: (B, 1, T, T) additive or None;
        rel_pe: (2T-1, H) sinusoidal table for the 'relative' flavor;
        lengths: (B,) valid-frame counts (the contiguous-padding form of
        attn_bias, consumed by the fused kernel path)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        b, t, _ = x.shape
        nh, dh = cfg.num_attention_heads, cfg.head_size

        q = nn.Dense(cfg.hidden_size, dtype=dtype, name="linear_q")(x)
        k = nn.Dense(cfg.hidden_size, dtype=dtype, name="linear_k")(x)
        v = nn.Dense(cfg.hidden_size, dtype=dtype, name="linear_v")(x)
        if (cfg.position_embeddings_type == "relative_key"
                and dh == 64 and nh % 2 == 0  # kernel packs 2 heads/lane group
                and self._use_fused_kernel()):
            # fused flash path: scores + rel bias + mask + softmax + value
            # contraction never touch HBM; the bias is rebuilt in-kernel
            # from the 73-wide projection. The kernel consumes the dense
            # outputs' NATIVE (B, T, H, dh) layout — no transposes, so XLA
            # inserts no physical relayout copies around the custom call.
            from svecalign_tpu.ops.attention_pallas import relkey_flash_attention

            n_pos = (cfg.left_max_position_embeddings
                     + cfg.right_max_position_embeddings + 1)
            table = self.param(
                "distance_embedding", nn.initializers.normal(0.02),
                (n_pos, dh),
            )
            out = relkey_flash_attention(
                q.reshape(b, t, nh, dh),
                k.reshape(b, t, nh, dh),
                v.reshape(b, t, nh, dh),
                table.astype(dtype), lengths,
                left=cfg.left_max_position_embeddings,
                right=cfg.right_max_position_embeddings,
            ).reshape(b, t, nh * dh)
            return nn.Dense(cfg.hidden_size, dtype=dtype, name="linear_out")(out)
        q = q.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)  # (B, H, T, dh)
        k = k.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)

        if cfg.position_embeddings_type == "relative":
            # Transformer-XL: (q+u)k^T + shifted (q+v)pe^T, /sqrt(dh)
            pos_bias_u = self.param("pos_bias_u", nn.initializers.zeros, (nh, dh))
            pos_bias_v = self.param("pos_bias_v", nn.initializers.zeros, (nh, dh))
            pe = nn.Dense(cfg.hidden_size, use_bias=False, dtype=dtype,
                          name="linear_pos")(rel_pe.astype(dtype))
            pe = pe.reshape(-1, nh, dh).transpose(1, 0, 2)  # (H, 2T-1, dh)

            q_u = q + pos_bias_u[None, :, None, :].astype(dtype)
            q_v = q + pos_bias_v[None, :, None, :].astype(dtype)
            scores_ac = jnp.einsum("bhld,bhrd->bhlr", q_u, k)
            scores_bd = jnp.einsum("bhld,hrd->bhlr", q_v, pe)  # (B,H,T,2T-1)
            # shift trick (HF _apply_relative_embeddings step 5)
            r = scores_bd.shape[-1]
            bd = jnp.pad(scores_bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
            bd = bd.reshape(b, nh, r + 1, t)[:, :, 1:].reshape(b, nh, t, r)
            scores_bd = bd[..., : r // 2 + 1]
            scores = (scores_ac + scores_bd) / math.sqrt(dh)
        else:
            if cfg.position_embeddings_type == "relative_key":
                n_pos = (cfg.left_max_position_embeddings
                         + cfg.right_max_position_embeddings + 1)
                table = self.param(
                    "distance_embedding", nn.initializers.normal(0.02),
                    (n_pos, dh),
                )
                scores = jnp.einsum("bhld,bhrd->bhlr", q, k) / math.sqrt(dh)
                pos = jnp.arange(t)
                distance = jnp.clip(
                    pos[None, :] - pos[:, None],
                    -cfg.left_max_position_embeddings,
                    cfg.right_max_position_embeddings,
                )
                rel = jnp.take(
                    table, distance + cfg.left_max_position_embeddings, axis=0
                ).astype(dtype)  # (T, T, dh)
                scores = scores + jnp.einsum("bhld,lrd->bhlr", q, rel) / math.sqrt(dh)
            else:
                scores = jnp.einsum("bhld,bhrd->bhlr", q, k) / math.sqrt(dh)

        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
        out = jnp.einsum("bhlr,bhrd->bhld", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, nh * dh)
        return nn.Dense(cfg.hidden_size, dtype=dtype, name="linear_out")(out)


class _ConvModule(nn.Module):
    config: W2vBertConfig

    @nn.compact
    def __call__(self, x, pad_mask):
        """pad_mask: (B, T) bool, True = valid. The depthwise conv is
        CAUSAL (left pad k-1), matching Wav2Vec2BertConvolutionModule."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        h = cfg.hidden_size
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm")(x).astype(dtype)
        if pad_mask is not None:
            x = jnp.where(pad_mask[:, :, None], x, 0.0)
        x = nn.Dense(2 * h, use_bias=False, dtype=dtype, name="pointwise_conv1")(x)
        x = x[..., :h] * jax.nn.sigmoid(x[..., h:])  # GLU over channels
        x = nn.Conv(
            features=h,
            kernel_size=(cfg.conv_depthwise_kernel_size,),
            feature_group_count=h,
            padding=[(cfg.conv_depthwise_kernel_size - 1, 0)],  # causal
            use_bias=False,
            dtype=dtype,
            name="depthwise_conv",
        )(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="depthwise_layer_norm")(x).astype(dtype)
        x = nn.silu(x)
        return nn.Dense(h, use_bias=False, dtype=dtype, name="pointwise_conv2")(x)


class W2vBertEncoderLayer(nn.Module):
    config: W2vBertConfig

    @nn.compact
    def __call__(self, x, attn_bias, pad_mask, rel_pe, lengths=None):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ffn1_layer_norm")(x).astype(dtype)
        x = x + 0.5 * _FeedForward(cfg, name="ffn1")(y)

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="self_attn_layer_norm")(x).astype(dtype)
        x = x + _SelfAttention(cfg, name="self_attn")(y, attn_bias, rel_pe, lengths)

        x = x + _ConvModule(cfg, name="conv_module")(x, pad_mask)

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ffn2_layer_norm")(x).astype(dtype)
        x = x + 0.5 * _FeedForward(cfg, name="ffn2")(y)

        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="final_layer_norm")(x).astype(dtype)


class W2vBertModel(nn.Module):
    """feature_projection + conformer encoder == Wav2Vec2BertModel with
    add_adapter=False (SONAR's speech trunk has no adapter)."""

    config: W2vBertConfig = W2vBertConfig()

    @nn.compact
    def __call__(self, feats: jax.Array, pad_mask=None) -> jax.Array:
        """feats: (B, T, feature_projection_input_dim) stacked log-mels;
        pad_mask: (B, T) bool, True = valid frame. Returns (B, T, H)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="fp_layer_norm")(feats.astype(jnp.float32))
        x = nn.Dense(cfg.hidden_size, dtype=dtype, name="fp_projection")(
            x.astype(dtype)
        )

        attn_bias = None
        lengths = None
        if pad_mask is not None:
            x = jnp.where(pad_mask[:, :, None], x, 0.0)
            neg = jnp.finfo(jnp.float32).min
            attn_bias = jnp.where(pad_mask[:, None, None, :], 0.0, neg)
            # contiguous-padding form for the fused kernel (the frontend
            # builds pad_mask as arange < lengths, sonar_encoder.py:152)
            lengths = jnp.sum(pad_mask.astype(jnp.int32), axis=1)

        rel_pe = None
        if cfg.position_embeddings_type == "relative":
            rel_pe = jnp.asarray(_sinusoidal_rel_pe(x.shape[1], cfg.hidden_size))

        for i in range(cfg.num_hidden_layers):
            x = W2vBertEncoderLayer(cfg, name=f"layers_{i}")(
                x, attn_bias, pad_mask, rel_pe, lengths
            )
        return x
