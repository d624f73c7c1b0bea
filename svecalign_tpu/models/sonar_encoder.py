"""SONAR-style speech encoder in JAX/flax (the alternative embedder).

The reference's second embedding backend is SONAR's
``SpeechToEmbeddingModelPipeline`` (fairseq2 w2v-BERT conformer + attention
pooling; reference svecalign/utils/embed_model_utils.py:80-99), emitting a
single 1024-dim vector per segment stored as headerless raw fp16/fp32.

This implements the same architecture family natively: 80-mel log-fbank
frontend (ops/fbank.py, shared with the untranslated-detection stages) ->
conv subsampling -> conformer blocks (FFN half-step / MHSA / conv module /
FFN half-step) -> learned-query attention pooling -> 1024-dim embedding.
Weights load from .npz; random init otherwise.
"""

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from svecalign_tpu.utils.jax_setup import setup_jax

setup_jax()
from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class SonarEncoderConfig:
    n_mels: int = 80
    model_dim: int = 1024
    n_layers: int = 8
    n_heads: int = 16
    ffn_dim: int = 4096
    conv_kernel: int = 31
    pool_dim: int = 1024
    dtype: str = "bfloat16"


class ConformerBlock(nn.Module):
    config: SonarEncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        # FFN half-step
        y = nn.LayerNorm(dtype=jnp.float32, name="ffn1_norm")(x)
        y = nn.Dense(cfg.ffn_dim, dtype=dtype, name="ffn1_in")(y)
        y = nn.silu(y)
        y = nn.Dense(cfg.model_dim, dtype=dtype, name="ffn1_out")(y)
        x = x + 0.5 * y

        # MHSA
        y = nn.LayerNorm(dtype=jnp.float32, name="attn_norm")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads, dtype=dtype, deterministic=True, name="attn"
        )(y, y, mask=mask[:, None, None, :])
        x = x + y

        # conv module
        y = nn.LayerNorm(dtype=jnp.float32, name="conv_norm")(x)
        y = nn.Dense(2 * cfg.model_dim, dtype=dtype, name="conv_pointwise_in")(y)
        y = nn.glu(y, axis=-1)
        y = y * mask[:, :, None]  # zero padding before depthwise conv
        y = nn.Conv(
            features=cfg.model_dim,
            kernel_size=(cfg.conv_kernel,),
            feature_group_count=cfg.model_dim,
            padding="SAME",
            dtype=dtype,
            name="conv_depthwise",
        )(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="conv_bn")(y)  # LN in lieu of BN
        y = nn.silu(y)
        y = nn.Dense(cfg.model_dim, dtype=dtype, name="conv_pointwise_out")(y)
        x = x + y

        # FFN half-step
        y = nn.LayerNorm(dtype=jnp.float32, name="ffn2_norm")(x)
        y = nn.Dense(cfg.ffn_dim, dtype=dtype, name="ffn2_in")(y)
        y = nn.silu(y)
        y = nn.Dense(cfg.model_dim, dtype=dtype, name="ffn2_out")(y)
        x = x + 0.5 * y

        return nn.LayerNorm(dtype=jnp.float32, name="final_norm")(x)


class SonarSpeechEncoder(nn.Module):
    config: SonarEncoderConfig = SonarEncoderConfig()

    @nn.compact
    def __call__(self, feats: jax.Array, n_frames: jax.Array) -> jax.Array:
        """feats: (B, T, n_mels) log-fbank; n_frames: (B,) valid frames.
        Returns (B, pool_dim) float32."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        # 4x conv subsampling
        x = feats[:, :, :, None]
        x = nn.Conv(64, kernel_size=(3, 3), strides=(2, 2), dtype=dtype, name="sub1")(x)
        x = nn.gelu(x)
        x = nn.Conv(64, kernel_size=(3, 3), strides=(2, 2), dtype=dtype, name="sub2")(x)
        x = nn.gelu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.Dense(cfg.model_dim, dtype=dtype, name="input_proj")(x)

        frames = (n_frames + 1) // 2
        frames = (frames + 1) // 2
        mask = jnp.arange(t)[None, :] < jnp.maximum(frames, 1)[:, None]

        for i in range(cfg.n_layers):
            x = ConformerBlock(cfg, name=f"block_{i}")(x, mask)

        # learned-query attention pooling
        query = self.param(
            "pool_query", nn.initializers.normal(0.02), (1, 1, cfg.model_dim)
        )
        q = jnp.broadcast_to(query, (b, 1, cfg.model_dim)).astype(dtype)
        pooled = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads, dtype=dtype, deterministic=True, name="pool_attn"
        )(q, x, mask=mask[:, None, None, :])
        out = nn.Dense(cfg.pool_dim, dtype=jnp.float32, name="pool_proj")(pooled[:, 0])
        return out.astype(jnp.float32)


class SonarSpeechModel:
    """Host wrapper: fbank frontend + bucketed batched conformer forward."""

    BUCKET_FRAMES = (200, 500, 1000, 2000, 3000)  # 10 ms frames

    def __init__(
        self,
        config: SonarEncoderConfig = SonarEncoderConfig(),
        ckpt_path: Optional[str] = None,
        batch_size: int = 16,
        seed: int = 0,
        upload_dtype: str = "int16",
    ):
        self.config = config
        self.model = SonarSpeechEncoder(config)
        self.batch_size = batch_size
        self.upload_dtype = upload_dtype  # int16 (half bytes) | fp32 (exact)

        from svecalign_tpu.models.param_utils import load_params_npz, numpy_init

        if ckpt_path:
            self.params = load_params_npz(ckpt_path)
            logger.info(f"Loaded SONAR-style params from {ckpt_path}")
        else:
            dummy = jnp.zeros((1, self.BUCKET_FRAMES[0], config.n_mels))
            self.params = numpy_init(
                self.model, (dummy, jnp.zeros((1,), jnp.int32)), seed
            )
            logger.warning(
                "SONAR-style encoder initialized with RANDOM weights; "
                "embeddings are not meaningful for mining."
            )
        self.params = jax.device_put(self.params)

        # fused frontend: int16 waveforms upload (half of fp32 feature
        # bytes, quarter of fp32 waveform bytes) and the kaldi fbank runs
        # INSIDE the forward — no per-waveform feature roundtrip through
        # the ~45 MB/s tunnel (reference runs torchaudio fbank on host)
        from functools import partial as _partial

        from svecalign_tpu.ops.fbank import fbank_device

        @_partial(jax.jit, static_argnames=("n_frames",))
        def _apply_wav(params, wav_i16, scales, lengths, n_frames):
            wav = wav_i16.astype(jnp.float32) * scales[:, None]
            feats = jax.vmap(
                lambda w: fbank_device(
                    w, 16000, self.config.n_mels, 400, 160, n_frames
                )
            )(wav)
            return self.model.apply(params, feats, lengths)

        self._forward = _apply_wav

    def _bucket(self, n: int) -> int:
        for b in self.BUCKET_FRAMES:
            if n <= b:
                return b
        return self.BUCKET_FRAMES[-1]

    def encode(self, waveforms) -> np.ndarray:
        out = np.zeros((len(waveforms), self.config.pool_dim), dtype=np.float32)

        # fixed (batch_size, samples(bucket)) shapes: one program per bucket
        by_bucket: dict = {}
        for i, w in enumerate(waveforms):
            w = np.asarray(w, dtype=np.float32)
            if w.ndim == 2:
                w = w[0]
            n_frames = 0 if len(w) < 400 else 1 + (len(w) - 400) // 160
            by_bucket.setdefault(self._bucket(n_frames), []).append((i, w, n_frames))

        for bucket, items in sorted(by_bucket.items()):
            samples = 400 + (bucket - 1) * 160
            for chunk_start in range(0, len(items), self.batch_size):
                chunk = items[chunk_start : chunk_start + self.batch_size]
                fp32 = self.upload_dtype == "fp32"
                padded = np.zeros(
                    (self.batch_size, samples),
                    dtype=np.float32 if fp32 else np.int16,
                )
                scales = np.ones((self.batch_size,), dtype=np.float32)
                lengths = np.zeros((self.batch_size,), dtype=np.int32)
                for row, (_, w, n_frames) in enumerate(chunk):
                    w = w[:samples]
                    if fp32:
                        padded[row, : len(w)] = w
                    else:
                        peak = float(np.max(np.abs(w))) if len(w) else 0.0
                        s = peak / 32767.0 if peak > 0 else 1.0
                        padded[row, : len(w)] = np.rint(w / s).astype(np.int16)
                        scales[row] = s
                    lengths[row] = min(n_frames, bucket)
                emb = self._forward(
                    self.params, jnp.asarray(padded), jnp.asarray(scales),
                    jnp.asarray(lengths), bucket,
                )
                emb = np.asarray(emb, dtype=np.float32)
                for row, (i, *_ ) in enumerate(chunk):
                    out[i] = emb[row]
        return out
