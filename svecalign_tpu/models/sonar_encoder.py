"""SONAR speech encoder in JAX/flax (the alternative embedder).

The reference's second embedding backend is SONAR's
``SpeechToEmbeddingModelPipeline`` (reference svecalign/utils/
embed_model_utils.py:80-99): a w2v-BERT 2.0 conformer trunk plus an
attention pooler, emitting one 1024-dim vector per segment stored as
headerless raw fp16/fp32 (reference embedding_utils.py:47-54).

Fidelity: the trunk here is :class:`svecalign_tpu.models.w2v_bert.
W2vBertModel`, which matches ``transformers.Wav2Vec2BertModel``
numerically under converted weights (tests/test_hf_equivalence.py::
test_w2v_bert_matches_hf, both relative_key and relative position
flavors) — so a converted real SONAR/w2v-BERT checkpoint
(tools/convert_torch_ckpt.py sonar) drops in. The frontend reproduces
SeamlessM4TFeatureExtractor semantics: kaldi 80-mel log-fbank (povey,
preemphasis, DC removal — shared ops/fbank.py), per-utterance per-mel-bin
zero-mean/unit-var normalization (ddof=1), and stride-2 frame stacking to
160 dims with the HF attention-mask subsampling rule (indices % 2 == 1).

TPU-first: int16 waveforms upload (quarter of fp32 feature bytes over the
~45 MB/s tunnel), the fbank + normalization + stacking run INSIDE the
jitted forward (no host feature round-trip), and shapes are bucketed so
XLA compiles one program per bucket.
"""

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from svecalign_tpu.utils.jax_setup import setup_jax

setup_jax()
from svecalign_tpu.models.encode_common import (
    SpanEncoderMixin,
    _cast_fp16,
    _scatter_rows_fp16,
)
from svecalign_tpu.models.w2v_bert import W2vBertConfig, W2vBertModel
from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class SonarEncoderConfig:
    n_mels: int = 80
    model_dim: int = 1024
    n_layers: int = 24  # w2v-BERT 2.0 / SONAR speech trunk depth
    n_heads: int = 16
    ffn_dim: int = 4096
    conv_kernel: int = 31
    pool_dim: int = 1024
    position_embeddings_type: str = "relative_key"
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    dtype: str = "bfloat16"
    attention_backend: str = "auto"  # fused Pallas rel-key kernel on TPU

    def trunk_config(self) -> W2vBertConfig:
        return W2vBertConfig(
            feature_projection_input_dim=2 * self.n_mels,
            hidden_size=self.model_dim,
            num_hidden_layers=self.n_layers,
            num_attention_heads=self.n_heads,
            intermediate_size=self.ffn_dim,
            conv_depthwise_kernel_size=self.conv_kernel,
            position_embeddings_type=self.position_embeddings_type,
            left_max_position_embeddings=self.left_max_position_embeddings,
            right_max_position_embeddings=self.right_max_position_embeddings,
            dtype=self.dtype,
            attention_backend=self.attention_backend,
        )


class AttentionPooler(nn.Module):
    """Learned-query multi-head attention pooling (SONAR's
    EncoderOutputPooler family): one query attends over the encoder
    states, output projected to ``pool_dim``."""

    config: SonarEncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        b, t, d = x.shape
        nh = cfg.n_heads
        dh = d // nh

        query = self.param("query", nn.initializers.normal(0.02), (1, 1, d))
        q = nn.Dense(d, dtype=dtype, name="q_proj")(
            jnp.broadcast_to(query, (b, 1, d)).astype(dtype)
        )
        k = nn.Dense(d, dtype=dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=dtype, name="v_proj")(x)
        q = q.reshape(b, 1, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(mask[:, None, None, :], scores, neg)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, d)[:, 0]
        return nn.Dense(cfg.pool_dim, dtype=jnp.float32, name="out_proj")(
            out.astype(jnp.float32)
        )


class SonarSpeechEncoder(nn.Module):
    """w2v-BERT trunk + attention pooler: stacked mels -> (B, pool_dim)."""

    config: SonarEncoderConfig = SonarEncoderConfig()

    @nn.compact
    def __call__(self, feats: jax.Array, mask: jax.Array) -> jax.Array:
        """feats: (B, T, 2*n_mels) stacked normalized log-mels;
        mask: (B, T) bool. Returns (B, pool_dim) float32."""
        x = W2vBertModel(self.config.trunk_config(), name="trunk")(feats, mask)
        return AttentionPooler(self.config, name="pooler")(x, mask).astype(
            jnp.float32
        )


def sonar_frontend(wav: jax.Array, lengths: jax.Array, n_frames: int, n_mels: int):
    """SeamlessM4TFeatureExtractor-equivalent frontend, trace-time (runs
    inside the jitted forward): kaldi fbank on the 16-bit-scaled waveform,
    per-utterance per-mel-bin zero-mean/unit-var normalization over valid
    frames (ddof=1), stride-2 stacking. Returns (feats (B, n_frames//2,
    2*n_mels), mask (B, n_frames//2) bool). Equivalence vs the HF extractor
    is asserted in tests/test_hf_equivalence.py::test_sonar_frontend_matches_hf.
    """
    from svecalign_tpu.ops.fbank import fbank_device

    # SeamlessM4T "kaldi compliance": waveform scaled to int16 range
    feats = jax.vmap(
        lambda w: fbank_device(w * 32768.0, 16000, n_mels, 400, 160, n_frames)
    )(wav)  # (B, T, n_mels)

    t = feats.shape[1]
    valid = jnp.arange(t)[None, :] < jnp.maximum(lengths, 1)[:, None]
    n = jnp.maximum(lengths, 1).astype(jnp.float32)[:, None, None]
    m = valid[:, :, None]
    mean = jnp.sum(jnp.where(m, feats, 0.0), axis=1, keepdims=True) / n
    var = jnp.sum(
        jnp.where(m, jnp.square(feats - mean), 0.0), axis=1, keepdims=True
    ) / jnp.maximum(n - 1.0, 1.0)
    feats = (feats - mean) / jnp.sqrt(var + 1e-7)
    feats = jnp.where(m, feats, 0.0)

    # stride-2 stacking; HF keeps attention rows where frame % 2 == 1,
    # so the stacked valid count is lengths // 2
    t2 = t - t % 2
    feats = feats[:, :t2].reshape(feats.shape[0], t2 // 2, 2 * n_mels)
    mask2 = jnp.arange(t2 // 2)[None, :] < (lengths // 2)[:, None]
    return feats, mask2


class SonarSpeechModel(SpanEncoderMixin):
    """Host wrapper: fused fbank frontend + bucketed batched forward."""

    # encode(..., keep_device=True) returns (out, device fp16 rows):
    # the fused-pipeline handoff capability (utils/embed_cache.py)
    supports_keep_device = True

    # encode_spans(): overlap windows assembled on device from one
    # whole-waveform upload (ops/assemble.py — heavily overlapping windows
    # make host staging upload ~31x the raw audio bytes)
    supports_spans = True
    WAVE_BUCKETS_S = None  # None = ops.assemble.WAVE_BUCKETS_S

    # 10 ms frames (pre-stack). 700/1400 fill the 500->1000->2000 gaps:
    # overlap windows average 600-800 frames, and on the LASER encoder the
    # same padding cut measured 2x device time (tools/profile_embed.py
    # --ab_buckets — unmeasured on sonar, same mechanism). 4500/6000
    # (45/60 s) exist for embed_align spans under non-default
    # concat_aligns flags. All buckets compile lazily — unused sizes cost
    # nothing. Longer inputs truncate, loudly.
    BUCKET_FRAMES = (200, 500, 700, 1000, 1400, 2000, 3000, 4500, 6000)

    def __init__(
        self,
        config: SonarEncoderConfig = SonarEncoderConfig(),
        ckpt_path: Optional[str] = None,
        batch_size: int = 16,
        seed: int = 0,
        upload_dtype: str = "int16",
        mesh=None,
    ):
        self.config = config
        self.model = SonarSpeechEncoder(config)
        self.batch_size = batch_size
        self.upload_dtype = upload_dtype  # int16 (half bytes) | fp32 (exact)

        from svecalign_tpu.models.param_utils import load_params_npz, numpy_init

        dummy = jnp.zeros((1, self.BUCKET_FRAMES[0] // 2, 2 * config.n_mels))
        init_args = (dummy, jnp.ones((1, self.BUCKET_FRAMES[0] // 2), bool))
        if ckpt_path:
            loaded = load_params_npz(ckpt_path)
            # trunk-only checkpoints (convert_torch_ckpt.py sonar on a bare
            # Wav2Vec2BertModel) are usable: missing leaves (the pooler)
            # fall back to random init with a warning. Expected keys/shapes
            # come from jax.eval_shape — nothing is materialized or
            # uploaded for leaves the checkpoint provides (a full random
            # init here cost a ~2.4 GB pointless upload per process).
            from flax.traverse_util import flatten_dict, unflatten_dict

            from svecalign_tpu.models.param_utils import numpy_init_leaf

            shapes = flatten_dict(jax.eval_shape(
                self.model.init, jax.random.PRNGKey(seed), *init_args
            )["params"])
            got = flatten_dict(loaded["params"])
            missing = [k for k in shapes if k not in got]
            extra = [k for k in got if k not in shapes]
            if extra:
                raise KeyError(
                    f"{ckpt_path}: {len(extra)} unknown parameter paths, e.g. "
                    f"{'/'.join(extra[0])} — wrong architecture/config?"
                )
            rng = np.random.default_rng(seed)
            base = {}
            for k, leaf in shapes.items():
                if k in got:
                    if leaf.shape != got[k].shape:
                        raise ValueError(
                            f"{ckpt_path}: shape mismatch at {'/'.join(k)}: "
                            f"{got[k].shape} vs expected {leaf.shape}"
                        )
                    base[k] = got[k]
                else:
                    base[k] = numpy_init_leaf(k, leaf, rng)
            if missing:
                logger.warning(
                    f"{ckpt_path}: {len(missing)} parameters not in checkpoint "
                    f"(e.g. {'/'.join(missing[0])}) kept at random init — "
                    "trunk-only checkpoint?"
                )
            self.params = {"params": unflatten_dict(base)}
            logger.info(f"Loaded SONAR params from {ckpt_path}")
        else:
            self.params = numpy_init(self.model, init_args, seed)
            logger.warning(
                "SONAR encoder initialized with RANDOM weights; "
                "embeddings are not meaningful for mining."
            )
        _apply_wav = self._dequant_apply

        # data-parallel inference, mirroring SpeechLaserModel.__init__:
        # batch rows shard over the mesh's 'data' axis, params replicate.
        # wav/scales/lengths are single-use per chunk: donation folds their
        # release into the execution.
        if mesh is None and len(jax.devices()) > 1:
            from svecalign_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        self.mesh = mesh
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = NamedSharding(mesh, P("data"))
            replicated = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, replicated)
            self._forward = jax.jit(
                _apply_wav,
                static_argnums=(4,),  # n_frames (kwargs break in_shardings)
                in_shardings=(
                    jax.tree.map(lambda _: replicated, self.params),
                    NamedSharding(mesh, P("data", None)),
                    data,
                    data,
                ),
                out_shardings=NamedSharding(mesh, P("data", None)),
                donate_argnums=(1, 2, 3),
            )
            self._dp_rows = mesh.shape["data"]
            # chunk rows must split evenly over the data axis
            self.batch_size = -(-self.batch_size // self._dp_rows) * self._dp_rows
        else:
            self.params = jax.device_put(self.params)
            self._forward = jax.jit(
                _apply_wav, static_argnames=("n_frames",), donate_argnums=(1, 2, 3)
            )
            self._dp_rows = 1

    def _dequant_apply(self, params, wav, scales, lengths, n_frames):
        """Pure forward from int16-quantized waveforms (fp32 inputs pass
        through with scale 1.0); fbank + normalization + stacking fused
        into the forward so features never cross the tunnel."""
        wav = wav.astype(jnp.float32) * scales[:, None]
        feats, mask2 = sonar_frontend(
            wav, lengths, n_frames, self.config.n_mels
        )
        return self.model.apply(params, feats, mask2)

    def _bucket(self, n: int) -> int:
        for b in self.BUCKET_FRAMES:
            if n <= b:
                return b
        return self.BUCKET_FRAMES[-1]

    # --- SpanEncoderMixin hooks (buckets in 10 ms frames) ---

    def _span_buckets(self):
        return self.BUCKET_FRAMES

    def _bucket_width(self, bucket: int) -> int:
        return 400 + (bucket - 1) * 160  # frames -> samples

    def _rows_per_chunk(self, bucket: int) -> int:
        return self.batch_size

    def _span_plan(self, start: int, ln: int):
        n_frames = 0 if ln < 400 else 1 + (ln - 400) // 160
        bucket = self._bucket(n_frames)
        width = self._bucket_width(bucket)
        return (bucket, (start, min(ln, width), min(n_frames, bucket)),
                n_frames > self.BUCKET_FRAMES[-1])

    def _span_forward(self, rows_q, row_scales, lengths, bucket):
        return self._forward(self.params, rows_q, row_scales, lengths, bucket)

    def _span_forward_pure(self):
        if getattr(self, "_dp_rows", 1) != 1:
            return None  # mesh path keeps its sharded pjit forward

        def fn(params, rows_q, row_scales, lengths, bucket):
            return self._dequant_apply(
                params, rows_q, row_scales, lengths, bucket
            )

        return fn

    @property
    def _embed_dim(self) -> int:
        return self.config.pool_dim

    @property
    def _trunc_unit(self) -> str:
        return f"{self.BUCKET_FRAMES[-1]} x 10 ms"

    def encode(self, waveforms, keep_device: bool = False,
               fp16_pull: bool = False):
        """Encode waveforms -> (N, pool_dim) float32 (float16 under
        ``fp16_pull`` — device-cast, half the D2H bytes, bit-equal to the
        writer's host fp32->fp16 cast; encode_common._cast_fp16).

        ``keep_device`` mirrors SpeechLaserModel.encode: additionally
        scatter each batch's output (fp16, the .embed file's dtype) into
        one (embed_cache.max_rows, dim) device buffer and return
        ``(out, device_rows)`` — the fused pipeline handoff
        (utils/embed_cache.py). ``(out, None)`` if N exceeds the cap."""
        out = np.zeros(
            (len(waveforms), self.config.pool_dim),
            dtype=np.float16 if fp16_pull else np.float32,
        )
        dev = None
        if keep_device:
            from svecalign_tpu.utils import embed_cache

            if len(waveforms) <= embed_cache.max_rows:
                dev = jnp.zeros(
                    (embed_cache.max_rows, self.config.pool_dim), jnp.float16
                )

        # fixed (batch_size, samples(bucket)) shapes: one program per bucket
        by_bucket: dict = {}
        n_truncated = 0
        for i, w in enumerate(waveforms):
            w = np.asarray(w, dtype=np.float32)
            if w.ndim == 2:
                w = w[:, 0]  # channel 0, as slice_segments/encode_spans
            n_frames = 0 if len(w) < 400 else 1 + (len(w) - 400) // 160
            n_truncated += n_frames > self.BUCKET_FRAMES[-1]
            by_bucket.setdefault(self._bucket(n_frames), []).append((i, w, n_frames))
        if n_truncated:
            logger.warning(
                f"{n_truncated}/{len(waveforms)} inputs exceed the largest "
                f"frame bucket ({self.BUCKET_FRAMES[-1]} x 10 ms) and are "
                "TRUNCATED to it — their embeddings cover only the prefix"
            )

        chunks = []
        for bucket, items in sorted(by_bucket.items()):
            for chunk_start in range(0, len(items), self.batch_size):
                chunks.append((bucket, items[chunk_start : chunk_start + self.batch_size]))

        def stage(args):
            """Pad + quantize + device_put one chunk on a worker thread
            (device_put blocks its caller in the tunnel's post-D2H mode)."""
            bucket, chunk = args
            samples = 400 + (bucket - 1) * 160
            fp32 = self.upload_dtype == "fp32"
            padded = np.zeros(
                (self.batch_size, samples), dtype=np.float32 if fp32 else np.int16
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
            return jnp.asarray(padded), jnp.asarray(scales), jnp.asarray(lengths)

        # double-buffered staging + deferred pulls, mirroring
        # SpeechLaserModel.encode: the per-chunk np.asarray pull serialized
        # the device (each sync waited for that chunk's forward)
        from concurrent.futures import ThreadPoolExecutor

        pending = []
        with ThreadPoolExecutor(1) as ex:
            fut = ex.submit(stage, chunks[0]) if chunks else None
            for ci, (bucket, chunk) in enumerate(chunks):
                padded, scales, lengths = fut.result()
                if ci + 1 < len(chunks):
                    fut = ex.submit(stage, chunks[ci + 1])
                emb = self._forward(self.params, padded, scales, lengths, bucket)
                if fp16_pull:
                    emb = _cast_fp16(emb)
                if dev is not None:
                    # out-of-range target rows (padding) drop on device
                    idx = np.full((self.batch_size,), np.iinfo(np.int32).max, np.int32)
                    idx[: len(chunk)] = [i for i, *_ in chunk]
                    dev = _scatter_rows_fp16(dev, emb, jnp.asarray(idx))
                pending.append((chunk, emb))

        if dev is not None and fp16_pull:
            del pending  # burst-free the chunk outputs (measured innocent)
            from svecalign_tpu.models import encode_common

            out = encode_common._pull_accumulated_rows(dev, len(waveforms))
        else:
            for chunk, emb in pending:
                emb = np.asarray(emb, dtype=out.dtype)
                for row, (i, *_) in enumerate(chunk):
                    out[i] = emb[row]
        return (out, dev) if keep_device else out
