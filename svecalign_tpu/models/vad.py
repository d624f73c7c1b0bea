"""Voice activity detection in JAX.

Two interchangeable probability models feeding one faithful port of the
silero ``get_speech_timestamps`` hysteresis post-processing (the output
contract of reference svecalign/preprocess/segment.py:84-128 — "start end"
frame lines @16 kHz):

- :class:`SileroStyleVAD` — silero-v4-shaped network (STFT frontend, conv
  encoder, recurrent decoder, per-chunk speech probability), weights
  loadable from an .npz converted from the torchscript checkpoint. The
  whole file's chunks run as ONE batched lax.scan on device.
- :class:`EnergyVAD` — weight-free adaptive log-energy model, so the
  pipeline is fully runnable offline; good segmentation on clean plenary
  speech.
"""

import dataclasses

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

SAMPLE_RATE = 16000


# ---------------------------------------------------------------------------
# Probability models
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SileroStyleConfig:
    window_size: int = 1536  # samples per chunk @16 kHz (silero v4 default)
    n_fft: int = 256
    hop: int = 64
    conv_dims: tuple = (64, 64, 128, 128)
    rnn_dim: int = 128


class _SileroNet(nn.Module):
    config: SileroStyleConfig

    @nn.compact
    def __call__(self, spec: jax.Array, state):
        """spec: (B, frames, n_fft//2+1) magnitude STFT of one chunk;
        state: (B, rnn_dim) GRU carry. Returns (prob (B,), new state)."""
        cfg = self.config
        x = spec
        for i, dim in enumerate(cfg.conv_dims):
            x = nn.Conv(dim, kernel_size=(3,), strides=(2,), name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=1)  # (B, C)
        state = nn.GRUCell(features=cfg.rnn_dim, name="gru")(state, x)[0]
        out = nn.Dense(1, name="head")(state)
        return jax.nn.sigmoid(out[:, 0]), state


class SileroStyleVAD:
    """Chunked neural VAD with recurrent state, batched over files."""

    def __init__(self, config: SileroStyleConfig = SileroStyleConfig(),
                 ckpt_path: Optional[str] = None, seed: int = 0):
        self.config = config
        self.net = _SileroNet(config)

        frames = (config.window_size - config.n_fft) // config.hop + 1
        dummy_spec = jnp.zeros((1, frames, config.n_fft // 2 + 1))
        dummy_state = jnp.zeros((1, config.rnn_dim))
        from svecalign_tpu.models.param_utils import load_params_npz, numpy_init

        if ckpt_path:
            self.params = load_params_npz(ckpt_path)
        else:
            self.params = numpy_init(self.net, (dummy_spec, dummy_state), seed)
            logger.warning(
                "SileroStyleVAD initialized with RANDOM weights; use --vad_model "
                "energy or provide --vad_ckpt for meaningful segmentation."
            )
        self.params = jax.device_put(self.params)
        self._window = jnp.asarray(np.hanning(config.n_fft).astype(np.float32))

        @jax.jit
        def run(params, chunks_i16, scale):  # chunks: (n_chunks, window) int16
            cfg2 = self.config
            # int16 upload + device dequant: half the H2D bytes of fp32
            # over the ~45 MB/s tunnel (CLAUDE.md)
            chunks = chunks_i16.astype(jnp.float32) * scale

            def stft_mag(chunk):
                starts = jnp.arange(0, cfg2.window_size - cfg2.n_fft + 1, cfg2.hop)
                frames_ = chunk[starts[:, None] + jnp.arange(cfg2.n_fft)[None, :]]
                frames_ = frames_ * self._window[None, :]
                return jnp.abs(jnp.fft.rfft(frames_, axis=1))

            specs = jax.vmap(stft_mag)(chunks)  # (n, frames, bins)

            def step(state, spec):
                prob, state = self.net.apply(params, spec[None], state)
                return state, prob[0]

            state0 = jnp.zeros((1, cfg2.rnn_dim))
            _, probs = jax.lax.scan(step, state0, specs)
            return probs

        self._run = run

    def speech_probs(self, audio: np.ndarray) -> np.ndarray:
        w = self.config.window_size
        n_chunks = -(-len(audio) // w)
        peak = float(np.max(np.abs(audio))) if len(audio) else 0.0
        scale = peak / 32767.0 if peak > 0 else 1.0
        padded = np.zeros(n_chunks * w, dtype=np.int16)
        padded[: len(audio)] = np.rint(np.asarray(audio) / scale).astype(np.int16)
        return np.asarray(
            self._run(
                self.params,
                jnp.asarray(padded.reshape(n_chunks, w)),
                jnp.float32(scale),
            )
        )

    @property
    def window_size(self) -> int:
        return self.config.window_size


class EnergyVAD:
    """Adaptive log-energy VAD: per-chunk RMS energy, threshold placed
    between the noise floor and the speech level percentiles, smoothed to a
    pseudo-probability. Weight-free and deterministic."""

    def __init__(self, window_size: int = 1536, floor_pct: float = 10.0,
                 speech_pct: float = 90.0, smooth: int = 3):
        self._window = window_size
        self.floor_pct = floor_pct
        self.speech_pct = speech_pct
        self.smooth = smooth

    @property
    def window_size(self) -> int:
        return self._window

    def speech_probs(self, audio: np.ndarray) -> np.ndarray:
        w = self._window
        n_chunks = -(-len(audio) // w)
        padded = np.zeros(n_chunks * w, dtype=np.float32)
        padded[: len(audio)] = audio
        chunks = padded.reshape(n_chunks, w)

        energy = np.sqrt(np.mean(np.square(chunks), axis=1) + 1e-12)
        log_e = np.log(energy + 1e-12)

        lo = np.percentile(log_e, self.floor_pct)
        hi = np.percentile(log_e, self.speech_pct)
        if hi - lo < 1e-3:  # silence-only or constant signal
            return np.zeros(n_chunks, dtype=np.float32)
        mid = (lo + hi) / 2
        scale = max((hi - lo) / 8, 1e-3)
        probs = 1.0 / (1.0 + np.exp(-(log_e - mid) / scale))

        if self.smooth > 1:
            kernel = np.ones(self.smooth) / self.smooth
            probs = np.convolve(probs, kernel, mode="same")
        return probs.astype(np.float32)


# ---------------------------------------------------------------------------
# Timestamp post-processing (silero get_speech_timestamps semantics)
# ---------------------------------------------------------------------------


def probs_to_timestamps(
    speech_probs: np.ndarray,
    audio_length_samples: int,
    window_size_samples: int,
    threshold: float = 0.5,
    min_speech_duration_ms: int = 250,
    max_speech_duration_s: float = float("inf"),
    min_silence_duration_ms: int = 100,
    speech_pad_ms: int = 30,
    sampling_rate: int = SAMPLE_RATE,
) -> List[dict]:
    """Hysteresis segmentation of per-chunk speech probabilities into
    [{'start': sample, 'end': sample}] spans, matching silero-VAD v4's
    post-processing behavior (threshold / neg-threshold trigger, minimum
    silence and speech durations, max-speech splitting, boundary padding).
    """
    min_speech_samples = sampling_rate * min_speech_duration_ms / 1000
    speech_pad_samples = sampling_rate * speech_pad_ms / 1000
    max_speech_samples = (
        sampling_rate * max_speech_duration_s
        - window_size_samples
        - 2 * speech_pad_samples
    )
    min_silence_samples = sampling_rate * min_silence_duration_ms / 1000
    min_silence_samples_at_max_speech = sampling_rate * 98 / 1000

    triggered = False
    speeches: List[dict] = []
    current: dict = {}
    neg_threshold = threshold - 0.15
    temp_end = 0
    prev_end = next_start = 0

    for i, prob in enumerate(speech_probs):
        pos = window_size_samples * i
        if prob >= threshold and temp_end:
            temp_end = 0
            if next_start < prev_end:
                next_start = pos

        if prob >= threshold and not triggered:
            triggered = True
            current["start"] = pos
            continue

        if triggered and (pos - current["start"]) > max_speech_samples:
            if prev_end:
                current["end"] = prev_end
                speeches.append(current)
                current = {}
                if next_start < prev_end:
                    triggered = False
                else:
                    current["start"] = next_start
                prev_end = next_start = temp_end = 0
            else:
                current["end"] = pos
                speeches.append(current)
                current = {}
                prev_end = next_start = temp_end = 0
                triggered = False
                continue

        if prob < neg_threshold and triggered:
            if not temp_end:
                temp_end = pos
            if (pos - temp_end) > min_silence_samples_at_max_speech:
                prev_end = temp_end
            if (pos - temp_end) < min_silence_samples:
                continue
            current["end"] = temp_end
            if (current["end"] - current["start"]) > min_speech_samples:
                speeches.append(current)
            current = {}
            prev_end = next_start = temp_end = 0
            triggered = False
            continue

    if current and (audio_length_samples - current["start"]) > min_speech_samples:
        current["end"] = audio_length_samples
        speeches.append(current)

    for i, speech in enumerate(speeches):
        if i == 0:
            speech["start"] = int(max(0, speech["start"] - speech_pad_samples))
        if i != len(speeches) - 1:
            silence = speeches[i + 1]["start"] - speech["end"]
            if silence < 2 * speech_pad_samples:
                speech["end"] += int(silence // 2)
                speeches[i + 1]["start"] = int(
                    max(0, speeches[i + 1]["start"] - silence // 2)
                )
            else:
                speech["end"] = int(
                    min(audio_length_samples, speech["end"] + speech_pad_samples)
                )
                speeches[i + 1]["start"] = int(
                    max(0, speeches[i + 1]["start"] - speech_pad_samples)
                )
        else:
            speech["end"] = int(
                min(audio_length_samples, speech["end"] + speech_pad_samples)
            )

    return speeches


def get_speech_timestamps(audio: np.ndarray, model, **kwargs) -> List[dict]:
    """End-to-end: probability model + hysteresis post-processing."""
    probs = model.speech_probs(np.asarray(audio, dtype=np.float32))
    return probs_to_timestamps(
        probs, len(audio), model.window_size, **kwargs
    )
