"""Voice activity detection in JAX.

Two interchangeable probability models feeding one faithful port of the
silero ``get_speech_timestamps`` hysteresis post-processing (the output
contract of reference svecalign/preprocess/segment.py:84-128 — "start end"
frame lines @16 kHz; the reference pins silero-vad v4.0,
preprocess/segment.py:49-52):

- :class:`SileroV4VAD` — the silero v4 network graph (torch-stft conv-basis
  STFT frontend -> SileroVadBlock conv stack -> LSTM decoder -> conv +
  sigmoid head), weights auto-loaded from an .npz produced by
  ``tools/convert_torch_ckpt.py silero`` on the published
  ``silero_vad.jit``. The converter is shape-driven: channel counts,
  kernel sizes and the LSTM layout are derived from the checkpoint
  tensors, so a real v4 checkpoint drops in without manual mapping. The
  whole file's chunks run as ONE ``lax.scan`` on device (recurrent state
  carried across chunks, as in the original streaming model).
- :class:`EnergyVAD` — weight-free adaptive log-energy model, so the
  pipeline is fully runnable offline; good segmentation on clean plenary
  speech.
"""

import dataclasses

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

SAMPLE_RATE = 16000


# ---------------------------------------------------------------------------
# Silero v4 probability network
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SileroV4Config:
    """Geometry of the v4 graph. Everything weight-shaped (channel counts,
    kernel sizes, LSTM layout) is re-derived from the checkpoint at load
    time; the fields here cover the wiring the weights cannot encode
    (sample chunking, STFT hop, reflection pad, conv strides, temporal
    pooling of the per-frame head outputs into the per-chunk probability).
    """

    window_size: int = 1536  # samples per chunk @16 kHz (v4 default)
    n_fft: int = 256
    hop: int = 64
    pad: int = 64  # ReflectionPad1d on both sides before the STFT conv
    # channel plan when initializing WITHOUT a checkpoint (matches the v4
    # tensor shapes: 129-bin magnitude -> first_layer -> 4 encoder blocks)
    first_out: int = 128
    encoder_out: Tuple[int, ...] = (128, 64, 64, 128)
    encoder_stride: Tuple[int, ...] = (2, 2, 1, 1)
    kernel: int = 3
    lstm_hidden: int = 64
    lstm_layers: int = 2


def _v4_random_weights(cfg: SileroV4Config, seed: int = 0) -> dict:
    """Random weights in the exact v4 state-dict layout (torch conv (out,
    in, k); LSTM (4h, in)). Used when no checkpoint is available — keeps
    the graph runnable for plumbing tests and benchmarks."""
    rng = np.random.default_rng(seed)
    bins = cfg.n_fft // 2 + 1

    def conv(out, cin, k):
        return rng.normal(0, (cin * k) ** -0.5, (out, cin, k)).astype(np.float32)

    w = {"feature_extractor.forward_basis_buffer": _fourier_basis(cfg.n_fft)}
    w["first_layer.0.reparam_conv.weight"] = conv(cfg.first_out, bins, cfg.kernel)
    w["first_layer.0.reparam_conv.bias"] = np.zeros(cfg.first_out, np.float32)
    cin = cfg.first_out
    for i, out in enumerate(cfg.encoder_out):
        w[f"encoder.{i}.reparam_conv.weight"] = conv(out, cin, cfg.kernel)
        w[f"encoder.{i}.reparam_conv.bias"] = np.zeros(out, np.float32)
        cin = out
    h = cfg.lstm_hidden
    for j in range(cfg.lstm_layers):
        lin = cin if j == 0 else h
        sfx = f"_l{j}" if cfg.lstm_layers > 1 else ""
        w[f"decoder.rnn.weight_ih{sfx}"] = rng.normal(0, lin**-0.5, (4 * h, lin)).astype(np.float32)
        w[f"decoder.rnn.weight_hh{sfx}"] = rng.normal(0, h**-0.5, (4 * h, h)).astype(np.float32)
        w[f"decoder.rnn.bias_ih{sfx}"] = np.zeros(4 * h, np.float32)
        w[f"decoder.rnn.bias_hh{sfx}"] = np.zeros(4 * h, np.float32)
    w["decoder.decoder.2.weight"] = conv(1, h, 1)
    w["decoder.decoder.2.bias"] = np.zeros(1, np.float32)
    return w


def _fourier_basis(n_fft: int) -> np.ndarray:
    """torch-stft forward basis: [real; imag] DFT rows x hann window,
    shape (2*(n_fft//2+1), 1, n_fft) — the layout of v4's
    ``feature_extractor.forward_basis_buffer``."""
    bins = n_fft // 2 + 1
    fourier = np.fft.fft(np.eye(n_fft))[:bins]
    basis = np.vstack([np.real(fourier), np.imag(fourier)]).astype(np.float32)
    window = np.hanning(n_fft).astype(np.float32)
    return (basis * window[None, :])[:, None, :]


class SileroV4VAD:
    """Silero v4 VAD graph in JAX, streaming state carried across chunks.

    Weight layout is the v4 torchscript state dict (``_model.`` prefix
    stripped): ``feature_extractor.forward_basis_buffer``,
    ``first_layer.0.reparam_conv.*``, ``encoder.{i}.reparam_conv.*``,
    ``decoder.rnn.*`` (LSTMCell or multi-layer LSTM ``_l{j}`` names), and
    ``decoder.decoder.2.*`` (the 1x1 conv head before the sigmoid).
    ``tools/convert_torch_ckpt.py silero silero_vad.jit out.npz`` emits
    exactly these keys; loading derives all channel/kernel/LSTM geometry
    from the tensor shapes. Wiring the weights cannot encode (strides,
    reflection pad, temporal pooling) comes from :class:`SileroV4Config`
    and is overridable if a future silero revision changes it.
    """

    def __init__(self, config: SileroV4Config = SileroV4Config(),
                 ckpt_path: Optional[str] = None, seed: int = 0):
        self.config = config
        if ckpt_path:
            data = np.load(ckpt_path)
            self.weights = {k: np.asarray(v, np.float32) for k, v in data.items()}
            # 16k branch preferred when both are present
            if any(k.startswith("_model.") for k in self.weights):
                self.weights = {
                    k[len("_model."):]: v for k, v in self.weights.items()
                    if k.startswith("_model.")
                }
            if "feature_extractor.forward_basis_buffer" not in self.weights:
                raise ValueError(
                    f"{ckpt_path} is not a silero v4 checkpoint (missing "
                    "feature_extractor.forward_basis_buffer; keys look like "
                    f"{sorted(self.weights)[:3]}...). Re-export the pinned "
                    "torchscript model with `python tools/convert_torch_ckpt.py "
                    "silero <silero_vad.jit>` — older round-1 'silero-style' "
                    ".npz files use a different (incompatible) layout."
                )
            logger.info(f"Loaded silero weights from {ckpt_path}")
        else:
            self.weights = _v4_random_weights(config, seed)
            logger.warning(
                "SileroV4VAD initialized with RANDOM weights; use --vad_model "
                "energy or provide --vad_ckpt for meaningful segmentation."
            )
        self._build()

    # -- geometry derived from weights -------------------------------------
    def _conv_keys(self) -> Sequence[str]:
        n = 0
        while f"encoder.{n}.reparam_conv.weight" in self.weights:
            n += 1
        return ["first_layer.0.reparam_conv"] + [
            f"encoder.{i}.reparam_conv" for i in range(n)
        ]

    def _lstm_layout(self):
        """Returns [(w_ih, w_hh, b_ih, b_hh)] per layer, handling both
        LSTMCell names (weight_ih) and nn.LSTM names (weight_ih_l{j})."""
        w = self.weights
        layers = []
        if "decoder.rnn.weight_ih" in w:
            layers.append(tuple(w[f"decoder.rnn.{k}"] for k in
                                ("weight_ih", "weight_hh", "bias_ih", "bias_hh")))
        else:
            j = 0
            while f"decoder.rnn.weight_ih_l{j}" in w:
                layers.append(tuple(w[f"decoder.rnn.{k}_l{j}"] for k in
                                    ("weight_ih", "weight_hh", "bias_ih", "bias_hh")))
                j += 1
        if not layers:
            raise KeyError("no decoder.rnn.* LSTM weights in checkpoint")
        return layers

    def _build(self):
        cfg = self.config
        basis = jnp.asarray(self.weights["feature_extractor.forward_basis_buffer"])
        bins = basis.shape[0] // 2
        convs = []
        for i, key in enumerate(self._conv_keys()):
            stride = 1
            if key.startswith("encoder."):
                idx = int(key.split(".")[1])
                if idx < len(cfg.encoder_stride):
                    stride = cfg.encoder_stride[idx]
            convs.append((
                jnp.asarray(self.weights[f"{key}.weight"]),
                jnp.asarray(self.weights[f"{key}.bias"]),
                stride,
            ))
        lstm = [tuple(jnp.asarray(a) for a in layer) for layer in self._lstm_layout()]
        head_w = jnp.asarray(self.weights["decoder.decoder.2.weight"])[:, :, 0]  # (1, h)
        head_b = jnp.asarray(self.weights["decoder.decoder.2.bias"])
        self._hidden = lstm[0][1].shape[1]
        self._n_lstm = len(lstm)

        def stft_mag(chunk):
            # ReflectionPad1d(pad) then conv1d(basis, stride=hop): the
            # torch-stft formulation baked into the v4 graph
            x = jnp.pad(chunk, cfg.pad, mode="reflect")
            frames = x[
                (jnp.arange(0, x.shape[0] - cfg.n_fft + 1, cfg.hop))[:, None]
                + jnp.arange(cfg.n_fft)[None, :]
            ]  # (T, n_fft)
            proj = jnp.dot(frames, basis[:, 0, :].T)  # (T, 2*bins)
            re, im = proj[:, :bins], proj[:, bins:]
            return jnp.sqrt(re * re + im * im + 1e-12)  # (T, bins)

        def conv_stack(spec):
            # spec (T, bins) -> (T', C); torch conv1d with pad k//2
            x = spec
            for w_, b_, stride in convs:
                k = w_.shape[2]
                xp = jnp.pad(x, ((k // 2, k // 2), (0, 0)))
                x = jax.lax.conv_general_dilated(
                    xp[None], jnp.transpose(w_, (2, 1, 0)),
                    window_strides=(stride,), padding="VALID",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )[0] + b_[None, :]
                x = jax.nn.relu(x)
            return x  # (T', C)

        def lstm_step(carry, x_t):
            # stacked LSTM cells; carry: (layers, 2, h)
            new_carry = []
            inp = x_t
            for j, (w_ih, w_hh, b_ih, b_hh) in enumerate(lstm):
                h_prev, c_prev = carry[j, 0], carry[j, 1]
                gates = w_ih @ inp + w_hh @ h_prev + b_ih + b_hh
                i_g, f_g, g_g, o_g = jnp.split(gates, 4)
                c = jax.nn.sigmoid(f_g) * c_prev + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
                h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
                new_carry.append(jnp.stack([h, c]))
                inp = h
            return jnp.stack(new_carry), inp

        def chunk_step(state, chunk):
            feats = conv_stack(stft_mag(chunk))  # (T', C)
            state, hs = jax.lax.scan(lstm_step, state, feats)
            # decoder head: ReLU -> 1x1 conv -> sigmoid, mean over frames
            logits = jax.nn.relu(hs) @ head_w.T + head_b  # (T', 1)
            return state, jnp.mean(jax.nn.sigmoid(logits))

        @jax.jit
        def run(chunks_i16, scale):
            # int16 upload + device dequant: half the H2D bytes of fp32
            # over the ~45 MB/s tunnel (CLAUDE.md)
            chunks = chunks_i16.astype(jnp.float32) * scale
            state0 = jnp.zeros((self._n_lstm, 2, self._hidden))
            _, probs = jax.lax.scan(chunk_step, state0, chunks)
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
                jnp.asarray(padded.reshape(n_chunks, w)),
                jnp.float32(scale),
            )
        )

    @property
    def window_size(self) -> int:
        return self.config.window_size


# Backwards-compatible alias (round 1 shipped a generic "silero-style" net;
# the faithful v4 graph replaced it)
SileroStyleVAD = SileroV4VAD


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
