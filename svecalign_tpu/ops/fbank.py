"""Kaldi-compatible log-mel filterbank features as a batched XLA op.

TPU-native replacement for the reference's torchaudio kaldi fbank
(reference svecalign/utils/audio_utils.py:135-151): 80 mel bins, 25 ms
povey windows at 10 ms shift, preemphasis 0.97, per-frame DC removal,
power spectrum, snip_edges — matching torchaudio.compliance.kaldi.fbank
defaults (dither = 0).

The whole framing + FFT + mel projection is one jit-compiled program; the
mel projection is an MXU matmul over frames.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from svecalign_tpu.utils.jax_setup import setup_jax

# honor an explicit JAX_PLATFORMS=cpu before first jax use — the fbank
# stages (detect_untranslate_*) can be the FIRST jax touch in a pipeline
# run, and without this they silently ran over the axon tunnel at ~25 ms
# per call even when the user forced CPU
setup_jax()

MEL_LOW_FREQ = 20.0
EPSILON = 1.1920928955078125e-07  # FLT_EPSILON, kaldi's log floor


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(
    num_bins: int, window_size_padded: int, sample_rate: float,
    low_freq: float = MEL_LOW_FREQ, high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank matrix (num_bins, n_fft_bins).

    n_fft_bins = window_size_padded // 2 (nyquist bin excluded).
    """
    n_fft_bins = window_size_padded // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist

    fft_bin_width = sample_rate / window_size_padded
    mel_low = _mel_scale(low_freq)
    mel_high = _mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, n_fft_bins), dtype=np.float32)
    fft_freqs = _mel_scale(fft_bin_width * np.arange(n_fft_bins))
    for m in range(num_bins):
        left = mel_low + m * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (fft_freqs - left) / (center - left)
        down = (right - fft_freqs) / (right - center)
        bins[m] = np.maximum(0.0, np.minimum(up, down))
    return bins


def povey_window(window_size: int) -> np.ndarray:
    """Kaldi's 'povey' window: hann ** 0.85."""
    n = np.arange(window_size)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (window_size - 1))
    return (hann**0.85).astype(np.float32)


def _frames_to_mel(
    frames: jax.Array,
    sample_rate: int,
    num_mel_bins: int,
    frame_length: int,
    preemphasis: float,
):
    """Shared per-frame tail: DC removal, preemphasis, povey window, power
    spectrum, mel projection (an MXU matmul over frames), log floor."""
    padded = int(2 ** np.ceil(np.log2(frame_length)))  # round_to_power_of_two

    # remove DC offset per frame
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)

    # preemphasis: x[i] - k * x[i-1], first sample vs itself
    prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - preemphasis * prev

    window = jnp.asarray(povey_window(frame_length))
    frames = frames * window[None, :]

    # power spectrum on the padded FFT, nyquist bin excluded
    spec = jnp.fft.rfft(frames, n=padded, axis=1)
    power = jnp.square(jnp.abs(spec))[:, : padded // 2]

    banks = jnp.asarray(mel_banks(num_mel_bins, padded, float(sample_rate)))
    mel = jnp.dot(
        power, banks.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.log(jnp.maximum(mel, EPSILON))


def fbank_device(
    waveform: jax.Array,
    sample_rate: int,
    num_mel_bins: int,
    frame_length: int,
    frame_shift: int,
    n_frames: int,
    preemphasis: float = 0.97,
):
    """Trace-time fbank body: usable inside other jitted programs (e.g.
    fused into an encoder forward so features never round-trip the host)."""
    # frame extraction (snip_edges)
    starts = jnp.arange(n_frames) * frame_shift
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    frames = waveform[idx]  # (n_frames, frame_length)
    return _frames_to_mel(frames, sample_rate, num_mel_bins, frame_length,
                          preemphasis)


def fbank_frames_device(
    samples: jax.Array,
    frame_starts: jax.Array,
    sample_rate: int,
    num_mel_bins: int,
    frame_length: int,
    preemphasis: float = 0.97,
):
    """fbank over explicitly addressed frames of one flat sample buffer.

    The TPU-shaped batched entry: fbank is frame-parallel, so MANY
    segments' features are one program over the concatenation of their
    waveforms plus a per-frame start-offset vector — segment boundaries
    live entirely in ``frame_starts`` (snip_edges guarantees a segment's
    frames never read past its own samples). Program shapes depend only on
    the two padded totals, not on how many segments they cover.
    """
    idx = frame_starts[:, None] + jnp.arange(frame_length)[None, :]
    frames = samples[idx]  # (n_frames, frame_length)
    return _frames_to_mel(frames, sample_rate, num_mel_bins, frame_length,
                          preemphasis)


_fbank_impl = partial(jax.jit, static_argnames=(
    "sample_rate", "num_mel_bins", "frame_length", "frame_shift", "n_frames"
))(fbank_device)


_FRAME_BUCKET = 256  # frames per compiled-shape bucket (zero-padded, sliced)


def fbank(
    waveform: np.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
) -> np.ndarray:
    """Compute (n_frames, num_mel_bins) log-mel features for one waveform.

    Accepts (n,) or (channels, n) float arrays (first channel used),
    mirroring the torchaudio kaldi entry point used by the reference.
    Waveforms are zero-padded so the frame count lands on a bucket boundary
    (one compiled program per bucket instead of one per unique length); the
    padded frames are sliced off, leaving the exact per-frame features.
    """
    waveform = np.asarray(waveform, dtype=np.float32)
    if waveform.ndim == 2:
        waveform = waveform[0]
    frame_length = int(frame_length_ms * sample_rate / 1000)
    frame_shift = int(frame_shift_ms * sample_rate / 1000)
    n = waveform.shape[0]
    n_frames = 0 if n < frame_length else 1 + (n - frame_length) // frame_shift
    if n_frames == 0:
        return np.zeros((0, num_mel_bins), dtype=np.float32)

    frames_pad = -(-n_frames // _FRAME_BUCKET) * _FRAME_BUCKET
    samples_needed = frame_length + (frames_pad - 1) * frame_shift
    if samples_needed > n:
        waveform = np.pad(waveform, (0, samples_needed - n))
    # host entry point: run on the CPU backend even when a TPU is default.
    # Callers (untranslated-segment detection) make thousands of tiny
    # calls; over the tunneled TPU each pays a ~25 ms roundtrip that
    # dwarfs the FFT. The fused in-encoder frontend (fbank_device) is the
    # TPU path and is unaffected.
    with jax.default_device(_host_cpu()):
        out = _fbank_impl(
            jnp.asarray(waveform[:samples_needed]), sample_rate, num_mel_bins,
            frame_length, frame_shift, frames_pad,
        )
        return np.asarray(out[:n_frames])


def _host_cpu():
    global _host_cpu_dev
    if _host_cpu_dev is None:
        _host_cpu_dev = jax.devices("cpu")[0]
    return _host_cpu_dev


_host_cpu_dev = None


_fbank_frames_impl = partial(jax.jit, static_argnames=(
    "sample_rate", "num_mel_bins", "frame_length"
))(fbank_frames_device)


def _pow2_at_least(n: int, floor: int) -> int:
    return max(floor, 1 << (n - 1).bit_length())


def fbank_batch(
    waveforms,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    on_host: bool = False,
):
    """Fbanks for MANY waveforms in one device program.

    The per-segment :func:`fbank` entry is host-pinned because its callers
    historically made thousands of tiny calls (a ~25 ms tunnel roundtrip
    each). This entry restores the device path by batching: the waveforms
    are concatenated into one flat sample buffer, every frame of every
    segment becomes a row of a start-offset vector, and ONE program
    computes all features. Both totals are padded to powers of two, so the
    number of compiled shapes is logarithmic in corpus size and
    independent of the segment count/length mix. ``on_host=True`` runs the
    same batched program on the CPU backend (the crossover fallback).

    Returns a list of (n_frames_i, num_mel_bins) float32 arrays.
    """
    frame_length = int(frame_length_ms * sample_rate / 1000)
    frame_shift = int(frame_shift_ms * sample_rate / 1000)

    flat_parts = []
    starts_parts = []
    counts = []
    offset = 0
    for w in waveforms:
        w = np.asarray(w, dtype=np.float32)
        if w.ndim == 2:
            w = w[0]
        n = w.shape[0]
        nf = 0 if n < frame_length else 1 + (n - frame_length) // frame_shift
        counts.append(nf)
        if nf == 0:
            continue
        flat_parts.append(w)
        starts_parts.append(offset + np.arange(nf, dtype=np.int32) * frame_shift)
        offset += n

    if offset == 0:
        return [np.zeros((0, num_mel_bins), np.float32) for _ in counts]

    samples = np.concatenate(flat_parts)
    starts = np.concatenate(starts_parts)
    total_frames = starts.shape[0]

    s_pad = _pow2_at_least(samples.shape[0], 1 << 14)
    f_pad = _pow2_at_least(total_frames, 1 << 7)
    samples = np.pad(samples, (0, s_pad - samples.shape[0]))
    # padded frame rows read from offset 0 and are sliced off below
    starts = np.pad(starts, (0, f_pad - total_frames))

    def run():
        out = _fbank_frames_impl(
            jnp.asarray(samples), jnp.asarray(starts), sample_rate,
            num_mel_bins, frame_length,
        )
        return np.asarray(out)[:total_frames]

    if on_host:
        with jax.default_device(_host_cpu()):
            feats = run()
    else:
        feats = run()

    res = []
    row = 0
    for nf in counts:
        res.append(feats[row:row + nf])
        row += nf
    return res
