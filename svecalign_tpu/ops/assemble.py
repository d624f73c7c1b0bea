"""On-device overlap-window assembly for the embed stages.

The concat stage's overlap windows (seg_align/concat_segs.py) cover each
audio sample ~13x, and bucketed batches pad ~2.4x on top of that, so
host-side staging uploads ~31x the raw audio bytes per document (measured:
243 MB staged for a 240 s file, 1.9 GB for a 30 min file —
tools/profile_embed.py). Over the ~45 MB/s tunnel (CLAUDE.md) the embed
stage is upload-bound.

This module inverts the dataflow: the raw waveform crosses the tunnel ONCE
(int16 quantized per 1 s block, or fp32 for the exact path) and a small
jitted assembler gathers each (rows, width) window batch out of the
device-resident wave by start index. In int16 mode the assembled rows are
requantized per-row so they feed the SAME compiled (int16, scales,
lengths) forward program as the host-staged path — no extra encoder
compiles; fp32 mode is bit-exact with host slicing (tests/test_encode_spans.py).

There is no reference counterpart: the reference embeds /tmp wav slices
through fairseq on GPU (svecalign/utils/embed_model_utils.py:137-175) and
never pays a host->device tunnel.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

WAVE_BLOCK = 16000  # per-block quantization granularity (1 s @ 16 kHz)

# powers-of-2 seconds: a handful of upload shapes covers minutes-to-hours.
# Models pick the bucket themselves (they support per-instance overrides);
# waveforms past the largest bucket fall back to host-sliced encode().
WAVE_BUCKETS_S = (30, 60, 120, 240, 480, 960, 1920, 3840, 7680)

_assemblers = {}
_dequants = {}


def quantize_wave(
    waveform: np.ndarray, wave_len: int, fp32: bool
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad to wave_len and quantize per WAVE_BLOCK -> (wave, block_scales).

    fp32 mode returns the padded wave unchanged with unit scales (the
    assembler's dequant multiply is then exact).
    """
    n_blocks = wave_len // WAVE_BLOCK
    padded = np.zeros(wave_len, np.float32)
    padded[: len(waveform)] = waveform
    if fp32:
        return padded, np.ones(n_blocks, np.float32)
    blocks = padded.reshape(n_blocks, WAVE_BLOCK)
    peaks = np.max(np.abs(blocks), axis=1)
    scales = np.where(peaks > 0, peaks / 32767.0, 1.0).astype(np.float32)
    wave = np.rint(blocks / scales[:, None]).astype(np.int16).reshape(-1)
    return wave, scales


def get_dequant(wave_len: int, slack: int):
    """Jitted (wave, block_scales) -> padded f32 wave, run ONCE per file.

    Materializing the dequantized wave in its own program matters: fused
    into the assembler, the dequant+concat producer feeding the window
    gather made each assembler call ~28 ms on v5e (measured as the device-
    mode pull_s excess, tools/profile_embed.py --assembly ab) — ~35x the
    0.8 ms the pieces cost standalone (tools/ablate_assemble.py). From a
    materialized buffer the gather runs at memory speed, and the per-block
    dequant runs once per file instead of once per chunk.

    ``slack`` zeros are appended so the assembler's dynamic_slice never
    clamps a near-end start (slack >= the largest window width).
    """
    key = (wave_len, slack)
    fn = _dequants.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def dequant(wave, block_scales):
        w = wave.astype(jnp.float32).reshape(-1, WAVE_BLOCK) * block_scales[:, None]
        return jnp.concatenate([w.reshape(-1), jnp.zeros(slack, jnp.float32)])

    _dequants[key] = dequant
    return dequant


def get_assembler(padded_len: int, width: int, fp32: bool):
    """Jitted (wave_f32_padded, idx) -> (rows, row_scales, out_lens).

    ``wave_f32_padded`` is get_dequant's output (length ``padded_len`` >=
    file + width). ``idx`` is (rows, 3) int32 ``[start, n_samples,
    out_len]``: gather a ``width``-sample window at each start, zero past
    n_samples, and pass out_len through (the forward's length unit —
    samples for the LASER encoder, 10 ms frames for SONAR's fbank
    frontend). int16 mode requantizes each row (peak/32767) so the output
    matches the staged upload format exactly; fp32 passes values through
    bit-exactly.

    The gather is vmap(dynamic_slice) — one XLA gather. Measured on v5e
    (tools/ablate_assemble.py, scan-slope, 7 rows x 20 s): 0.48 ms from a
    materialized wave; a fori_loop of per-row dynamic_slice copies is 65x
    WORSE (31.7 ms — TPU while-loop per-iteration overhead), so do not
    "optimize" this into a loop.
    """
    key = (padded_len, width, fp32)
    asm = _assemblers.get(key)
    if asm is not None:
        return asm

    @jax.jit
    def assemble(w, idx):
        return assemble_pure(w, idx, width, fp32)

    _assemblers[key] = assemble
    return assemble


def assemble_pure(w, idx, width: int, fp32: bool):
    """Traceable body of :func:`get_assembler` — also inlined into the
    fused per-chunk program (encode_common), where gather + forward +
    scatter run as ONE executable to cut axon per-exec overhead."""
    n_rows = idx.shape[0]
    n_samples = jnp.minimum(idx[:, 1], width)

    def one(start):
        return jax.lax.dynamic_slice(w, (start,), (width,))

    rows = jax.vmap(one)(idx[:, 0])
    rows = jnp.where(jnp.arange(width)[None, :] < n_samples[:, None], rows, 0.0)
    if fp32:
        return rows, jnp.ones(n_rows, jnp.float32), idx[:, 2]
    peak = jnp.max(jnp.abs(rows), axis=1)
    scale = jnp.where(peak > 0, peak / 32767.0, 1.0)
    rows_q = jnp.rint(rows / scale[:, None]).astype(jnp.int16)
    return rows_q, scale.astype(jnp.float32), idx[:, 2]
