"""Device-side overlap-window assembly (ops/assemble.py, encode_spans).

The contract: ``encode_spans(wave, spans)`` must equal
``encode([wave[s:e] for s, e in spans])`` — bit-exactly in fp32 upload
mode, and within quantization noise in int16 mode (the two paths round at
different points: per-window host-side vs per-block + per-row re-quantize
device-side).
"""

import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast parity gate

from svecalign_tpu.models.laser_encoder import SpeechLaserModel
from svecalign_tpu.models.sonar_encoder import SonarSpeechModel
from tests.test_models import TINY_LASER, TINY_SONAR


def _wave(seconds=40, seed=0):
    rng = np.random.default_rng(seed)
    w = (0.3 * rng.standard_normal(seconds * 16000)).astype(np.float32)
    # a quiet stretch so per-block quantization actually differs from
    # per-window scaling
    w[20 * 16000 : 25 * 16000] *= 0.01
    return w


SPANS = [
    (0, 16000),            # exactly the small bucket
    (8000, 38000),         # crosses block boundaries
    (30000, 55000),        # mid-file
    (20 * 16000, 20 * 16000 + 24000),  # quiet region
    (600000, 624000),      # tail
    (632000, 640000),      # runs to the last sample
    (632000, 700000),      # overruns the file end (host slicing truncates)
]


def _laser(dtype):
    m = SpeechLaserModel(config=TINY_LASER, max_tokens=4 * 32000,
                         upload_dtype=dtype)
    m.BUCKETS = (16000, 32000)
    m.WAVE_BUCKETS_S = (10, 41)
    return m


def test_laser_spans_fp32_bit_exact():
    m = _laser("fp32")
    w = _wave()
    host = m.encode([w[s:e] for s, e in SPANS])
    dev = m.encode_spans(w, SPANS)
    np.testing.assert_array_equal(host, dev)


def test_laser_spans_int16_close():
    m = _laser("int16")
    w = _wave()
    host = m.encode([w[s:e] for s, e in SPANS])
    dev = m.encode_spans(w, SPANS)
    scale = np.abs(host).max()
    # different quantization arrangements; random weights amplify the
    # ~1-step input noise, so the bound is loose but catches real bugs
    # (wrong slice/mask/scale all produce O(1) relative error)
    assert np.abs(host - dev).max() < 0.05 * scale


def test_laser_spans_keep_device_matches_encode():
    from svecalign_tpu.utils import embed_cache

    m = _laser("fp32")
    w = _wave()
    old = embed_cache.enabled
    embed_cache.enabled = True
    try:
        e1, dev1 = m.encode([w[s:e] for s, e in SPANS], keep_device=True)
        e2, dev2 = m.encode_spans(w, SPANS, keep_device=True)
    finally:
        embed_cache.enabled = old
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(np.asarray(dev1), np.asarray(dev2))


def test_laser_spans_long_wave_fallback(caplog):
    import logging

    m = _laser("fp32")
    m.WAVE_BUCKETS_S = (1,)  # force every real file past the largest bucket
    w = _wave()
    host = m.encode([w[s:e] for s, e in SPANS])
    with caplog.at_level(logging.WARNING):
        dev = m.encode_spans(w, SPANS)
    assert any("falling back to host-sliced" in r.message for r in caplog.records)
    np.testing.assert_array_equal(host, dev)


def _sonar(dtype):
    m = SonarSpeechModel(config=TINY_SONAR, batch_size=4, upload_dtype=dtype)
    m.BUCKET_FRAMES = (100, 250)
    m.WAVE_BUCKETS_S = (10, 41)
    return m


def test_sonar_spans_fp32_bit_exact():
    m = _sonar("fp32")
    w = _wave()
    host = m.encode([w[s:e] for s, e in SPANS])
    dev = m.encode_spans(w, SPANS)
    np.testing.assert_array_equal(host, dev)


def test_sonar_spans_keep_device_matches_encode():
    from svecalign_tpu.utils import embed_cache

    m = _sonar("fp32")
    w = _wave()
    old = embed_cache.enabled
    embed_cache.enabled = True
    try:
        e1, dev1 = m.encode([w[s:e] for s, e in SPANS], keep_device=True)
        e2, dev2 = m.encode_spans(w, SPANS, keep_device=True)
    finally:
        embed_cache.enabled = old
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(np.asarray(dev1), np.asarray(dev2))


def test_sonar_spans_int16_close():
    m = _sonar("int16")
    w = _wave()
    host = m.encode([w[s:e] for s, e in SPANS])
    dev = m.encode_spans(w, SPANS)
    scale = np.abs(host).max()
    assert np.abs(host - dev).max() < 0.05 * scale


def test_embed_segments_to_file_device_vs_host(tmp_path):
    """The stage-level integration: window_assembly device == host on the
    fp32 path, through the .embed file format."""
    from svecalign_tpu.utils import embed_model_utils as emu

    w = _wave(seconds=8)
    wav_path = tmp_path / "a.wav"
    from svecalign_tpu.utils import audio_io

    audio_io.write(str(wav_path), w, 16000)
    segments = [(0, 16000), (8000, 30000), (16000, 32000), (100000, 127000)]

    m = _laser("fp32")
    out_host = tmp_path / "host.embed"
    out_dev = tmp_path / "dev.embed"
    emu.embed_segments_to_file(
        m, "speech_laser", str(wav_path), segments, str(out_host),
        window_assembly="host",
    )
    emu.embed_segments_to_file(
        m, "speech_laser", str(wav_path), segments, str(out_dev),
        window_assembly="device",
    )
    a = np.load(out_host)  # stopes-format fp16 .npy
    b = np.load(out_dev)
    np.testing.assert_array_equal(a, b)


def test_embed_segments_to_file_device_vs_host_sonar(tmp_path):
    """Same stage-level check for the SONAR flavor (headerless raw fp16)."""
    from svecalign_tpu.utils import audio_io
    from svecalign_tpu.utils import embed_model_utils as emu

    w = _wave(seconds=8)
    wav_path = tmp_path / "a.wav"
    audio_io.write(str(wav_path), w, 16000)
    segments = [(0, 16000), (8000, 30000), (16000, 32000), (100000, 127000)]

    m = _sonar("fp32")
    out_host = tmp_path / "host.embed"
    out_dev = tmp_path / "dev.embed"
    emu.embed_segments_to_file(
        m, "sonar", str(wav_path), segments, str(out_host),
        window_assembly="host",
    )
    emu.embed_segments_to_file(
        m, "sonar", str(wav_path), segments, str(out_dev),
        window_assembly="device",
    )
    a = np.fromfile(out_host, dtype=np.float16)
    b = np.fromfile(out_dev, dtype=np.float16)
    assert a.size == len(segments) * m.config.pool_dim
    np.testing.assert_array_equal(a, b)


def test_fp16_pull_bit_equals_host_cast():
    """fp16_pull moves the fp32->fp16 cast onto the device (half the D2H
    bytes — the post-pull host stall is bytes-proportional, see
    tools/ablate_stall.py). Both casts round to nearest-even, so the
    result must be bit-identical to pulling fp32 and casting on host."""
    m = _laser("fp32")
    w = _wave()
    waves = [w[s:e] for s, e in SPANS]
    ref = m.encode(waves).astype(np.float16)
    got = m.encode(waves, fp16_pull=True)
    assert got.dtype == np.float16
    np.testing.assert_array_equal(ref, got)

    got_spans = m.encode_spans(w, SPANS, fp16_pull=True)
    assert got_spans.dtype == np.float16
    np.testing.assert_array_equal(
        m.encode_spans(w, SPANS).astype(np.float16), got_spans
    )


def test_fp16_pull_bit_equals_host_cast_sonar():
    m = _sonar("fp32")
    w = _wave(seconds=8)
    waves = [w[:16000], w[8000:30000], w[16000:32000]]
    ref = m.encode(waves).astype(np.float16)
    got = m.encode(waves, fp16_pull=True)
    assert got.dtype == np.float16
    np.testing.assert_array_equal(ref, got)


def test_fp16_pull_accumulator_path():
    """With keep_device on, fp16_pull switches the final pulls from
    per-chunk transfers to fixed 2048-row slices of the fp16 scatter
    accumulator — the values must be the same either way."""
    from svecalign_tpu.utils import embed_cache

    m = _laser("fp32")
    w = _wave()
    waves = [w[s:e] for s, e in SPANS]
    old = embed_cache.enabled
    embed_cache.enabled = True
    try:
        plain = m.encode(waves, fp16_pull=True)
        acc, dev = m.encode(waves, keep_device=True, fp16_pull=True)
        acc_spans, dev2 = m.encode_spans(w, SPANS, keep_device=True,
                                         fp16_pull=True)
    finally:
        embed_cache.enabled = old
    assert dev is not None and dev2 is not None
    assert acc.dtype == np.float16
    np.testing.assert_array_equal(plain, acc)
    np.testing.assert_array_equal(
        m.encode_spans(w, SPANS, fp16_pull=True), acc_spans
    )


@pytest.mark.parametrize("make", ["laser", "sonar"])
@pytest.mark.parametrize("dtype", ["int16", "fp32"])
def test_fused_chunk_program_bit_identical(monkeypatch, make, dtype):
    """SVECALIGN_FUSED_CHUNK=1 runs each chunk's window gather + forward +
    fp16 scatter as ONE program (encode_common._get_fused_chunk); its
    accumulator rows must be bit-identical to the split 3-program path."""
    from svecalign_tpu.utils import embed_cache

    if make == "laser":
        m = _laser(dtype)
        spans = SPANS
    else:
        m = _sonar(dtype)
        spans = SPANS
    w = _wave()
    monkeypatch.setattr(embed_cache, "enabled", True)

    monkeypatch.setenv("SVECALIGN_FUSED_CHUNK", "0")
    split, dev_s = m.encode_spans(w, spans, keep_device=True, fp16_pull=True)
    monkeypatch.setenv("SVECALIGN_FUSED_CHUNK", "1")
    fused, dev_f = m.encode_spans(w, spans, keep_device=True, fp16_pull=True)

    assert dev_s is not None and dev_f is not None
    np.testing.assert_array_equal(split, fused)


@pytest.mark.parametrize("make", ["laser", "sonar"])
def test_prewarm_span_programs_runs_and_changes_nothing(make):
    """prewarm_span_programs fire-and-forgets one zero-batch per bucket
    (daemon threads); it must execute cleanly for both encoders' hook
    signatures and leave encode_spans results untouched."""
    import threading

    m = _laser("int16") if make == "laser" else _sonar("int16")
    w = _wave()
    before = m.encode_spans(w, SPANS[:3])
    n0 = threading.active_count()
    m.prewarm_span_programs()
    # wait for the daemon threads so a hook-signature error would surface
    # in the warning log (and so the comparison below runs post-prewarm)
    deadline = time.time() + 120
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.1)
    after = m.encode_spans(w, SPANS[:3])
    np.testing.assert_array_equal(before, after)


@pytest.mark.parametrize("make", ["laser", "sonar"])
def test_prewarm_bucket_subset_filter(make, monkeypatch):
    """prewarm_span_programs(buckets=...) compiles only the requested
    subset, keeps the caller's priority order, and silently drops unknown
    buckets (a miss is covered by the lazy path — prewarm is never a
    gate). Captures the touch targets instead of running forwards."""
    import threading

    m = _laser("int16") if make == "laser" else _sonar("int16")
    known = list(m._span_buckets())
    touched = []

    class _Rec(threading.Thread):
        def __init__(self, target=None, args=(), daemon=None):
            super().__init__(daemon=True)
            self._args = args

        def start(self):
            touched.append(self._args[0])  # record, don't compile

    monkeypatch.setattr(threading, "Thread", _Rec)

    m.prewarm_span_programs()  # None = every known bucket (round-4 path)
    assert touched == known

    touched.clear()
    ask = [known[-1], 10**9, known[0]]  # reversed priority + unknown
    m.prewarm_span_programs(buckets=ask)
    assert touched == [known[-1], known[0]]
