"""Audio-dependent stage parity: these exercise the native ogg decoder and
the XLA kaldi-fbank against the committed reference outputs (produced with
torchaudio + libsndfile), end to end."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

STEM = "20180313-0900-PLENARY-15"
PAIR = f"{STEM}_en-{STEM}_de"
REFERENCE_ROOT = Path("/root/reference")


def _run(module: str, *args: str) -> None:
    env = {"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/opt/venv/bin"}
    subprocess.run(
        [sys.executable, "-m", module, *args],
        check=True,
        capture_output=True,
        cwd=str(REFERENCE_ROOT),
        env=env,
    )


def test_detect_untranslate_segs_bit_exact(example_dir, tmp_path):
    _run(
        "svecalign_tpu.preprocess.detect_untranslate_segs",
        "example/voxpopuli/metadata.tsv",
        str(tmp_path),
        "--seg_dir", str(example_dir / "segments"),
        "--src_lang", "en", "--tgt_lang", "de",
    )
    for side in ["src", "tgt"]:
        got = (tmp_path / "en-de" / f"{PAIR}.{side}.txt").read_text()
        want = (example_dir / "untrans_segs/en-de" / f"{PAIR}.{side}.txt").read_text()
        assert got == want, side


def test_filter_untrans_align_bit_exact(example_dir, tmp_path):
    _run(
        "svecalign_tpu.postprocess.filter_untrans_align",
        "example/voxpopuli/metadata.tsv",
        str(tmp_path),
        "--align_dir", str(example_dir / "align_0.7"),
        "--src_lang", "en", "--tgt_lang", "de",
        "--seg_dir", str(example_dir / "segments"),
    )
    got = (tmp_path / "en-de" / f"{PAIR}.txt").read_text()
    want = (example_dir / "align_0.7_clean/en-de" / f"{PAIR}.txt").read_text()
    assert got == want


def test_native_audio_roundtrip(example_dir, tmp_path):
    from svecalign_tpu.utils import audio_io

    ogg = example_dir / "raw_audios/en" / f"{STEM}_en.ogg"
    sr, frames, ch = audio_io.info(str(ogg))
    assert sr == 16000 and ch == 1 and frames > 10_000_000

    wav, sr2 = audio_io.read(str(ogg), start=106528, stop=174560)
    assert sr2 == 16000 and wav.shape == (68032,)

    # wav round trip (16-bit quantization tolerance)
    audio_io.write(str(tmp_path / "t.wav"), wav, 16000)
    back, _ = audio_io.read(str(tmp_path / "t.wav"))
    assert np.abs(back - wav).max() < 1e-4

    # ogg round trip (lossy; require strong correlation)
    audio_io.write(str(tmp_path / "t.ogg"), wav, 16000)
    back2, _ = audio_io.read(str(tmp_path / "t.ogg"))
    n = min(len(back2), len(wav))
    corr = np.corrcoef(back2[:n], wav[:n])[0, 1]
    assert corr > 0.98


def test_wav_format_variants(tmp_path):
    """The native reader handles float32 and stereo PCM16 wavs (scipy as the
    independent writer)."""
    from scipy.io import wavfile

    from svecalign_tpu.utils import audio_io

    rng = np.random.default_rng(0)
    mono = np.clip(0.3 * rng.standard_normal(16000), -0.99, 0.99).astype(np.float32)

    # float32 wav
    wavfile.write(tmp_path / "f32.wav", 16000, mono)
    back, sr = audio_io.read(str(tmp_path / "f32.wav"))
    assert sr == 16000
    np.testing.assert_allclose(back, mono, atol=1e-6)

    # stereo PCM16
    stereo = np.stack([mono, -mono], axis=1)
    wavfile.write(tmp_path / "st.wav", 16000, (stereo * 32767).astype(np.int16))
    back2, sr2 = audio_io.read(str(tmp_path / "st.wav"))
    assert sr2 == 16000 and back2.shape == (16000, 2)
    np.testing.assert_allclose(back2[:, 0], mono, atol=1e-3)

    # sliced read
    part, _ = audio_io.read(str(tmp_path / "f32.wav"), start=1000, stop=2000)
    np.testing.assert_allclose(part, mono[1000:2000], atol=1e-6)


def test_energy_vad_close_to_silero_on_real_audio(example_dir):
    """The weight-free energy VAD must land most boundaries near the
    committed silero-v4 segments on the real plenary audio."""
    from svecalign_tpu.models.vad import EnergyVAD, get_speech_timestamps
    from svecalign_tpu.utils.audio_utils import load_waveform
    from svecalign_tpu.utils.file_utils import read_segments

    wav = load_waveform(str(example_dir / f"raw_audios/en/{STEM}_en.ogg"))
    got = get_speech_timestamps(wav, EnergyVAD())
    want = read_segments(example_dir / f"segments/en/{STEM}_en.txt")

    tol = int(0.3 * 16000)
    matched = 0
    for s, e in want:
        if any(abs(g["start"] - s) <= tol and abs(g["end"] - e) <= tol for g in got):
            matched += 1
    assert matched / len(want) >= 0.5, f"only {matched}/{len(want)} segments matched"


def test_fbank_batch_matches_per_segment():
    """ops.fbank.fbank_batch must equal the host-pinned per-segment entry
    exactly (same backend), including empty and single-frame waveforms."""
    import numpy as np

    from svecalign_tpu.ops.fbank import fbank, fbank_batch

    rng = np.random.default_rng(7)
    waves = [rng.standard_normal(n).astype(np.float32) * 0.2
             for n in (399, 400, 16000, 52341, 7)]
    batched = fbank_batch(waves)
    hosted = fbank_batch(waves, on_host=True)
    for w, b, h in zip(waves, batched, hosted):
        single = fbank(w)
        np.testing.assert_array_equal(b, single)
        np.testing.assert_array_equal(h, single)


def test_batch_segment_fbanks_kill_switch(example_dir, monkeypatch):
    """SVECALIGN_FBANK_BATCH=0 must reproduce the per-segment path."""
    import numpy as np

    from svecalign_tpu.utils.audio_utils import Segment, batch_segment_fbanks

    ogg = example_dir / "raw_audios/en/20180313-0900-PLENARY-15_en.ogg"
    segs = [Segment(16000 * i, 16000 * (i + 1) + 321 * i, ogg) for i in range(3)]
    batched = batch_segment_fbanks(segs)
    monkeypatch.setenv("SVECALIGN_FBANK_BATCH", "0")
    looped = batch_segment_fbanks(segs)
    for b, l in zip(batched, looped):
        np.testing.assert_array_equal(b, l)
