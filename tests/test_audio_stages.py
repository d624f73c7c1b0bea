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
