"""analysis/dump_alignments end-to-end on the committed example pair,
including the --asr path via an injected stub whisper module (the real
whisper is not shipped in this image; the hook contract is
``whisper.load_model(size, download_root=...).transcribe(path)["text"]``,
reference analysis/dump_alignments.py:141-196)."""

import sys
import types
from pathlib import Path

import pytest

from svecalign_tpu.utils.file_utils import read_segments

STEM = "20180313-0900-PLENARY-15"


@pytest.fixture()
def stub_whisper(monkeypatch):
    calls = {"load": [], "transcribe": []}

    class _Model:
        def transcribe(self, path):
            calls["transcribe"].append(path)
            return {"text": f"stub transcript of {Path(path).name}"}

    mod = types.ModuleType("whisper")

    def load_model(size, download_root=None):
        calls["load"].append((size, download_root))
        return _Model()

    mod.load_model = load_model
    monkeypatch.setitem(sys.modules, "whisper", mod)
    return calls


def test_dump_alignments_with_asr(example_dir, tmp_path, stub_whisper):
    from svecalign_tpu.analysis.dump_alignments import dump

    out_dir = tmp_path / "dump"
    dump(
        example_dir / "alignments/en-de" / f"{STEM}_en-{STEM}_de.txt",
        read_segments(str(example_dir / "segments/en" / f"{STEM}_en.txt")),
        read_segments(str(example_dir / "segments/de" / f"{STEM}_de.txt")),
        str(example_dir / "raw_audios/en" / f"{STEM}_en.ogg"),
        str(example_dir / "raw_audios/de" / f"{STEM}_de.ogg"),
        out_dir,
        max_rows=3,
        rows_per_page=2,
        with_asr=True,
        whisper_size="tiny",
        whisper_root="/tmp/whisper-root",
    )

    # ogg clips dumped for both sides
    assert (out_dir / "wavs" / "0.src.ogg").stat().st_size > 0
    assert (out_dir / "wavs" / "2.tgt.ogg").stat().st_size > 0

    # the stub was driven with the CLI's knobs
    assert ("tiny", "/tmp/whisper-root") in stub_whisper["load"]
    assert len(stub_whisper["transcribe"]) == 6  # 3 rows x 2 sides

    # paginated HTML with audio players AND transcripts
    page0 = (out_dir / "page0.html").read_text()
    page1 = (out_dir / "page1.html").read_text()
    assert "<audio controls" in page0
    assert "stub transcript of 0.src.ogg" in page0
    assert "stub transcript of 2.tgt.ogg" in page1
    assert 'href="page1.html"' in page0


def test_dump_alignments_without_whisper(example_dir, tmp_path):
    """--asr with no whisper importable must degrade to players-only
    HTML, not fail."""
    import sys as _sys

    assert "whisper" not in _sys.modules
    from svecalign_tpu.analysis.dump_alignments import dump

    out_dir = tmp_path / "dump2"
    dump(
        example_dir / "alignments/en-de" / f"{STEM}_en-{STEM}_de.txt",
        read_segments(str(example_dir / "segments/en" / f"{STEM}_en.txt")),
        read_segments(str(example_dir / "segments/de" / f"{STEM}_de.txt")),
        str(example_dir / "raw_audios/en" / f"{STEM}_en.ogg"),
        str(example_dir / "raw_audios/de" / f"{STEM}_de.ogg"),
        out_dir,
        max_rows=2,
        rows_per_page=100,
        with_asr=True,
    )
    page0 = (out_dir / "page0.html").read_text()
    assert "<audio controls" in page0
    assert "stub transcript" not in page0
