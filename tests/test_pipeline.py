"""The one-command orchestrator: stage subset over committed inputs."""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # excluded from the fast parity gate

STEM = "20180313-0900-PLENARY-15"
PAIR = f"{STEM}_en-{STEM}_de"


def test_pipeline_subset_reproduces_committed_alignments(example_dir, tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    # seed upstream stages from the committed example
    for d in ["segments", "untrans_segs", "embeds"]:
        shutil.copytree(example_dir / d, out / d)
    meta = tmp_path / "metadata.tsv"
    meta.write_text(
        f"{example_dir}/raw_audios/en/{STEM}_en.ogg\t"
        f"{example_dir}/raw_audios/de/{STEM}_de.ogg\n"
    )

    env = {"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
           "PATH": "/usr/bin:/bin:/opt/venv/bin"}
    subprocess.run(
        [
            sys.executable, "-m", "svecalign_tpu.pipeline",
            str(meta), str(out), "--src_lang", "en", "--tgt_lang", "de",
            "--stages", "concat_segs,untrans_concats,align,filter_cost",
        ],
        check=True, capture_output=True, cwd="/root/repo", env=env,
    )

    from svecalign_tpu.utils.file_utils import read_alignments

    got = read_alignments(out / "alignments/en-de" / f"{PAIR}.txt")
    want = read_alignments(example_dir / "alignments/en-de" / f"{PAIR}.txt")
    got_set = set((tuple(x), tuple(y)) for x, y in got)
    want_set = set((tuple(x), tuple(y)) for x, y in want)
    assert got_set == want_set

    # cost filter chained correctly off the alignments
    filtered = read_alignments(out / "alignments_0.7/en-de" / f"{PAIR}.txt")
    assert 0 < len(filtered) <= len(got)

def test_batched_align_cli_int8(example_dir, tmp_path):
    """The --pair_batch/--upload_quant CLI path: threaded staging + int8
    uploads must reproduce the committed alignment set (near-)exactly."""
    out = tmp_path / "alignments"
    env = {"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
           "PATH": "/usr/bin:/bin:/opt/venv/bin"}
    subprocess.run(
        [
            sys.executable, "-m", "svecalign_tpu.seg_align.align",
            str(example_dir / "metadata.tsv"), str(out),
            "--src_lang", "en", "--tgt_lang", "de",
            "--seg_dir", str(example_dir / "segments"),
            "--concat_dir", str(example_dir / "cat_segs"),
            "--embed_dir", str(example_dir / "embeds"),
            "--is_stopes_embed",
            "--ign_indices_dir", str(example_dir / "untrans_cat_seg_ids"),
            "--pair_batch", "4", "--upload_quant", "int8",
        ],
        check=True, capture_output=True, cwd="/root/repo", env=env,
    )

    from svecalign_tpu.utils.file_utils import read_alignments

    got = read_alignments(out / "en-de" / f"{PAIR}.txt")
    want = read_alignments(example_dir / "alignments/en-de" / f"{PAIR}.txt")
    got_set = set((tuple(x), tuple(y)) for x, y in got)
    want_set = set((tuple(x), tuple(y)) for x, y in want)
    overlap = len(got_set & want_set) / len(want_set)
    assert overlap >= 0.85, (overlap, len(got_set), len(want_set))


def test_every_stage_module_has_main():
    """pipeline._invoke calls <module>.main(); a stage missing the entry
    point crashes the orchestrator at that stage (this bit remove_overlaps
    once — its CLI ran fine standalone via __main__ but not in-process)."""
    import importlib

    mapping = {
        "segment": "svecalign_tpu.preprocess.segment",
        "untrans_segs": "svecalign_tpu.preprocess.detect_untranslate_segs",
        "concat_segs": "svecalign_tpu.seg_align.concat_segs",
        "untrans_concats": "svecalign_tpu.seg_align.detect_untranslate_concats",
        "embed": "svecalign_tpu.seg_align.embed",
        "align": "svecalign_tpu.seg_align.align",
        "filter_cost": "svecalign_tpu.postprocess.filter_by_cost",
        "filter_untrans": "svecalign_tpu.postprocess.filter_untrans_align",
        "concat_aligns": "svecalign_tpu.postprocess.concat_aligns",
        "filter_dur": "svecalign_tpu.postprocess.filter_by_dur",
        "embed_align": "svecalign_tpu.postprocess.embed_align",
        "prep_index": "svecalign_tpu.postprocess.prep_index",
        "score_align": "svecalign_tpu.postprocess.score_align",
        "prep_tsv": "svecalign_tpu.postprocess.prep_tsv",
        "remove_overlaps": "svecalign_tpu.postprocess.remove_overlaps",
        "sort": "svecalign_tpu.postprocess.sort_tsv",
    }
    from svecalign_tpu.pipeline import STAGES

    assert set(mapping) == set(STAGES)
    for stage, module in mapping.items():
        assert callable(getattr(importlib.import_module(module), "main", None)), stage


def test_pipeline_format_flags_follow_embedder(tmp_path, monkeypatch):
    """SpeechLASER .embed files are stopes .npy, SONAR's are headerless
    raw — the orchestrator must only pass the stopes-format flags for the
    laser embedder (a sonar run once crashed at prep_index because
    --embed_stopes was hard-coded; the fused cache had masked the same
    mismatch at the align stage)."""
    import svecalign_tpu.pipeline as pl

    meta = tmp_path / "md.tsv"
    meta.write_text("/a_en.ogg\t/a_de.ogg\n")

    def run(model_type):
        calls = []
        monkeypatch.setattr(pl, "_invoke",
                            lambda mod, *argv: calls.append((mod, argv)))
        monkeypatch.setattr(
            "sys.argv",
            ["pipeline", str(meta), str(tmp_path / "out"),
             "--src_lang", "en", "--tgt_lang", "de",
             "--embed_model_type", model_type,
             "--stages", "align,prep_index,score_align"],
        )
        pl.main()
        return {mod.rsplit(".", 1)[1]: argv for mod, argv in calls}

    laser = run("speech_laser")
    assert "--is_stopes_embed" in laser["align"]
    assert "--fp16_embed" not in laser["align"]  # npy header carries dtype
    assert "--embed_stopes" in laser["prep_index"]
    assert "--embed_stopes" in laser["score_align"]

    sonar = run("sonar")
    assert "--is_stopes_embed" not in sonar["align"]
    # SONAR raw .embed files are headerless fp16 (embed-stage default); a
    # non-fused align run must parse them as fp16 or the row count halves
    assert "--fp16_embed" in sonar["align"]
    assert "--embed_stopes" not in sonar["prep_index"]
    assert "--embed_stopes" not in sonar["score_align"]
    assert "--embed_fp16" in sonar["prep_index"]


def test_pipeline_embed_stages_share_one_encoder(tmp_path, monkeypatch):
    """embed and embed_align must be invoked with IDENTICAL --max_tokens
    (and --window_assembly): load_embed_model memoizes on the full
    argument tuple, so a mismatch silently builds a SECOND encoder —
    double param HBM and a fresh set of 20-300 s axon compiles."""
    import svecalign_tpu.pipeline as pl

    meta = tmp_path / "md.tsv"
    meta.write_text("/a_en.ogg\t/a_de.ogg\n")

    calls = []
    monkeypatch.setattr(pl, "_invoke",
                        lambda mod, *argv: calls.append((mod, argv)))
    monkeypatch.setattr(
        "sys.argv",
        ["pipeline", str(meta), str(tmp_path / "out"),
         "--src_lang", "en", "--tgt_lang", "de",
         "--stages", "embed,embed_align"],
    )
    pl.main()
    by_stage = {mod.rsplit(".", 1)[1]: argv for mod, argv in calls}

    def flag(argv, name):
        return argv[argv.index(name) + 1]

    for name in ("--max_tokens", "--window_assembly"):
        assert flag(by_stage["embed"], name) == flag(by_stage["embed_align"], name)


def test_fused_cache_autosizes_for_large_documents(tmp_path, monkeypatch):
    """pipeline --fused (default auto rows) must raise the cache cap from
    the concat files before the embed stage — a >4096-row document would
    otherwise silently fall off the fused path (round-2 weak spot)."""
    import svecalign_tpu.pipeline as pl
    from svecalign_tpu.utils import embed_cache

    cat_en = tmp_path / "out" / "cat_segs" / "en"
    cat_de = tmp_path / "out" / "cat_segs" / "de"
    cat_en.mkdir(parents=True)
    cat_de.mkdir(parents=True)
    (cat_en / "doc_en.txt").write_text(
        "".join(f"{i} {i + 10}\n" for i in range(5000))
    )
    (cat_de / "doc_de.txt").write_text("0 10\n")
    meta = tmp_path / "md.tsv"
    meta.write_text("/a/doc_en.ogg\t/a/doc_de.ogg\n")

    monkeypatch.setattr(pl, "_invoke", lambda *a: None)
    monkeypatch.setattr(
        "sys.argv",
        ["pipeline", str(meta), str(tmp_path / "out"),
         "--src_lang", "en", "--tgt_lang", "de", "--fused",
         "--stages", "embed"],
    )
    try:
        pl.main()
        assert embed_cache.max_rows == 5120  # 5000 rounded up to 1024s
    finally:
        embed_cache.disable()

    # an explicit --fused_max_rows wins over auto-sizing
    monkeypatch.setattr(
        "sys.argv",
        ["pipeline", str(meta), str(tmp_path / "out"),
         "--src_lang", "en", "--tgt_lang", "de", "--fused",
         "--fused_max_rows", "2048", "--stages", "embed"],
    )
    try:
        pl.main()
        assert embed_cache.max_rows == 2048
    finally:
        embed_cache.disable()


def test_pipeline_forwards_mesh_flags(tmp_path, monkeypatch):
    """--data_parallel reaches the align stage (only when != 1) and
    --sharded_index reaches score_align."""
    import svecalign_tpu.pipeline as pl

    meta = tmp_path / "md.tsv"
    meta.write_text("/a_en.ogg\t/a_de.ogg\n")

    def run(extra):
        calls = []
        monkeypatch.setattr(pl, "_invoke",
                            lambda mod, *argv: calls.append((mod, argv)))
        monkeypatch.setattr(
            "sys.argv",
            ["pipeline", str(meta), str(tmp_path / "out"),
             "--src_lang", "en", "--tgt_lang", "de",
             "--stages", "align,score_align", *extra],
        )
        pl.main()
        return {mod.rsplit(".", 1)[1]: argv for mod, argv in calls}

    plain = run([])
    assert "--data_parallel" not in plain["align"]
    assert "--sharded_index" not in plain["score_align"]

    meshy = run(["--data_parallel", "8", "--sharded_index"])
    a = meshy["align"]
    assert "--data_parallel" in a and a[a.index("--data_parallel") + 1] == "8"
    assert "--sharded_index" in meshy["score_align"]


def test_overlap_untrans_outputs_identical(tmp_path):
    """--overlap_untrans moves the untranslated-duplicate stages onto a
    background thread concurrent with embed; every output file must be
    byte-identical to the serial ordering (the flag is a scheduling
    change, never a semantic one). Drives the full 16-stage miniature
    pipeline twice in subprocesses (tools/mini_pipeline.py)."""
    import json
    import os

    def run(out, extra):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
        proc = subprocess.run(
            [sys.executable, "tools/mini_pipeline.py", "--out", str(out),
             *extra],
            cwd=str(Path(__file__).resolve().parents[1]),
            env=env, capture_output=True, text=True, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads((out / "mined_rows.json").read_text())

    rows_serial = run(tmp_path / "serial", [])
    rows_overlap = run(tmp_path / "overlap", ["--overlap_untrans"])
    assert rows_serial == rows_overlap and rows_serial

    for rel in ("untrans_segs", "untrans_cat_seg_ids"):
        a = sorted((tmp_path / "serial/mined" / rel).rglob("*.txt"))
        b = sorted((tmp_path / "overlap/mined" / rel).rglob("*.txt"))
        assert [p.name for p in a] == [p.name for p in b] and a
        for x, y in zip(a, b):
            assert x.read_bytes() == y.read_bytes(), x.name


def test_pipeline_forwards_corpus_quant(tmp_path, monkeypatch):
    """--corpus_quant int8 must reach score_align (and only score_align);
    the default fp16 must add nothing (reference-contract argv)."""
    import svecalign_tpu.pipeline as pl

    meta = tmp_path / "md.tsv"
    meta.write_text("/a_en.ogg\t/a_de.ogg\n")

    def run(*extra):
        calls = []
        monkeypatch.setattr(pl, "_invoke",
                            lambda mod, *argv: calls.append((mod, argv)))
        monkeypatch.setattr(
            "sys.argv",
            ["pipeline", str(meta), str(tmp_path / "out"),
             "--src_lang", "en", "--tgt_lang", "de",
             "--stages", "prep_index,score_align", *extra],
        )
        pl.main()
        return {mod.rsplit(".", 1)[1]: argv for mod, argv in calls}

    default = run()
    assert "--corpus_quant" not in default["score_align"]
    q8 = run("--corpus_quant", "int8")
    assert ("--corpus_quant", "int8") == tuple(
        q8["score_align"][q8["score_align"].index("--corpus_quant"):][:2]
    )
    assert "--corpus_quant" not in q8["prep_index"]
