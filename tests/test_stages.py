"""Stage-by-stage parity tests: feed each stage the committed upstream
intermediates from the reference example and diff against the committed
downstream outputs (SURVEY.md section 4, test layer b)."""

import filecmp
import gzip
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from svecalign_tpu.postprocess.concat_aligns import chain_alignments
from svecalign_tpu.postprocess.filter_by_cost import do_filter as cost_filter
from svecalign_tpu.postprocess.filter_by_dur import do_filter as dur_filter
from svecalign_tpu.postprocess.remove_overlaps import remove_overlaps
from svecalign_tpu.seg_align.concat_segs import write_span_file
from svecalign_tpu.seg_align.detect_untranslate_concats import (
    flag_hits_per_anchor,
    read_flagged_ids,
)
from svecalign_tpu.utils.audio_utils import SAMPLE_RATE
from svecalign_tpu.utils.file_utils import read_alignments, read_segments

STEM = "20180313-0900-PLENARY-15"
PAIR = f"{STEM}_en-{STEM}_de"


def test_concat_segs_bit_exact(example_dir, tmp_path):
    for lang in ["en", "de"]:
        out = tmp_path / f"{STEM}_{lang}.txt"
        write_span_file(
            in_path=example_dir / "segments" / lang / f"{STEM}_{lang}.txt",
            out_path=out,
            num_overlaps=5,
            max_dur=20.0,
        )
        want = example_dir / "cat_segs" / lang / f"{STEM}_{lang}.txt"
        assert out.read_text() == want.read_text(), lang


def test_detect_untranslate_concats_bit_exact(example_dir):
    for side, lang in [("src", "en"), ("tgt", "de")]:
        got = flag_hits_per_anchor(
            read_segments(example_dir / "segments" / lang / f"{STEM}_{lang}.txt"),
            read_flagged_ids(example_dir / "untrans_segs/en-de" / f"{PAIR}.{side}.txt"),
            max_run=5,
            frame_cap=int(20.0 * SAMPLE_RATE),
        )
        want = example_dir / "untrans_cat_seg_ids/en-de" / f"{PAIR}.{side}.txt"
        want_pairs = [tuple(map(int, line.split())) for line in want.read_text().split("\n") if line]
        assert got == want_pairs, side


def test_filter_by_cost_bit_exact(example_dir, tmp_path):
    out = tmp_path / "out.txt"
    cost_filter(
        in_path=str(example_dir / "alignments/en-de" / f"{PAIR}.txt"),
        out_path=str(out),
        max_cost=0.7,
    )
    want = example_dir / "align_0.7/en-de" / f"{PAIR}.txt"
    assert out.read_text() == want.read_text()


def test_concat_aligns_bit_exact(example_dir, tmp_path):
    src_segs = read_segments(example_dir / "segments/en" / f"{STEM}_en.txt")
    tgt_segs = read_segments(example_dir / "segments/de" / f"{STEM}_de.txt")
    raw = read_alignments(example_dir / "align_0.7_clean/en-de" / f"{PAIR}.txt")
    got = chain_alignments(
        alignments=raw,
        src_seg_to_frames=src_segs,
        tgt_seg_to_frames=tgt_segs,
        max_num_align=3,
        max_sil=1.0,
        max_dur=20.0,
        sample_rate=SAMPLE_RATE,
        apply_dur_cond_to_both_sides=True,
    )
    want = read_alignments(example_dir / "align_0.7_clean_cat3/en-de" / f"{PAIR}.txt")
    assert got == want


def test_filter_by_dur_bit_exact(example_dir, tmp_path):
    out = tmp_path / "out.txt"
    dur_filter(
        example_dir / "align_0.7_clean_cat3/en-de" / f"{PAIR}.txt",
        example_dir / "segments/en" / f"{STEM}_en.txt",
        example_dir / "segments/de" / f"{STEM}_de.txt",
        int(1.0 * SAMPLE_RATE),
        out,
    )
    want = example_dir / "align_0.7_clean_cat3_min1s/en-de" / f"{PAIR}.txt"
    assert out.read_text() == want.read_text()


def test_prep_tsv_bit_exact(example_dir, tmp_path):
    # drive the CLI itself; paths inside the tsv come from metadata.tsv
    out_dir = tmp_path / "tsvs"
    env_cmd = [
        sys.executable, "-m", "svecalign_tpu.postprocess.prep_tsv",
        str(example_dir / "metadata.tsv"), str(out_dir),
        "--src_lang", "en", "--tgt_lang", "de",
        "--align_dir", str(example_dir / "align_0.7_clean_cat3_min1s_margin"),
        "--seg_dir", str(example_dir / "segments"),
    ]
    subprocess.run(env_cmd, check=True, capture_output=True, cwd="/root/repo")
    got = gzip.open(out_dir / "en-de/align.tsv.gz", "rt").read()
    want = gzip.open(
        example_dir / "align_0.7_clean_cat3_min1s_tsvs/en-de/align.tsv.gz", "rt"
    ).read()
    assert got == want


def test_remove_overlaps_close_to_reference(example_dir):
    """stopes' exact tie-breaking is not recoverable (see module docstring);
    require high agreement instead of bit parity."""
    with gzip.open(
        example_dir / "align_0.7_clean_cat3_min1s_tsvs/en-de/align.tsv.gz", "rt"
    ) as fp:
        lines = [line.rstrip("\n") for line in fp]
    got = remove_overlaps(lines, min_audio_length_ms=2000, mining_threshold=0.0, max_overlap=0.8)
    with gzip.open(
        example_dir / "align_0.7_clean_cat3_min1s_tsvs/en-de/align.rm_overlap.tsv.gz", "rt"
    ) as fp:
        want = [line.rstrip("\n") for line in fp]
    agree = len(set(got) & set(want)) / len(want)
    assert agree >= 0.9, f"only {agree:.1%} agreement with the stopes output"
    # ordering contract: sorted by source span start
    starts = [int(line.split("\t")[1].rsplit(" ", 3)[1]) for line in got]
    assert starts == sorted(starts)


def test_remove_overlaps_bucketing_matches_quadratic_scan():
    """The production greedy dedup buckets kept lines by source path (IoU is
    zero across files, so the bucket scan is semantics-preserving); pin it
    against the unbucketed quadratic oracle on a randomized multi-document
    tsv with deliberate span collisions."""
    from svecalign_tpu.postprocess.remove_overlaps import _iou, _parse_side
    import random

    rng = random.Random(7)
    lines = []
    for _ in range(600):
        doc = rng.randrange(6)
        src_a, tgt_a = f"/a/doc{doc}_en.wav", f"/a/doc{doc}_de.wav"
        # coarse-grained starts force heavy overlap within a document
        s0 = rng.randrange(8) * 8000
        s1 = s0 + rng.randrange(4000, 64000)
        t0 = rng.randrange(8) * 8000
        t1 = t0 + rng.randrange(4000, 64000)
        score = round(rng.uniform(0.1, 2.0), 6)
        lines.append(f"{score}\t{src_a} {s0} {s1} 16000\t{tgt_a} {t0} {t1} 16000")
    lines.sort(key=lambda l: -float(l.split("\t")[0]))

    def oracle(lines, min_ms, thres, mo, ms_per_frame=1 / 16.0):
        cands = []
        for line in lines:
            sc, sf, tf = line.split("\t")
            if float(sc) < thres:
                continue
            src = _parse_side(sf)
            if (src[2] - src[1]) * ms_per_frame < min_ms:
                continue
            cands.append((src, _parse_side(tf), line))
        kept = []
        for src, tgt, line in cands:
            if not any(_iou(src, ks) > mo and _iou(tgt, kt) > mo
                       for ks, kt, _ in kept):
                kept.append((src, tgt, line))
        kept.sort(key=lambda it: (it[0][0], it[0][1]))
        return [line for _, _, line in kept]

    for mo in (0.2, 0.5, 0.8):
        got = remove_overlaps(lines, 1000, 0.5, mo)
        want = oracle(lines, 1000, 0.5, mo)
        assert got == want and len(got) < len(lines)


def test_sort_tsv_bit_exact(example_dir, tmp_path):
    src = example_dir / "align_0.7_clean_cat3_min1s_tsvs/en-de/align.rm_overlap.tsv.gz"
    out = tmp_path / "sorted.tsv.gz"
    subprocess.run(
        [
            sys.executable, "-m", "svecalign_tpu.postprocess.sort_tsv",
            "--in_tsv", str(src), "--out_tsv", str(out),
        ],
        check=True, capture_output=True, cwd="/root/repo",
    )
    got = gzip.open(out, "rt").read()
    want = gzip.open(
        example_dir / "align_0.7_clean_cat3_min1s_tsvs/en-de/align.rm_overlap.sort.tsv.gz",
        "rt",
    ).read()
    assert got == want


def test_shard_union_invariance(example_dir, tmp_path):
    """n_shard=1 vs n_shard=4 must produce the same union of outputs
    (SURVEY.md section 4 test layer d), exercised on concat_segs inputs."""
    from svecalign_tpu.utils.mp_utils import get_shard_range

    items = [f"doc{i}" for i in range(10)]
    union = []
    for rank in range(4):
        start, end = get_shard_range(len(items), 4, rank)
        union.extend(items[start:end])
    assert union == items


def test_raw_embed_roundtrip(tmp_path):
    """SONAR-flavor headerless raw fp16/fp32 .embed format."""
    import numpy as np

    from svecalign_tpu.utils.embedding_utils import (
        load_sent_embeddings,
        write_np_embeddings,
    )

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((13, 1024)).astype(np.float32)
    for fp16 in (True, False):
        path = tmp_path / f"x_{fp16}.embed"
        write_np_embeddings(emb, str(path), fp16=fp16)
        back = load_sent_embeddings(str(path), use_stopes=False, fp16_embed=fp16)
        assert back.shape == (13, 1024) and back.dtype == np.float32
        tol = 1e-3 if fp16 else 0
        np.testing.assert_allclose(back, emb, atol=tol)


def test_filter_by_cost_tolerates_missing_and_empty_inputs(tmp_path):
    # a pair the align stage skipped has no file: survival is vacuous, no crash
    assert cost_filter(
        in_path=str(tmp_path / "absent.txt"),
        out_path=str(tmp_path / "out.txt"),
        max_cost=0.7,
    ) == 1.0
    # an empty alignment file must not divide by zero
    empty = tmp_path / "empty.txt"
    empty.write_text("")
    assert cost_filter(
        in_path=str(empty), out_path=str(tmp_path / "out2.txt"), max_cost=0.7
    ) == 1.0
    assert not (tmp_path / "out.txt").exists()
    assert not (tmp_path / "out2.txt").exists()
