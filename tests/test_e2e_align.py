"""End-to-end alignment on the committed example data: run the full
coarse-to-fine aligner on the reference's committed VAD segments + overlap
embeddings, then score against the hand-made gold alignment. The reference
README reports strict P/R/F1 = 0.558/0.632/0.593 and lax = 0.942/0.993/0.967
for this configuration (reference README.md:288-296)."""

import numpy as np
import pytest

from svecalign_tpu.utils.file_utils import read_alignments
from svecalign_tpu.vecalign.score import score_multiple
from svecalign_tpu.vecalign.vecalign import align

STEM = "20180313-0900-PLENARY-15"


@pytest.fixture(scope="module")
def aligned_stack(example_dir):
    return align(
        src=str(example_dir / "segments/en" / f"{STEM}_en.txt"),
        tgt=str(example_dir / "segments/de" / f"{STEM}_de.txt"),
        src_embed=[
            str(example_dir / "cat_segs/en" / f"{STEM}_en.txt"),
            str(example_dir / "embeds/en" / f"{STEM}_en.embed"),
        ],
        tgt_embed=[
            str(example_dir / "cat_segs/de" / f"{STEM}_de.txt"),
            str(example_dir / "embeds/de" / f"{STEM}_de.embed"),
        ],
        src_stopes=True,
        tgt_stopes=True,
        alignment_max_size=6,
        many_to_one=None,
        search_buffer_size=5,
        del_percentile_frac=0.2,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
        overlap_segments=True,
        print_aligned_text=False,
        src_ignore_indices=str(
            example_dir / "untrans_cat_seg_ids/en-de" / f"{STEM}_en-{STEM}_de.src.txt"
        ),
        tgt_ignore_indices=str(
            example_dir / "untrans_cat_seg_ids/en-de" / f"{STEM}_en-{STEM}_de.tgt.txt"
        ),
        print_results=False,
    )


def test_gold_f1_matches_reference_exactly(example_dir, aligned_stack):
    """With seed 42 the aligner reproduces the README gold table EXACTLY
    (strict 0.558/0.632/0.593, lax 0.942/0.993/0.967) — the strongest
    invariant in CLAUDE.md, enforced digit-for-digit."""
    gold = read_alignments(str(example_dir / f"{STEM}.gold"))
    res = score_multiple(
        gold_list=[gold], test_list=[aligned_stack[0]["final_alignments"]]
    )
    assert round(res["precision_strict"], 3) == 0.558, res
    assert round(res["recall_strict"], 3) == 0.632, res
    assert round(res["f1_strict"], 3) == 0.593, res
    assert round(res["precision_lax"], 3) == 0.942, res
    assert round(res["recall_lax"], 3) == 0.993, res
    assert round(res["f1_lax"], 3) == 0.967, res


def test_alignment_identical_to_committed(example_dir, aligned_stack):
    """All 156 alignments must be IDENTICAL to the committed reference
    output (same inputs, seed 42): set equality, not overlap."""
    ref = read_alignments(
        str(example_dir / "alignments/en-de" / f"{STEM}_en-{STEM}_de.txt")
    )
    got = aligned_stack[0]["final_alignments"]
    ref_set = set((tuple(x), tuple(y)) for x, y in ref)
    got_set = set((tuple(x), tuple(y)) for x, y in got)
    assert len(ref_set) == 156
    missing = sorted(ref_set - got_set)
    extra = sorted(got_set - ref_set)
    assert not missing and not extra, (
        f"{len(ref_set & got_set)}/156 match; missing={missing} extra={extra}"
    )


def test_scores_are_costs(aligned_stack):
    scores = np.asarray(aligned_stack[0]["alignment_scores"])
    assert np.all(scores >= 0)
    aligns = aligned_stack[0]["final_alignments"]
    for (x, y), s in zip(aligns, scores):
        if not x or not y:
            assert s == 0.0


def test_score_cli_reproduces_readme_table(example_dir):
    """Feeding the committed reference alignments to our scorer must
    reproduce the README score table exactly."""
    gold = read_alignments(str(example_dir / f"{STEM}.gold"))
    ref_align = read_alignments(
        str(example_dir / "alignments/en-de" / f"{STEM}_en-{STEM}_de.txt")
    )
    res = score_multiple(gold_list=[gold], test_list=[ref_align])
    assert round(res["precision_strict"], 3) == 0.558
    assert round(res["recall_strict"], 3) == 0.632
    assert round(res["f1_strict"], 3) == 0.593
    assert round(res["precision_lax"], 3) == 0.942
    assert round(res["recall_lax"], 3) == 0.993
    assert round(res["f1_lax"], 3) == 0.967
