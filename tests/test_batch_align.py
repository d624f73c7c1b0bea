"""Batched multi-pair alignment vs the per-pair pyramid."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast parity gate

import jax.numpy as jnp

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.vecalign import pyramid
from svecalign_tpu.vecalign.batch import vecalign_batched
from svecalign_tpu.vecalign.score import score_multiple

TYPES = [(x, y) for x in range(1, 4) for y in range(1, 4) if x + y <= 4]
KW = dict(
    final_alignment_types=TYPES,
    del_percentile_frac=0.2,
    width_over2=5,
    max_size_full_dp=300,
    costs_sample_size=500,
    num_samps_for_norm=30,
)


def _pair(rng, n, m, d=32, n_overlaps=3, related=True):
    base = rng.standard_normal((n_overlaps, max(n, m), d)).astype(np.float32)
    v0 = base[:, :n].copy()
    if related:
        v1 = base[:, :m] + 0.1 * rng.standard_normal((n_overlaps, m, d)).astype(np.float32)
    else:
        v1 = rng.standard_normal((n_overlaps, m, d)).astype(np.float32)
    return (
        np.asarray(costs_ops.make_norm1(jnp.asarray(v0))),
        np.asarray(costs_ops.make_norm1(jnp.asarray(v1))),
    )


def test_batched_covers_documents():
    rng = np.random.default_rng(0)
    pairs = [_pair(rng, 37, 35), _pair(rng, 28, 31), _pair(rng, 40, 22)]
    results = vecalign_batched(pairs, **KW)
    assert len(results) == 3
    for (v0, v1), (aligns, scores) in zip(pairs, results):
        xs = [i for x, _ in aligns for i in x]
        ys = [j for _, y in aligns for j in y]
        assert xs == list(range(v0.shape[1]))
        assert ys == list(range(v1.shape[1]))
        assert len(aligns) == len(scores)


def test_batched_matches_unbatched_quality():
    """Batched and per-pair drivers draw their normalizer/penalty samples in
    a different order from the same seed, so near-tie merges can differ;
    require strong agreement plus identical coverage (padding inert)."""
    rng = np.random.default_rng(1)
    sizes = [(30, 30), (25, 25), (18, 18)]
    pairs = [_pair(rng, n, m) for n, m in sizes]

    batched = vecalign_batched(pairs, **KW)
    for (v0, v1), (aligns, _) in zip(pairs, batched):
        single = pyramid.vecalign(v0.copy(), v1.copy(), **KW)
        sa = single[0]["final_alignments"]
        a_set = set((tuple(x), tuple(y)) for x, y in aligns)
        s_set = set((tuple(x), tuple(y)) for x, y in sa)
        overlap = len(a_set & s_set) / max(len(s_set), 1)
        assert overlap >= 0.7, (overlap, aligns, sa)
        # identical coverage regardless of merge choices
        assert [i for x, _ in aligns for i in x] == list(range(v0.shape[1]))
        assert [j for _, y in aligns for j in y] == list(range(v1.shape[1]))


def test_batched_with_pyramid_depth():
    """Force downsampling (max_size_full_dp small) with mixed sizes."""
    rng = np.random.default_rng(2)
    pairs = [_pair(rng, 50, 47), _pair(rng, 61, 44)]
    results = vecalign_batched(pairs, **{**KW, "max_size_full_dp": 20})
    for (v0, v1), (aligns, _) in zip(pairs, results):
        xs = [i for x, _ in aligns for i in x]
        ys = [j for _, y in aligns for j in y]
        assert xs == list(range(v0.shape[1]))
        assert ys == list(range(v1.shape[1]))


def test_batched_example_pair_matches_committed(example_dir):
    """Run the real example pair through the batched driver (batch of 2
    replicas) and check gold F1 parity."""
    from svecalign_tpu.utils.embedding_utils import make_doc_embedding, read_in_embeddings
    from svecalign_tpu.utils.file_utils import read_alignments
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    stem = "20180313-0900-PLENARY-15"
    s2i, emb0 = read_in_embeddings(
        str(example_dir / f"cat_segs/en/{stem}_en.txt"),
        str(example_dir / f"embeds/en/{stem}_en.embed"),
        use_stopes=True,
    )
    t2i, emb1 = read_in_embeddings(
        str(example_dir / f"cat_segs/de/{stem}_de.txt"),
        str(example_dir / f"embeds/de/{stem}_de.embed"),
        use_stopes=True,
    )
    src_lines = open(example_dir / f"segments/en/{stem}_en.txt").readlines()
    tgt_lines = open(example_dir / f"segments/de/{stem}_de.txt").readlines()
    v0 = make_doc_embedding(s2i, emb0, src_lines, 5, overlap_segments=True)
    v1 = make_doc_embedding(t2i, emb1, tgt_lines, 5, overlap_segments=True)

    kw = dict(
        final_alignment_types=make_alignment_types(6),
        del_percentile_frac=0.2,
        width_over2=8,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
    )
    results = vecalign_batched([(v0, v1), (v0, v1)], **kw)
    gold = read_alignments(str(example_dir / f"{stem}.gold"))
    ref = read_alignments(
        str(example_dir / f"alignments/en-de/{stem}_en-{stem}_de.txt")
    )
    ref_set = set((tuple(x), tuple(y)) for x, y in ref)
    for aligns, _ in results:
        res = score_multiple([gold], [aligns])
        assert res["f1_strict"] >= 0.57, res
        assert res["f1_lax"] >= 0.95, res
        # near-exact agreement with the committed per-pair output: the
        # batched driver's vmapped fp32 matmuls reduce in a different
        # order (~1 ulp in the normalizers), which can flip near-tie
        # merges — allow <=9 of 156 to differ (the per-pair path is pinned
        # to exact equality in tests/test_e2e_align.py)
        got = set((tuple(x), tuple(y)) for x, y in aligns)
        assert len(ref_set & got) >= 147, f"only {len(ref_set & got)}/156 match"

    # paired mode: per-pair seeded streams -> a pair's result must not
    # depend on its bucket (P=1 vs P=2, same sizes)
    (p1, _), = vecalign_batched([(v0, v1)], sampling="paired", **kw)
    p2 = vecalign_batched([(v0, v1), (v0, v1)], sampling="paired", **kw)
    for aligns, _ in p2:
        assert aligns == p1
    res = score_multiple([gold], [p1])
    assert res["f1_strict"] >= 0.57, res
    got = set((tuple(x), tuple(y)) for x, y in p1)
    assert len(ref_set & got) >= 147, f"only {len(ref_set & got)}/156 match"


def test_batched_int8_upload_matches_committed(example_dir):
    """The int8-quantized upload path (raw rows + device gather) must keep
    the committed-example quality gate and agree with the fp16 path on
    nearly every alignment."""
    from svecalign_tpu.utils.embedding_utils import make_doc_ids, read_in_embeddings
    from svecalign_tpu.utils.file_utils import read_alignments
    from svecalign_tpu.vecalign.batch import vecalign_batched_from_rows
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    stem = "20180313-0900-PLENARY-15"
    s2i, emb0 = read_in_embeddings(
        str(example_dir / f"cat_segs/en/{stem}_en.txt"),
        str(example_dir / f"embeds/en/{stem}_en.embed"),
        use_stopes=True,
    )
    t2i, emb1 = read_in_embeddings(
        str(example_dir / f"cat_segs/de/{stem}_de.txt"),
        str(example_dir / f"embeds/de/{stem}_de.embed"),
        use_stopes=True,
    )
    src_lines = open(example_dir / f"segments/en/{stem}_en.txt").readlines()
    tgt_lines = open(example_dir / f"segments/de/{stem}_de.txt").readlines()
    ids0 = make_doc_ids(s2i, emb0.shape[0], src_lines, 5, overlap_segments=True)
    ids1 = make_doc_ids(t2i, emb1.shape[0], tgt_lines, 5, overlap_segments=True)
    e0 = emb0.astype(np.float16)
    e1 = emb1.astype(np.float16)
    kw = dict(
        final_alignment_types=make_alignment_types(6),
        del_percentile_frac=0.2,
        width_over2=8,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
    )
    pairs = [(e0, ids0, e1, ids1)]
    (fp16_aligns, _), = vecalign_batched_from_rows(pairs, quantize=False, **kw)
    (int8_aligns, _), = vecalign_batched_from_rows(pairs, quantize=True, **kw)
    (int4_aligns, _), = vecalign_batched_from_rows(pairs, quantize="int4", **kw)

    gold = read_alignments(str(example_dir / f"{stem}.gold"))
    res = score_multiple([gold], [int8_aligns])
    assert res["f1_strict"] >= 0.57, res
    assert res["f1_lax"] >= 0.95, res

    a = set((tuple(x), tuple(y)) for x, y in fp16_aligns)
    b = set((tuple(x), tuple(y)) for x, y in int8_aligns)
    overlap = len(a & b) / max(len(a), 1)
    assert overlap >= 0.9, (overlap, len(a), len(b))

    # int4 (quarter of fp16 bytes): must hold the published-quality gate
    # and still agree with the fp16 path on most alignments
    res4 = score_multiple([gold], [int4_aligns])
    assert res4["f1_strict"] >= 0.57, res4
    assert res4["f1_lax"] >= 0.95, res4
    c = set((tuple(x), tuple(y)) for x, y in int4_aligns)
    overlap4 = len(a & c) / max(len(a), 1)
    # ~2% cosine noise flips more near-tie merges than int8; the binding
    # gate is gold quality above (published-F1 floor)
    assert overlap4 >= 0.80, (overlap4, len(a), len(c))


def test_upload_byte_accounting(monkeypatch):
    """stage_rows_upload must account staged bytes, and int4 must stage
    ~half of int8 (~quarter of fp16) for the embedding payload. Shape-grid
    padding off: the assertions check exact byte ratios, which gridded row
    counts would blur with zero-padding."""
    monkeypatch.setenv("SVECALIGN_SHAPE_GRID", "0")
    from svecalign_tpu.vecalign import batch as B

    rng = np.random.default_rng(12)
    emb = rng.standard_normal((200, 64)).astype(np.float16)
    ids = np.arange(200, dtype=np.int32)[None, :].repeat(3, axis=0)
    pair = (emb, ids, emb, ids)

    readings = {}
    for mode in ("fp16", "int8", "int4"):
        before = B.upload_stats["bytes"]
        B.stage_rows_upload([pair], quantize=mode)
        readings[mode] = B.upload_stats["bytes"] - before
    ids_bytes = 2 * ids.nbytes
    emb16 = readings["fp16"] - ids_bytes
    emb8 = readings["int8"] - ids_bytes - 2 * 200 * 4  # minus scales
    emb4 = readings["int4"] - ids_bytes - 2 * 200 * 4
    assert emb16 == 2 * emb.nbytes
    assert emb8 == emb16 // 2
    assert emb4 == emb16 // 4


def test_small_pair_uses_exhaustive_cross_product():
    """Pairs with size0*size1 < costs_sample_size must estimate the deletion
    knob from the FULL index cross product (reference make_del_knob's
    small-problem branch, dp_utils.py:278-323), not a noisy random sample —
    mixed into a bucket with a large pair that still samples randomly."""
    import jax.numpy as jnp

    from svecalign_tpu.ops import costs as costs_ops
    from svecalign_tpu.vecalign.deletion import DeletionKnob, make_del_knob

    rng = np.random.default_rng(9)
    small = _pair(rng, 12, 14)  # 168 << 500 sample budget
    large = _pair(rng, 30, 30)
    results = vecalign_batched([small, large], sampling="paired", **KW)
    assert len(results) == 2  # both pairs align end-to-end

    # the paired-mode knob must equal make_del_knob bit-for-bit for the
    # small pair (exhaustive branch draws nothing from the RNG)
    v0, v1 = small
    prng = np.random.default_rng(42)
    n0 = costs_ops.compute_norms(jnp.asarray(v0), jnp.asarray(v1), KW["num_samps_for_norm"], prng)
    n1 = costs_ops.compute_norms(jnp.asarray(v1), jnp.asarray(v0), KW["num_samps_for_norm"], prng)
    knob = make_del_knob(
        jnp.asarray(v0)[0], jnp.asarray(v1)[0], n0[0], n1[0],
        KW["costs_sample_size"], prng,
    )
    want = knob.percentile_frac_to_del_penalty(KW["del_percentile_frac"])

    from svecalign_tpu.vecalign.batch import (
        _batched_score_pairs,
    )
    x, y = np.meshgrid(np.arange(12, dtype=np.int32), np.arange(14, dtype=np.int32), indexing="ij")
    scores = np.asarray(_batched_score_pairs(
        jnp.asarray(v0)[None, 0], jnp.asarray(v1)[None, 0],
        n0[None, 0], n1[None, 0],
        jnp.asarray(x.ravel()[None]), jnp.asarray(y.ravel()[None]),
    ))[0]
    got = DeletionKnob(scores.astype(np.float32), 0, float(scores.max())).percentile_frac_to_del_penalty(KW["del_percentile_frac"])
    assert got == want


def test_device_histogram_knob_matches_host():
    """DeletionKnob.from_histogram on device-computed counts must match the
    sample-based constructor to within one bin width."""
    import jax.numpy as jnp

    from svecalign_tpu.vecalign.batch import _batched_score_hist
    from svecalign_tpu.vecalign.deletion import DeletionKnob

    rng = np.random.default_rng(3)
    v0 = costs_ops.make_norm1(jnp.asarray(rng.standard_normal((2, 40, 32)).astype(np.float32)))
    v1 = costs_ops.make_norm1(jnp.asarray(rng.standard_normal((2, 45, 32)).astype(np.float32)))
    n0 = jnp.ones((2, 40)); n1 = jnp.ones((2, 45))
    x_idx = rng.integers(0, 40, (2, 5000)); y_idx = rng.integers(0, 45, (2, 5000))

    from svecalign_tpu.vecalign.batch import _batched_score_pairs
    scores = np.asarray(_batched_score_pairs(v0, v1, n0, n1, jnp.asarray(x_idx), jnp.asarray(y_idx)))
    counts, smax = _batched_score_hist(v0, v1, n0, n1, jnp.asarray(x_idx), jnp.asarray(y_idx))
    counts, smax = np.asarray(counts), np.asarray(smax)

    for i in range(2):
        host = DeletionKnob(scores[i], 0.0, float(scores[i].max()))
        dev = DeletionKnob.from_histogram(counts[i], 0.0, float(smax[i]))
        for frac in (0.1, 0.2, 0.5, 0.8):
            a = host.percentile_frac_to_del_penalty(frac)
            b = dev.percentile_frac_to_del_penalty(frac)
            assert abs(a - b) <= 2.0 * float(smax[i]) / 1000.0 + 1e-6, (frac, a, b)


def test_device_del_penalty_matches_host_knob():
    """The fully on-device percentile interp must match the host DeletionKnob
    to within a bin width."""
    import jax.numpy as jnp

    from svecalign_tpu.vecalign.batch import _batched_del_penalty
    from svecalign_tpu.vecalign.deletion import NUM_BINS, DeletionKnob

    rng = np.random.default_rng(6)
    counts = rng.integers(0, 100, (3, NUM_BINS)).astype(np.int32)
    counts[1, :500] = 0  # skewed distribution
    smax = np.array([1.7, 0.9, 0.0], np.float32)  # includes degenerate max=0
    valid = np.array([True, True, False])

    for frac in (0.1, 0.2, 0.5, 0.9):
        pen = np.asarray(_batched_del_penalty(
            jnp.asarray(counts), jnp.asarray(smax), frac, jnp.asarray(valid)
        ))
        for i in range(2):
            want = DeletionKnob.from_histogram(
                counts[i], 0.0, float(smax[i])
            ).percentile_frac_to_del_penalty(frac)
            assert abs(pen[i] - want) <= 2.0 * max(smax[i], 1e-4) / NUM_BINS + 1e-6
        assert pen[2] == 0.5  # invalid pair placeholder


@pytest.mark.parametrize("device_tb", ["0", "1"])
def test_mesh_sharded_pairs_match_single_device(device_tb, monkeypatch):
    """Multi-chip aligner: sharding the pair axis over an 8-device mesh must
    reproduce the single-device batched outputs exactly — the DP is
    per-pair, so partitioning may not change any value (SURVEY.md 5.8's
    data-parallel-docs analog applied to the aligner itself). Covered for
    both traceback paths (host plane pull AND the device walk)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from svecalign_tpu.vecalign.batch import run_staged, stage_rows_upload

    monkeypatch.setenv("SVECALIGN_DEVICE_TRACEBACK", device_tb)
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(7)
    pairs = []
    for k in range(8):
        n, m = 20 + k, 22 + (k % 3)
        r0, r1 = 3 * n, 3 * m
        e0 = rng.standard_normal((r0, 32)).astype(np.float16)
        e1 = rng.standard_normal((r1, 32)).astype(np.float16)
        ids0 = rng.integers(0, r0, size=(3, n)).astype(np.int32)
        ids1 = rng.integers(0, r1, size=(3, m)).astype(np.int32)
        ids0[2, n - 1] = -1  # a PAD entry
        pairs.append((e0, ids0, e1, ids1))

    # max_size_full_dp 16 forces a pyramid level, so the banded costs + DP
    # (the shard_map'd stage) run too, not just the dense level
    kw = dict(KW, max_size_full_dp=16, seed=3)
    base = run_staged(stage_rows_upload(pairs), **kw)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shd = NamedSharding(mesh, P("data"))
    sharded = run_staged(stage_rows_upload(pairs, sharding=shd), **kw)

    for (a_b, s_b), (a_s, s_s) in zip(base, sharded):
        assert a_b == a_s
        np.testing.assert_allclose(s_b, s_s, rtol=1e-5, atol=1e-6)
