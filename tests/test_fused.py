"""Fused embed->align handoff (utils/embed_cache.py).

The fused pipeline keeps each document's embedding rows on device between
the embed and align stages; the contract is that the align output is
BIT-IDENTICAL to the file+upload path (the cached rows are the same fp16
values the .embed file holds).
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast parity gate

STEM = "20180313-0900-PLENARY-15"
PAIR = f"{STEM}_en-{STEM}_de"


@pytest.fixture(autouse=True)
def _reset_cache():
    from svecalign_tpu.utils import embed_cache

    yield
    embed_cache.disable()
    for k in embed_cache.stats:
        embed_cache.stats[k] = 0


def _invoke(module: str, *argv: str) -> None:
    import importlib

    mod = importlib.import_module(module)
    old = sys.argv
    sys.argv = [module.rsplit(".", 1)[1], *argv]
    try:
        mod.main()
    finally:
        sys.argv = old


def test_encode_keep_device_matches_host_output():
    """The device buffer the encoder leaves behind must hold exactly the
    fp16 of the rows it returned (first N rows; the padding stays zero)."""
    import jax.numpy as jnp

    from svecalign_tpu.models.laser_encoder import LaserEncoderConfig, SpeechLaserModel
    from svecalign_tpu.utils import embed_cache

    embed_cache.enable(rows=32)
    cfg = LaserEncoderConfig(
        conv_layers=((16, 10, 5), (16, 3, 2)),
        encoder_dim=32, encoder_layers=2, encoder_heads=2, encoder_ffn_dim=64,
        conv_pos_kernel=16, conv_pos_groups=4, dtype="float32",
    )
    model = SpeechLaserModel(config=cfg, max_tokens=4 * 16000)
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
            for n in (1600, 3200, 2400, 8000, 1600)]
    out, dev = model.encode(wavs, keep_device=True)
    dev = np.asarray(dev)
    assert dev.shape == (32, 32) and dev.dtype == np.float16
    np.testing.assert_array_equal(dev[: len(wavs)], out.astype(np.float16))
    assert not dev[len(wavs):].any()

    # too many rows for the cap -> no device buffer, host output unchanged
    embed_cache.max_rows = 3
    out2, dev2 = model.encode(wavs, keep_device=True)
    assert dev2 is None
    np.testing.assert_array_equal(out2, out)


def test_stage_rows_device_equals_upload():
    """Device-resident staging == fp16 upload staging, bit for bit."""
    import jax.numpy as jnp

    from svecalign_tpu.vecalign import batch as B

    rng = np.random.default_rng(1)
    R_MAX, d, n_over = 64, 16, 3
    kwargs = dict(
        final_alignment_types=[(1, 1), (0, 1), (1, 0), (1, 2), (2, 1)],
        del_percentile_frac=0.2, width_over2=4, max_size_full_dp=8,
        costs_sample_size=50, num_samps_for_norm=10,
    )
    upload_pairs, device_pairs = [], []
    for n, m in [(20, 18), (13, 15)]:
        e0 = rng.standard_normal((n * 2, d)).astype(np.float16)
        e1 = rng.standard_normal((m * 2, d)).astype(np.float16)
        i0 = rng.integers(0, n * 2, size=(n_over, n)).astype(np.int32)
        i1 = rng.integers(0, m * 2, size=(n_over, m)).astype(np.int32)
        i0[1, ::3] = -1  # PAD/ignored entries
        upload_pairs.append((e0, i0, e1, i1))
        pad0 = np.zeros((R_MAX, d), np.float16)
        pad0[: e0.shape[0]] = e0
        pad1 = np.zeros((R_MAX, d), np.float16)
        pad1[: e1.shape[0]] = e1
        device_pairs.append((jnp.asarray(pad0), i0, jnp.asarray(pad1), i1))

    res_up = B.run_staged(B.stage_rows_upload(upload_pairs), **kwargs)
    res_dev = B.run_staged(B.stage_rows_device(device_pairs), **kwargs)
    for (a_up, s_up), (a_dev, s_dev) in zip(res_up, res_dev):
        assert a_up == a_dev
        np.testing.assert_array_equal(np.asarray(s_up), np.asarray(s_dev))


def test_fused_align_cli_bit_identical(example_dir, tmp_path):
    """align with cache-fed device rows == align from the .embed files,
    over the committed example (simulating the embed stage's handoff)."""
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache
    from svecalign_tpu.utils.embedding_utils import load_sent_embeddings

    common = [
        "--src_lang", "en", "--tgt_lang", "de",
        "--seg_dir", str(example_dir / "segments"),
        "--concat_dir", str(example_dir / "cat_segs"),
        "--embed_dir", str(example_dir / "embeds"),
        "--is_stopes_embed",
        "--ign_indices_dir", str(example_dir / "untrans_cat_seg_ids"),
        "--pair_batch", "4",
    ]

    meta = str(example_dir / "metadata.tsv")
    out_file = tmp_path / "file_path"
    _invoke("svecalign_tpu.seg_align.align", meta, str(out_file), *common)

    embed_cache.enable(rows=4096)
    for lang in ("en", "de"):
        path = example_dir / f"embeds/{lang}/{STEM}_{lang}.embed"
        rows = load_sent_embeddings(str(path), use_stopes=True).astype(np.float16)
        padded = np.zeros((4096, rows.shape[1]), np.float16)
        padded[: rows.shape[0]] = rows
        embed_cache.put(path, rows.shape[0], jnp.asarray(padded))

    out_fused = tmp_path / "fused"
    _invoke("svecalign_tpu.seg_align.align", meta, str(out_fused), *common)
    assert embed_cache.stats["hit"] >= 2  # the fused path actually ran

    got = (out_fused / "en-de" / f"{PAIR}.txt").read_text()
    want = (out_file / "en-de" / f"{PAIR}.txt").read_text()
    assert got == want


def _write_mining_fixture(tmp_path, rng, d=16, pairs=(("A_en", "A_de", 5), ("B_en", "B_de", 7))):
    """Synthetic post-align mining inputs: per-pair embed files, pointer
    tsvs (with cross-file reuse rows), align files and a metadata tsv —
    the exact on-disk contract prep_index/score_align consume."""
    from svecalign_tpu.utils.embedding_utils import write_stopes_embedding

    embed_root = tmp_path / "embeds" / "en-de"
    align_root = tmp_path / "aligns" / "en-de"
    embed_root.mkdir(parents=True)
    align_root.mkdir(parents=True)
    meta_lines = []
    embed_files = {}
    for src_stem, tgt_stem, n in pairs:
        pid = f"{src_stem}-{tgt_stem}"
        meta_lines.append(f"/audio/{src_stem}.ogg\t/audio/{tgt_stem}.ogg\n")
        for side, stem in (("src", src_stem), ("tgt", tgt_stem)):
            # two embed files per side: "fresh" rows + a "reuse" pool, so
            # the pointer tsv spans multiple files like a real embed_align run
            fresh = embed_root / f"{pid}.{side}.embed"
            pool = embed_root / f"{stem}.pool.embed"
            fresh_rows = rng.standard_normal((n, d)).astype(np.float16).astype(np.float32)
            pool_rows = rng.standard_normal((n + 2, d)).astype(np.float16).astype(np.float32)
            write_stopes_embedding(fresh_rows, str(fresh), fp16=True)
            write_stopes_embedding(pool_rows, str(pool), fp16=True)
            embed_files[str(fresh)] = fresh_rows
            embed_files[str(pool)] = pool_rows
            with open(embed_root / f"{pid}.{side}.tsv", "w") as fp:
                for i in range(n):
                    if i % 2:
                        fp.write(f"{pool.as_posix()}\t{i + 1}\n")
                    else:
                        fp.write(f"{fresh.as_posix()}\t{i}\n")
        with open(align_root / f"{pid}.txt", "w") as fp:
            for i in range(n):
                fp.write(f"[{i}]:[{i}]:0.1\n")
    meta = tmp_path / "metadata.tsv"
    meta.write_text("".join(meta_lines))
    return meta, embed_files


def _run_mining_stages(meta, tmp_path, tag, k, index_type="Flat", score_args=()):
    idx_dir = tmp_path / f"idx_{tag}"
    mrg_dir = tmp_path / f"margin_{tag}"
    for extra in ([], ["--use_tgt"]):
        _invoke(
            "svecalign_tpu.postprocess.prep_index", str(meta), str(idx_dir),
            "--data_dir", str(tmp_path / "embeds"),
            "--src_lang", "en", "--tgt_lang", "de",
            "--embed_fp16", "--embed_stopes", "--sample_ratio", "1.0",
            "--index_type", index_type, *extra,
        )
    _invoke(
        "svecalign_tpu.postprocess.score_align", str(meta), str(mrg_dir),
        "--embed_dir", str(tmp_path / "embeds"),
        "--align_dir", str(tmp_path / "aligns"),
        "--src_lang", "en", "--tgt_lang", "de",
        "--index_dir", str(idx_dir), "--embed_fp16", "--embed_stopes",
        "--k", str(k), *score_args,
    )
    from svecalign_tpu.utils.file_utils import read_alignments_with_score

    out = {}
    for f in sorted((mrg_dir / "en-de").glob("*.txt")):
        out[f.name] = [s for _, _, s in read_alignments_with_score(f)]
    return out


@pytest.mark.parametrize("index_type", ["Flat", "IVF8"])
def test_fused_mining_stages_match_file_path(tmp_path, index_type):
    """prep_index + score_align with device-cached embeddings (fused
    pipeline): corpus assembled on device (Flat), live index handed over
    via the registry, queries gathered and searched on device (Flat AND
    IVF) — margins must match the file+upload path to fp32
    summation-order noise (IVF probes the same lists either way)."""
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache

    rng = np.random.default_rng(7)
    meta, embed_files = _write_mining_fixture(tmp_path, rng)
    K = 4

    ref = _run_mining_stages(meta, tmp_path, "file", K, index_type)
    assert ref and all(len(v) > 0 for v in ref.values())

    # fused: the embed stages' device rows (== the fp16 file contents)
    embed_cache.enable(rows=16)
    for path, rows in embed_files.items():
        padded = np.zeros((16, rows.shape[1]), np.float16)
        padded[: rows.shape[0]] = rows.astype(np.float16)
        embed_cache.put(path, rows.shape[0], jnp.asarray(padded))

    fused = _run_mining_stages(meta, tmp_path, "fused", K, index_type)

    assert embed_cache.stats["gather"] >= 2  # query sides (+ Flat corpora)
    assert fused.keys() == ref.keys()
    for name in ref:
        np.testing.assert_allclose(
            np.asarray(fused[name]), np.asarray(ref[name]), rtol=5e-5, atol=1e-6
        )


def test_fused_mining_falls_back_without_full_cache(tmp_path):
    """A cache missing one document must fall back to the file path (same
    scores), not crash or silently mis-gather."""
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache

    rng = np.random.default_rng(11)
    meta, embed_files = _write_mining_fixture(tmp_path, rng)
    K = 4
    ref = _run_mining_stages(meta, tmp_path, "file", K)

    embed_cache.enable(rows=16)
    items = sorted(embed_files.items())
    for path, rows in items[:-1]:  # leave the last file uncached
        padded = np.zeros((16, rows.shape[1]), np.float16)
        padded[: rows.shape[0]] = rows.astype(np.float16)
        embed_cache.put(path, rows.shape[0], jnp.asarray(padded))

    fused = _run_mining_stages(meta, tmp_path, "partial", K)
    assert embed_cache.stats["gather_miss"] >= 1
    for name in ref:
        np.testing.assert_allclose(
            np.asarray(fused[name]), np.asarray(ref[name]), rtol=5e-5, atol=1e-6
        )


def test_gather_rejects_rows_beyond_document_length(tmp_path):
    """A pointer referencing a row past the document's REAL row count must
    miss (fall back to the file path, which raises) — never silently
    gather a zero padding row (the padded buffer is larger than the doc)."""
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache

    embed_cache.enable(rows=16)
    rows = np.zeros((16, 4), np.float16)
    rows[:3] = 1.0
    embed_cache.put("doc.embed", 3, jnp.asarray(rows))
    assert embed_cache.gather_rows_device([("doc.embed", 2)]) is not None
    assert embed_cache.gather_rows_device([("doc.embed", 3)]) is None
    assert embed_cache.stats["gather_miss"] >= 1


def test_sonar_encode_keep_device_matches_host_output():
    """SONAR side of the fused handoff: the device buffer must hold the
    fp16 of the returned rows (same contract as the LASER encoder)."""
    import jax.numpy as jnp

    from svecalign_tpu.models.sonar_encoder import SonarEncoderConfig, SonarSpeechModel
    from svecalign_tpu.utils import embed_cache

    embed_cache.enable(rows=8)
    cfg = SonarEncoderConfig(
        model_dim=32, n_layers=2, n_heads=4, ffn_dim=64, pool_dim=32,
        dtype="float32",
    )
    model = SonarSpeechModel(config=cfg, batch_size=2)
    rng = np.random.default_rng(2)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1
            for n in (4000, 9000, 6400)]
    out, dev = model.encode(wavs, keep_device=True)
    dev = np.asarray(dev)
    assert dev.shape == (8, 32) and dev.dtype == np.float16
    np.testing.assert_array_equal(dev[: len(wavs)], out.astype(np.float16))
    assert not dev[len(wavs):].any()


@pytest.mark.parametrize("index_type", ["Flat", "IVF8"])
def test_sharded_score_align_matches_single_device(tmp_path, index_type):
    """score_align --sharded_index over Flat AND IVF populate files must
    reproduce the single-device margins on the 8-device mesh (the faiss
    fp16-shard contract covers whatever index was loaded — the IVF tier is
    exactly the regime where sharding matters)."""
    rng = np.random.default_rng(13)
    meta, _ = _write_mining_fixture(
        tmp_path, rng, pairs=(("A_en", "A_de", 9), ("B_en", "B_de", 11))
    )
    K = 4
    ref = _run_mining_stages(meta, tmp_path, "single", K, index_type)
    shd = _run_mining_stages(
        meta, tmp_path, "shard", K, index_type, score_args=("--sharded_index",)
    )
    assert shd.keys() == ref.keys() and ref
    for name in ref:
        # distance-level equivalence is pinned tightly in test_topk; at the
        # margin level a tiny synthetic corpus has near-tied k-th neighbors
        # that fp32 summation-order differences (host loop vs sharded
        # matmul) can swap, shifting the k-NN mean by ~1e-4
        np.testing.assert_allclose(
            np.asarray(shd[name]), np.asarray(ref[name]), rtol=1e-3, atol=1e-5
        )


def test_fused_staging_beyond_default_row_cap():
    """Documents above the old 4096-row default must stay fused once the
    cap is auto-raised: cached rows past index 4096 gather correctly and
    match the upload path bit for bit."""
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache
    from svecalign_tpu.vecalign import batch as B

    embed_cache.enable(rows=5120)
    rng = np.random.default_rng(3)
    d, n_over, n_rows = 16, 3, 4500
    kwargs = dict(
        final_alignment_types=[(1, 1), (1, 2), (2, 1)],
        del_percentile_frac=0.2, width_over2=4, max_size_full_dp=16,
        costs_sample_size=100, num_samps_for_norm=10,
    )
    e0 = rng.standard_normal((n_rows, d)).astype(np.float16)
    e1 = rng.standard_normal((n_rows, d)).astype(np.float16)
    # segments deliberately reference rows ABOVE the old 4096 cap
    i0 = rng.integers(4000, n_rows, size=(n_over, 24)).astype(np.int32)
    i1 = rng.integers(4000, n_rows, size=(n_over, 22)).astype(np.int32)

    pad0 = np.zeros((5120, d), np.float16)
    pad0[:n_rows] = e0
    pad1 = np.zeros((5120, d), np.float16)
    pad1[:n_rows] = e1

    res_up = B.run_staged(B.stage_rows_upload([(e0, i0, e1, i1)]), **kwargs)
    res_dev = B.run_staged(
        B.stage_rows_device([(jnp.asarray(pad0), i0, jnp.asarray(pad1), i1)]),
        **kwargs,
    )
    (a_up, s_up), (a_dev, s_dev) = res_up[0], res_dev[0]
    assert a_up == a_dev
    np.testing.assert_array_equal(np.asarray(s_up), np.asarray(s_dev))


def test_stage_rows_device_dedup_and_sharded():
    """The unique-document bank: pairs sharing a device rows array must
    stage through ONE bank slot (plus zero-slot padding to a power of
    two), and the mesh-sharded staging must match the unsharded result
    exactly — including a pair count that shares documents across pairs."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from svecalign_tpu.vecalign import batch as B

    rng = np.random.default_rng(9)
    R_MAX, d, n_over = 32, 16, 2
    kwargs = dict(
        final_alignment_types=[(1, 1), (0, 1), (1, 0)],
        del_percentile_frac=0.2, width_over2=4, max_size_full_dp=8,
        costs_sample_size=50, num_samps_for_norm=10,
    )

    def make_doc(n):
        e = np.zeros((R_MAX, d), np.float16)
        e[: n * 2] = rng.standard_normal((n * 2, d)).astype(np.float16)
        ids = rng.integers(0, n * 2, size=(n_over, n)).astype(np.int32)
        return jnp.asarray(e), ids

    # 8 pairs from only 3 distinct documents (docA reused on both sides)
    docA, idsA = make_doc(12)
    docB, idsB = make_doc(10)
    docC, idsC = make_doc(12)
    pairs = [(docA, idsA, docB, idsB), (docA, idsA, docC, idsC[:, :10])] * 4

    base = B.run_staged(B.stage_rows_device(pairs), **kwargs)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("pairs",))
    shd = NamedSharding(mesh, P("pairs"))
    sharded = B.run_staged(B.stage_rows_device(pairs, sharding=shd), **kwargs)

    for (a0, s0), (a1, s1) in zip(base, sharded):
        assert a0 == a1
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_score_align_int8_corpus_close_to_fp16(tmp_path):
    """score_align --corpus_quant int8 (file path AND fused registry
    handoff): margins must track the exact fp16 tier within the int8
    quantization noise, and the fused int8 run (device-side requant of the
    registry's live corpus) must match the file-path int8 run the same
    way fused fp16 matches file fp16."""
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache

    rng = np.random.default_rng(31)
    meta, embed_files = _write_mining_fixture(tmp_path, rng)
    K = 4

    ref = _run_mining_stages(meta, tmp_path, "fp16", K)
    got = _run_mining_stages(meta, tmp_path, "int8", K,
                             score_args=("--corpus_quant", "int8"))
    assert got.keys() == ref.keys()
    for name in ref:
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(ref[name]), rtol=0.03, atol=1e-3
        )

    embed_cache.enable(rows=16)
    for path, rows in embed_files.items():
        padded = np.zeros((16, rows.shape[1]), np.float16)
        padded[: rows.shape[0]] = rows.astype(np.float16)
        embed_cache.put(path, rows.shape[0], jnp.asarray(padded))
    fused = _run_mining_stages(meta, tmp_path, "int8_fused", K,
                               score_args=("--corpus_quant", "int8"))
    for name in got:
        np.testing.assert_allclose(
            np.asarray(fused[name]), np.asarray(got[name]), rtol=5e-3, atol=1e-4
        )
