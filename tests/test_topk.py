"""Tests for the TPU k-NN engine (faiss replacement) and index IO."""

import numpy as np
import pytest

from svecalign_tpu.ops.topk import FlatIndex, IVFIndex, normalize_l2, sharded_search
from svecalign_tpu.utils.index_utils import (
    determine_index_type,
    load_index,
    read_flat_index,
    write_flat_index,
    write_ivf_index,
)


def _random_corpus(rng, n, d=64):
    return normalize_l2(rng.standard_normal((n, d)).astype(np.float32))


def test_flat_search_matches_bruteforce():
    rng = np.random.default_rng(0)
    corpus = _random_corpus(rng, 500)
    queries = _random_corpus(rng, 20)

    idx = FlatIndex(dim=64)
    idx.add(corpus)
    d2, ids = idx.search(queries, 8)

    # numpy oracle
    full = (
        np.sum(queries**2, axis=1, keepdims=True)
        + np.sum(corpus**2, axis=1)[None]
        - 2 * queries @ corpus.T
    )
    ref_ids = np.argsort(full, axis=1, kind="stable")[:, :8]
    rows = np.arange(20)[:, None]
    np.testing.assert_allclose(d2, full[rows, ref_ids], rtol=1e-4, atol=1e-5)
    # id sets must match (order can differ on fp ties)
    for r in range(20):
        assert set(ids[r]) == set(ref_ids[r])


def test_self_is_nearest():
    rng = np.random.default_rng(1)
    corpus = _random_corpus(rng, 100)
    idx = FlatIndex(dim=64)
    idx.add(corpus)
    d2, ids = idx.search(corpus[:10], 1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(10))
    assert np.all(d2[:, 0] < 1e-5)


def test_sharded_search_matches_flat():
    import jax

    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    rng = np.random.default_rng(2)
    corpus = _random_corpus(rng, 333)  # deliberately not divisible by 8
    queries = _random_corpus(rng, 17)

    idx = FlatIndex(dim=64)
    idx.add(corpus)
    d_ref, i_ref = idx.search(queries, 10)
    d_got, i_got = sharded_search(queries, corpus, 10)

    np.testing.assert_allclose(d_got, d_ref, rtol=1e-4, atol=1e-5)
    for r in range(17):
        assert set(i_got[r]) == set(i_ref[r])


def test_ivf_full_probe_matches_flat():
    rng = np.random.default_rng(3)
    corpus = _random_corpus(rng, 400)
    queries = _random_corpus(rng, 10)

    flat = FlatIndex(dim=64)
    flat.add(corpus)
    d_ref, i_ref = flat.search(queries, 5)

    ivf = IVFIndex(dim=64, nlist=16, nprobe=16)  # probe all lists = exact
    ivf.train(corpus[:200])
    ivf.add(corpus)
    d_got, i_got = ivf.search(queries, 5)

    np.testing.assert_allclose(d_got, d_ref, rtol=1e-4, atol=1e-5)
    for r in range(10):
        assert set(i_got[r]) == set(i_ref[r])


def test_ivf_partial_probe_recall():
    rng = np.random.default_rng(4)
    corpus = _random_corpus(rng, 2000)
    queries = corpus[:50] + 0.01 * rng.standard_normal((50, 64)).astype(np.float32)

    flat = FlatIndex(dim=64)
    flat.add(corpus)
    _, i_ref = flat.search(queries, 1)

    ivf = IVFIndex(dim=64, nlist=64, nprobe=8)
    ivf.train(corpus)
    ivf.add(corpus)
    _, i_got = ivf.search(queries, 1)
    recall = np.mean(i_got[:, 0] == i_ref[:, 0])
    assert recall >= 0.9, recall


def test_ivf_device_path_matches_host():
    """The fully device-side batch search must agree with the host
    (numpy) path on the same probed lists — same distances, same id sets."""
    rng = np.random.default_rng(7)
    corpus = _random_corpus(rng, 3000)
    queries = _random_corpus(rng, 700)  # > DEVICE_MIN_QUERIES, spans 2 chunks

    ivf = IVFIndex(dim=64, nlist=32, nprobe=6)
    ivf.train(corpus[:1000])
    ivf.add(corpus)

    d_host, i_host = ivf.search(queries, 5, use_device=False)
    d_dev, i_dev = ivf.search(queries, 5, use_device=True)

    np.testing.assert_allclose(d_dev, d_host, rtol=1e-4, atol=1e-5)
    for r in range(queries.shape[0]):
        # -1 padding (fewer than k candidates) must agree too
        assert set(i_dev[r]) == set(i_host[r]), r


def test_ivf_device_path_tiny_lists():
    """k larger than the probed candidate count: both paths pad with
    (+inf, -1) like faiss."""
    rng = np.random.default_rng(8)
    corpus = _random_corpus(rng, 40)
    queries = _random_corpus(rng, 4)
    ivf = IVFIndex(dim=64, nlist=16, nprobe=1)
    ivf.train(corpus)
    ivf.add(corpus)
    d_host, i_host = ivf.search(queries, 10, use_device=False)
    d_dev, i_dev = ivf.search(queries, 10, use_device=True)
    np.testing.assert_array_equal(i_dev == -1, i_host == -1)
    np.testing.assert_allclose(
        np.where(np.isinf(d_dev), 0, d_dev),
        np.where(np.isinf(d_host), 0, d_host),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(np.isinf(d_dev), np.isinf(d_host))


def test_flat_fp16_storage_is_exact():
    """fp16-sourced corpora (the .embed files are fp16) are stored fp16 on
    device and upcast in the kernel — distances must be bit-identical to
    fp32 storage."""
    rng = np.random.default_rng(9)
    corpus16 = _random_corpus(rng, 300).astype(np.float16).astype(np.float32)
    queries = _random_corpus(rng, 10)

    idx_a = FlatIndex(dim=64)
    idx_a.add(corpus16)
    assert idx_a._fp16_exact
    d_a, i_a = idx_a.search(queries, 5)

    idx_b = FlatIndex(dim=64)
    idx_b.add(corpus16)
    idx_b._fp16_exact = False  # force fp32 device storage
    d_b, i_b = idx_b.search(queries, 5)

    np.testing.assert_array_equal(d_a, d_b)
    np.testing.assert_array_equal(i_a, i_b)

    # mixed-precision corpora fall back to fp32 storage
    idx_c = FlatIndex(dim=64)
    idx_c.add(corpus16)
    idx_c.add(_random_corpus(rng, 10))
    assert not idx_c._fp16_exact


def test_faiss_flat_format_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    corpus = _random_corpus(rng, 37, 1024)
    path = tmp_path / "Flat.populate.idx"
    write_flat_index(corpus, path)
    back = read_flat_index(path)
    np.testing.assert_array_equal(back, corpus)

    idx = load_index(path)
    assert isinstance(idx, FlatIndex) and idx.ntotal == 37


def test_reads_committed_faiss_index(example_dir):
    """Byte-level interop: parse the index written by real faiss."""
    corpus = read_flat_index(
        example_dir / "align_0.7_clean_cat3_min1s_embed_indexes/en-de/en/Flat.populate.idx"
    )
    assert corpus.shape == (347, 1024)
    norms = np.linalg.norm(corpus, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_ivf_format_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    corpus = _random_corpus(rng, 300)
    ivf = IVFIndex(dim=64, nlist=8, nprobe=8)
    ivf.train(corpus)
    ivf.add(corpus)
    # the stage filename contract has NO .npz suffix; the writer must not
    # let numpy append one
    path = tmp_path / "IVF8.populate.idx"
    write_ivf_index(ivf, path)
    assert path.exists() and not (tmp_path / "IVF8.populate.idx.npz").exists()
    back = load_index(path)
    d1, i1 = ivf.search(corpus[:5], 3)
    d2, i2 = back.search(corpus[:5], 3)
    np.testing.assert_allclose(d1, d2)
    np.testing.assert_array_equal(i1, i2)


def test_ivf_faiss_container_structure(tmp_path):
    """The IVF file must be a faiss IndexIVFFlat (IwFl) container:
    fourcc, header fields, nested IxF2 quantizer, NoMap direct map,
    'ilar' ArrayInvertedLists — parsed here with raw struct reads
    independent of the reader implementation."""
    import struct

    rng = np.random.default_rng(7)
    corpus = _random_corpus(rng, 120)
    ivf = IVFIndex(dim=64, nlist=4, nprobe=4)
    ivf.train(corpus)
    ivf.add(corpus)
    path = tmp_path / "IVF4.populate.idx"
    write_ivf_index(ivf, path)

    buf = open(path, "rb").read()
    assert buf[:4] == b"IwFl"
    d, = struct.unpack_from("<i", buf, 4)
    ntotal, = struct.unpack_from("<q", buf, 8)
    assert (d, ntotal) == (64, 120)
    # is_trained byte + metric after the two legacy int64s
    assert buf[32] == 1
    assert struct.unpack_from("<i", buf, 33)[0] == 1  # METRIC_L2
    nlist, nprobe = struct.unpack_from("<QQ", buf, 37)
    assert (nlist, nprobe) == (4, 4)
    assert buf[53:57] == b"IxF2"  # nested quantizer
    qoff = 57
    qd, = struct.unpack_from("<i", buf, qoff)
    qn, = struct.unpack_from("<q", buf, qoff + 4)
    assert (qd, qn) == (64, 4)
    cent_count, = struct.unpack_from("<Q", buf, qoff + 33)
    assert cent_count == 4 * 64
    cents = np.frombuffer(buf, np.float32, 4 * 64, qoff + 41).reshape(4, 64)
    np.testing.assert_array_equal(cents, ivf.centroids)
    il_off = qoff + 41 + 4 * 64 * 4 + 1 + 8  # + direct map (NoMap, empty)
    assert buf[il_off : il_off + 4] == b"ilar"
    il_nlist, code_size = struct.unpack_from("<QQ", buf, il_off + 4)
    assert (il_nlist, code_size) == (4, 256)
    assert buf[il_off + 20 : il_off + 24] == b"full"
    n_sizes, = struct.unpack_from("<Q", buf, il_off + 24)
    sizes = np.frombuffer(buf, np.uint64, 4, il_off + 32)
    assert n_sizes == 4 and sizes.sum() == 120


def test_ivf_reads_sprs_size_table(tmp_path):
    """faiss writes a sparse (index, size) table when most lists are
    empty; the reader must handle it."""
    import struct

    rng = np.random.default_rng(8)
    corpus = _random_corpus(rng, 50)
    ivf = IVFIndex(dim=64, nlist=16, nprobe=16)
    ivf.train(corpus[:20])
    ivf.add(corpus)
    full_path = tmp_path / "full.idx"
    write_ivf_index(ivf, full_path)

    # rewrite the size table in sprs form
    buf = bytearray(open(full_path, "rb").read())
    il = buf.index(b"ilar")
    sizes_off = il + 24
    nlist = 16
    sizes = np.frombuffer(bytes(buf), np.uint64, nlist, sizes_off + 8)
    pairs = [(i, int(s)) for i, s in enumerate(sizes) if s > 0]
    sprs = np.array([v for p in pairs for v in p], dtype=np.uint64)
    new_table = (
        b"sprs" + struct.pack("<Q", len(sprs)) + sprs.tobytes()
    )
    old_table_len = 4 + 8 + nlist * 8
    buf[il + 20 : il + 20 + old_table_len] = new_table
    sprs_path = tmp_path / "sprs.idx"
    open(sprs_path, "wb").write(bytes(buf))

    back = load_index(sprs_path)
    d1, i1 = ivf.search(corpus[:5], 3)
    d2, i2 = back.search(corpus[:5], 3)
    np.testing.assert_allclose(d1, d2)
    np.testing.assert_array_equal(i1, i2)


def test_ivf_trained_only_roundtrip(tmp_path):
    """The `${type}.train.idx` file is a trained-but-empty IVF index."""
    rng = np.random.default_rng(9)
    ivf = IVFIndex(dim=64, nlist=8, nprobe=8)
    ivf.train(_random_corpus(rng, 100))
    path = tmp_path / "IVF8.train.idx"
    write_ivf_index(ivf, path)
    back = load_index(path)
    assert back.ntotal == 0
    np.testing.assert_array_equal(back.centroids, ivf.centroids)


def test_determine_index_type():
    assert determine_index_type(347) == "Flat"
    assert determine_index_type(1_000_000) == "Flat"
    assert determine_index_type(10_000_000) == "IVF16384"
    assert determine_index_type(100_000_000) == "IVF131072"


def test_margin_scoring_matches_reference_semantics():
    """Vectorized margin vs a literal transcription of the reference's
    per-row formula (score_align.py:124-161)."""
    from svecalign_tpu.postprocess.score_align import compute_margin

    rng = np.random.default_rng(7)
    x = rng.standard_normal((40, 64)).astype(np.float32)
    y = rng.standard_normal((40, 64)).astype(np.float32)

    ix = FlatIndex(dim=64)
    ix.add(normalize_l2(x))
    iy = FlatIndex(dim=64)
    iy.add(normalize_l2(y))

    got = compute_margin(ix, iy, x.copy(), y.copy(), k=4, margin="ratio")

    xn, yn = normalize_l2(x), normalize_l2(y)
    l2xy, _ = iy.search(xn, 4)
    l2yx, _ = ix.search(yn, 4)
    want = np.empty(40, np.float32)
    for i in range(40):
        a = float(np.dot(xn[i], yn[i]))
        b = ((2 - l2xy[i].mean()) / 2 + (2 - l2yx[i].mean()) / 2) / 2
        want[i] = a / b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tiled_search_matches_dense(monkeypatch):
    rng = np.random.default_rng(8)
    corpus = _random_corpus(rng, 1000)
    queries = _random_corpus(rng, 33)
    idx = FlatIndex(dim=64)
    idx.add(corpus)
    d_ref, i_ref = idx.search(queries, 7)

    monkeypatch.setattr(FlatIndex, "TILE_THRESHOLD", 1)  # force streaming path
    monkeypatch.setattr(FlatIndex, "BLOCK", 128)
    d_got, i_got = idx.search(queries, 7)
    np.testing.assert_allclose(d_got, d_ref, rtol=1e-4, atol=1e-5)
    for r in range(33):
        assert set(i_got[r]) == set(i_ref[r])


def test_fp16_query_upload_close_to_fp32():
    """--query_upload fp16 (half the tunnel bytes): distances within fp16
    input rounding of the exact path, neighbor sets essentially identical."""
    rng = np.random.default_rng(9)
    corpus = _random_corpus(rng, 500)
    queries = _random_corpus(rng, 40)
    idx = FlatIndex(dim=64)
    idx.add(corpus)
    d32, i32 = idx.search(queries, 8)
    d16, i16 = idx.search(queries, 8, upload_dtype="float16")
    np.testing.assert_allclose(d16, d32, rtol=5e-3, atol=5e-3)
    agree = np.mean([len(set(i16[r]) & set(i32[r])) / 8 for r in range(40)])
    assert agree >= 0.95, agree

    # constructor attribute drives the same path
    idx2 = FlatIndex(dim=64, query_upload="float16")
    idx2.add(corpus)
    d16b, _ = idx2.search(queries, 8)
    np.testing.assert_array_equal(d16b, d16)


def test_flat_search_device_queries_matches_host():
    """Device-resident queries (fused pipeline / bench path) must return
    the same neighbors as the staged host path, for both the dense and
    tiled kernels, with results usable straight off the device."""
    import jax.numpy as jnp

    from svecalign_tpu.ops.topk import FlatIndex

    rng = np.random.default_rng(3)
    for n in (200, 70000):  # dense; tiled (needs BLOCK padding)
        idx = FlatIndex(dim=32)
        idx.TILE_THRESHOLD = 1 << 20
        idx.BLOCK = 1 << 12
        corpus = rng.standard_normal((n, 32)).astype(np.float32)
        idx.add(corpus)
        q = rng.standard_normal((64, 32)).astype(np.float32)
        d_host, i_host = idx.search(q, 8)
        d_dev, i_dev = idx.search_device_queries(jnp.asarray(q), 8)
        np.testing.assert_allclose(np.asarray(d_dev), d_host, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i_dev), i_host)


def test_ivf_search_device_queries_matches_host():
    import jax.numpy as jnp

    from svecalign_tpu.ops.topk import IVFIndex

    rng = np.random.default_rng(4)
    corpus = rng.standard_normal((3000, 32)).astype(np.float32)
    idx = IVFIndex(dim=32, nlist=16, nprobe=16)
    idx.train(corpus[:512])
    idx.add(corpus)
    q = rng.standard_normal((700, 32)).astype(np.float32)  # not a chunk multiple
    d_host, i_host = idx.search_device(q, 8)
    d_dev, i_dev = idx.search_device_queries(jnp.asarray(q), 8)
    np.testing.assert_allclose(d_dev, d_host, rtol=1e-6)
    np.testing.assert_array_equal(i_dev, i_host)


def test_sharded_search_device_queries_matches_host():
    import jax.numpy as jnp

    from svecalign_tpu.ops.topk import ShardedFlatIndex

    rng = np.random.default_rng(5)
    corpus = rng.standard_normal((4096, 32)).astype(np.float32)
    idx = ShardedFlatIndex(corpus)
    q = rng.standard_normal((96, 32)).astype(np.float32)
    d_host, i_host = idx.search(q, 8)
    d_dev, i_dev = idx.search_device_queries(jnp.asarray(q), 8)
    np.testing.assert_allclose(d_dev, d_host, rtol=1e-6)
    np.testing.assert_array_equal(i_dev, i_host)


def test_sharded_ivf_matches_single_device_ivf():
    """ShardedIVFIndex must reproduce IVFIndex's probe semantics exactly:
    same neighbor sets and distances with the corpus spread over the
    8-device mesh (the faiss fp16-shard analog for the IVF tier)."""
    from svecalign_tpu.ops.topk import ShardedIVFIndex

    rng = np.random.default_rng(11)
    corpus = normalize_l2(rng.standard_normal((4096, 64)).astype(np.float32))
    queries = normalize_l2(rng.standard_normal((700, 64)).astype(np.float32))

    ivf = IVFIndex(dim=64, nlist=32, nprobe=6)
    ivf.train(corpus[:2048])
    ivf.add(corpus)
    d_ref, i_ref = ivf.search(queries, 8, use_device=True)

    sh = ShardedIVFIndex(ivf)
    assert sh.mesh.devices.size == 8
    d_s, i_s = sh.search(queries, 8)
    np.testing.assert_allclose(d_s, d_ref, rtol=1e-5, atol=1e-5)
    # ids may permute within exact distance ties; compare as sets per row
    same = [set(a) == set(b) for a, b in zip(i_s, i_ref)]
    assert np.mean(same) > 0.99, np.mean(same)


def test_sharded_ivf_device_queries_and_padding():
    """Device-array queries (fused path) and k > probed-candidates padding."""
    import jax.numpy as jnp

    from svecalign_tpu.ops.topk import ShardedIVFIndex

    rng = np.random.default_rng(5)
    corpus = normalize_l2(rng.standard_normal((1000, 32)).astype(np.float32))
    queries = normalize_l2(rng.standard_normal((300, 32)).astype(np.float32))

    ivf = IVFIndex(dim=32, nlist=16, nprobe=16)  # full probe = exact
    ivf.train(corpus)
    ivf.add(corpus)
    flat = FlatIndex(dim=32)
    flat.add(corpus)
    d_ref, i_ref = flat.search(queries, 4)

    sh = ShardedIVFIndex(ivf)
    d_s, i_s = sh.search_device_queries(jnp.asarray(queries), 4)
    np.testing.assert_allclose(d_s, d_ref, rtol=1e-5, atol=1e-5)
    assert (i_s == i_ref).mean() > 0.99


def test_sharded_ivf_rejects_stale_snapshot():
    """Mutating the wrapped IVFIndex after sharding must fail loudly at
    search time, not silently search the old corpus."""
    from svecalign_tpu.ops.topk import ShardedIVFIndex

    rng = np.random.default_rng(3)
    corpus = normalize_l2(rng.standard_normal((1024, 32)).astype(np.float32))
    ivf = IVFIndex(dim=32, nlist=8, nprobe=2)
    ivf.train(corpus[:512])
    ivf.add(corpus)
    sh = ShardedIVFIndex(ivf)

    ivf.nprobe = 4
    with pytest.raises(RuntimeError, match="nprobe changed"):
        sh.search(corpus[:4], 4)
    ivf.nprobe = 2

    ivf.add(corpus[:8])
    with pytest.raises(RuntimeError, match="grew after sharding"):
        sh.search(corpus[:4], 4)


def test_k_beyond_ntotal_pads_identically_across_tiers():
    """faiss IndexFlatL2 returns (nq, k) with +inf/-1 fill when k > ntotal;
    every tier must agree (round-5 fix: ShardedFlatIndex returned only
    ntotal columns, so the degenerate small-corpus margin case silently
    DIFFERED between --sharded_index and the plain path)."""
    from svecalign_tpu.ops.topk import FlatIndex, ShardedFlatIndex

    rng = np.random.default_rng(7)
    corpus = normalize_l2(rng.standard_normal((6, 32)).astype(np.float32))
    queries = corpus[:3]

    flat = FlatIndex(dim=32)
    flat.add(corpus)
    d_f, i_f = flat.search(queries, 16)
    sh = ShardedFlatIndex(corpus)
    d_s, i_s = sh.search(queries, 16)

    for d, i in ((d_f, i_f), (d_s, i_s)):
        assert d.shape == (3, 16) and i.shape == (3, 16)
        assert np.isinf(d[:, 6:]).all()
        assert (i[:, 6:] == -1).all()
    np.testing.assert_allclose(d_s[:, :6], d_f[:, :6], rtol=1e-5, atol=1e-5)
    assert (i_s[:, 0] == i_f[:, 0]).all()


def test_int8_corpus_matches_quantized_oracle():
    """--corpus_quant int8: distances equal the numpy L2 oracle over the
    DEQUANTIZED corpus (internally consistent geometry), within the bf16
    query rounding of the single-pass matmul."""
    rng = np.random.default_rng(21)
    corpus = _random_corpus(rng, 500)
    queries = _random_corpus(rng, 20)

    idx = FlatIndex(dim=64, corpus_quant="int8")
    idx.add(corpus)
    d2, ids = idx.search(queries, 8)

    # host oracle over the quantized corpus
    amax = np.max(np.abs(corpus), axis=1)
    scales = np.where(amax == 0, 1.0, amax / 127.0).astype(np.float32)
    deq = np.clip(np.rint(corpus / scales[:, None]), -127, 127) * scales[:, None]
    full = (
        np.sum(queries**2, axis=1, keepdims=True)
        + np.sum(deq**2, axis=1)[None]
        - 2 * queries @ deq.T
    )
    rows = np.arange(20)[:, None]
    np.testing.assert_allclose(d2, np.take_along_axis(full, ids, 1),
                               rtol=0, atol=0.02)
    # vs the fp32 exact tier: neighbor sets nearly identical (~1e-3 noise)
    exact = FlatIndex(dim=64)
    exact.add(corpus)
    _, ids_ref = exact.search(queries, 8)
    overlap = np.mean([len(set(ids[r]) & set(ids_ref[r])) / 8 for r in range(20)])
    assert overlap >= 0.9, overlap


def test_int8_corpus_self_is_nearest():
    rng = np.random.default_rng(22)
    corpus = _random_corpus(rng, 100)
    idx = FlatIndex(dim=64, corpus_quant="int8")
    idx.add(corpus)
    d2, ids = idx.search(corpus[:10], 1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(10))
    assert np.all(d2[:, 0] < 5e-3)  # quantization floor, not exact zero


def test_int8_tiled_matches_dense(monkeypatch):
    rng = np.random.default_rng(23)
    corpus = _random_corpus(rng, 1000)
    queries = _random_corpus(rng, 33)
    idx = FlatIndex(dim=64, corpus_quant="int8")
    idx.add(corpus)
    d_ref, i_ref = idx.search(queries, 7)

    monkeypatch.setattr(FlatIndex, "TILE_THRESHOLD", 1)  # force streaming
    monkeypatch.setattr(FlatIndex, "BLOCK", 128)
    idx._device_cache_q8 = None  # cache was built unpadded
    d_got, i_got = idx.search(queries, 7)
    np.testing.assert_allclose(d_got, d_ref, rtol=1e-4, atol=1e-5)
    for r in range(33):
        assert set(i_got[r]) == set(i_ref[r])


def test_int8_fused_device_corpus_matches_host_quant():
    """Fused pipeline handoff: a device-assembled corpus
    (set_device_corpus) flipped to int8 re-quantizes ON DEVICE and must
    agree with the host-quantized int8 path (same rows both ways)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(24)
    corpus = _random_corpus(rng, 300)
    queries = _random_corpus(rng, 16)

    host = FlatIndex(dim=64, corpus_quant="int8")
    host.add(corpus)
    d_h, i_h = host.search(queries, 8)

    fused = FlatIndex(dim=64, corpus_quant="int8")
    fused.add(corpus)  # ntotal bookkeeping (mirrors prep_index)
    pad = (-300) % FlatIndex.BLOCK
    rows = jnp.asarray(np.pad(corpus, ((0, pad), (0, 0))).astype(np.float16))
    fused.set_device_corpus(rows, 300)
    d_f, i_f = fused.search(queries, 8)

    # device path normalizes + quantizes on device from fp16 rows: codes
    # can differ by 1 ulp of rounding, so compare geometry not bits
    np.testing.assert_allclose(d_f, d_h, rtol=0, atol=0.02)
    overlap = np.mean([len(set(i_f[r]) & set(i_h[r])) / 8 for r in range(16)])
    assert overlap >= 0.9, overlap


def test_int8_k_beyond_ntotal_pads():
    rng = np.random.default_rng(25)
    corpus = _random_corpus(rng, 6, d=32)
    idx = FlatIndex(dim=32, corpus_quant="int8")
    idx.add(corpus)
    d2, ids = idx.search(corpus[:3], 16)
    assert d2.shape == (3, 16) and ids.shape == (3, 16)
    assert np.isinf(d2[:, 6:]).all() and (ids[:, 6:] == -1).all()


def test_int8_sharded_matches_single_device_int8():
    """ShardedFlatIndex(corpus_quant="int8"): the two memory levers
    compose — per-shard bf16 single-pass search + ICI merge must agree
    with the single-device int8 tier (same quantized geometry; shard
    padding rows carry inf sq so they never win)."""
    import jax

    from svecalign_tpu.ops.topk import ShardedFlatIndex

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(26)
    corpus = _random_corpus(rng, 333)  # not divisible by 8
    queries = _random_corpus(rng, 17)

    flat = FlatIndex(dim=64, corpus_quant="int8")
    flat.add(corpus)
    d_ref, i_ref = flat.search(queries, 10)

    sh = ShardedFlatIndex(corpus, corpus_quant="int8")
    d_got, i_got = sh.search(queries, 10)

    np.testing.assert_allclose(d_got, d_ref, rtol=1e-3, atol=1e-4)
    for r in range(17):
        assert len(set(i_got[r]) & set(i_ref[r])) >= 9  # bf16 tie jitter

    # device-query entry + k > ntotal padding
    d_p, i_p = sh.search(queries, 400)
    assert d_p.shape == (17, 400)
    assert np.isinf(d_p[:, 333:]).all() and (i_p[:, 333:] == -1).all()
