"""TPU-native exact k-NN: batched matmul + top-k over (sharded) corpora.

Replaces faiss-gpu (reference svecalign/utils/mining_utils.py:14-42,
postprocess/score_align.py:118-161): similarities are one MXU matmul,
selection is ``jax.lax.top_k``, and large corpora shard across devices with
``shard_map`` — per-shard top-k then a gather+merge over ICI, instead of
faiss' fp16-shard GPU search.

Distance semantics match faiss IndexFlatL2 on L2-normalized vectors:
``search`` returns squared-L2 distances ``||q||^2 + ||c||^2 - 2 q.c``
(computed with true norms, not assuming exact unit vectors) so downstream
margin code can keep the reference's ``cos = (2 - L2^2) / 2`` conversion.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def normalize_l2(x: np.ndarray) -> np.ndarray:
    """In-place-style L2 normalization matching faiss.normalize_L2 (float32)."""
    x = np.asarray(x, dtype=np.float32)
    norms = np.sqrt(np.sum(x * x, axis=1, keepdims=True))
    return x / np.where(norms == 0, 1.0, norms)


def _is_device_array(x) -> bool:
    """True for jax device arrays (np.ndarray excluded): the fused
    pipeline hands these in and they must skip all host staging."""
    return isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray)


@jax.jit
def normalize_rows_device(rows: Array):
    """Device-side L2 normalization (fp32), same zero-row convention as
    :func:`normalize_l2`; used on fused-pipeline query rows."""
    x = rows.astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / jnp.where(norms == 0, 1.0, norms)


@jax.jit
def _normalize_corpus(rows: Array, n: Array):
    """fp16 gathered rows -> (fp32 L2-normalized corpus, corpus_sq) with
    inf corpus_sq on padding rows (device side of FlatIndex.set_device_corpus).
    ``n`` is traced so one program serves every corpus size per shape bucket."""
    x = normalize_rows_device(rows)
    valid = jnp.arange(x.shape[0]) < n
    sq = jnp.where(valid, jnp.sum(x * x, axis=1), jnp.inf)
    return jnp.where(valid[:, None], x, 0.0), sq


@partial(jax.jit, static_argnames=("k",))
def _search_dense(queries: Array, corpus: Array, corpus_sq: Array, k: int):
    queries = queries.astype(jnp.float32)  # fp16 query uploads upcast here
    sims = jnp.dot(
        queries,
        corpus.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    d2 = q_sq + corpus_sq[None, :] - 2.0 * sims
    neg_d, idx = jax.lax.top_k(-d2, k)
    return -neg_d, idx


@partial(jax.jit, static_argnames=("k", "block"))
def _search_dense_tiled(queries: Array, corpus: Array, corpus_sq: Array, k: int, block: int):
    """Streaming exact search: scan corpus blocks, keep a running top-k.

    HBM cost is O(nq * block) instead of O(nq * N) — the big-corpus path.
    Corpus must be padded to a multiple of ``block`` with corpus_sq = +inf
    on padding rows.
    """
    n_blocks = corpus.shape[0] // block
    queries = queries.astype(jnp.float32)  # fp16 query uploads upcast here
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    nq = queries.shape[0]

    corpus_b = corpus.reshape(n_blocks, block, corpus.shape[1])
    corpus_sq_b = corpus_sq.reshape(n_blocks, block)

    def step(carry, inp):
        best_d, best_i = carry
        c_blk, csq_blk, blk_id = inp
        sims = jnp.dot(
            queries, c_blk.T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = q_sq + csq_blk[None, :] - 2.0 * sims
        neg_d, idx = jax.lax.top_k(-d2, k)
        cand_d = jnp.concatenate([best_d, -neg_d], axis=1)
        cand_i = jnp.concatenate([best_i, idx + blk_id * block], axis=1)
        neg_m, pos = jax.lax.top_k(-cand_d, k)
        best_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (-neg_m, best_i), None

    init = (
        jnp.full((nq, k), jnp.inf, jnp.float32),
        jnp.zeros((nq, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        step, init, (corpus_b, corpus_sq_b, jnp.arange(n_blocks, dtype=jnp.int32))
    )
    return best_d, best_i


def _quantize_rows_host(corpus: np.ndarray):
    """Symmetric per-row int8 quantization of a corpus (host side).

    Returns ``(codes int8, scales f32, corpus_sq f32)`` where
    ``codes * scales[:, None]`` is the dequantized corpus and ``corpus_sq``
    is computed from the DEQUANTIZED rows — so distances produced with
    these tensors are exactly the L2 geometry of the quantized corpus
    (internally consistent; ~1e-3 relative vs the fp32 original on
    L2-normalized embeddings)."""
    corpus = np.asarray(corpus, dtype=np.float32)
    amax = np.max(np.abs(corpus), axis=1) if corpus.size else np.zeros(0)
    scales = np.where(amax == 0, 1.0, amax / 127.0).astype(np.float32)
    codes = np.clip(np.rint(corpus / scales[:, None]), -127, 127).astype(np.int8)
    deq = codes.astype(np.float32) * scales[:, None]
    corpus_sq = np.sum(deq * deq, axis=1).astype(np.float32)
    return codes, scales, corpus_sq


@jax.jit
def _quantize_corpus_device(corpus: Array, corpus_sq: Array):
    """Device-side mirror of :func:`_quantize_rows_host` for the fused
    pipeline's device-assembled corpora (`FlatIndex.set_device_corpus`
    stores fp32-normalized rows + inf-padded squared norms; padding rows
    keep ``corpus_sq = inf`` so they never win a top-k)."""
    amax = jnp.max(jnp.abs(corpus), axis=1)
    scales = jnp.where(amax == 0, 1.0, amax / 127.0)
    codes = jnp.clip(jnp.round(corpus / scales[:, None]), -127, 127).astype(jnp.int8)
    deq = codes.astype(jnp.float32) * scales[:, None]
    sq = jnp.sum(deq * deq, axis=1)
    return codes, scales.astype(jnp.float32), jnp.where(
        jnp.isinf(corpus_sq), jnp.inf, sq
    )


@partial(jax.jit, static_argnames=("k",))
def _search_dense_q8(queries: Array, codes: Array, scales: Array,
                     corpus_sq: Array, k: int):
    """Exact search over an int8-quantized corpus.

    int8 codes (|c| <= 127) are exactly representable in bf16, so the
    similarity matmul runs as ONE bf16 MXU pass (vs the fp32 tier's 6-pass
    HIGHEST) — the int8 tier trades ~1e-3 distance noise for half the HBM
    of fp16 and a single-pass matmul. Queries cast to bf16 (noise of the
    same order as the corpus quantization itself)."""
    sims = jnp.dot(
        queries.astype(jnp.bfloat16),
        codes.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * scales[None, :]
    qf = queries.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)
    d2 = q_sq + corpus_sq[None, :] - 2.0 * sims
    neg_d, idx = jax.lax.top_k(-d2, k)
    return -neg_d, idx


@partial(jax.jit, static_argnames=("k", "block"))
def _search_dense_tiled_q8(queries: Array, codes: Array, scales: Array,
                           corpus_sq: Array, k: int, block: int):
    """Streaming variant of :func:`_search_dense_q8` (same block scan as
    :func:`_search_dense_tiled`; corpus padded to a ``block`` multiple with
    ``corpus_sq = inf`` on padding rows)."""
    n_blocks = codes.shape[0] // block
    qb = queries.astype(jnp.bfloat16)
    qf = queries.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)
    nq = queries.shape[0]

    codes_b = codes.reshape(n_blocks, block, codes.shape[1])
    scales_b = scales.reshape(n_blocks, block)
    corpus_sq_b = corpus_sq.reshape(n_blocks, block)

    def step(carry, inp):
        best_d, best_i = carry
        c_blk, s_blk, csq_blk, blk_id = inp
        sims = jnp.dot(
            qb, c_blk.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * s_blk[None, :]
        d2 = q_sq + csq_blk[None, :] - 2.0 * sims
        neg_d, idx = jax.lax.top_k(-d2, k)
        cand_d = jnp.concatenate([best_d, -neg_d], axis=1)
        cand_i = jnp.concatenate([best_i, idx + blk_id * block], axis=1)
        neg_m, pos = jax.lax.top_k(-cand_d, k)
        best_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (-neg_m, best_i), None

    init = (
        jnp.full((nq, k), jnp.inf, jnp.float32),
        jnp.zeros((nq, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        step, init,
        (codes_b, scales_b, corpus_sq_b, jnp.arange(n_blocks, dtype=jnp.int32)),
    )
    return best_d, best_i


def _pad_to_k(d2: np.ndarray, idx: np.ndarray, k: int):
    """Pad search results out to (nq, k): faiss IndexFlatL2 always returns
    k columns, with missing neighbors as +inf distance / -1 id. Every index
    tier (Flat/ShardedFlat/IVF/ShardedIVF) routes through this so the
    degenerate k > ntotal case behaves identically across tiers."""
    if d2.shape[1] >= k:
        return d2, idx
    nq, missing = d2.shape[0], k - d2.shape[1]
    d2 = np.concatenate([d2, np.full((nq, missing), np.inf, d2.dtype)], axis=1)
    idx = np.concatenate([idx, np.full((nq, missing), -1, idx.dtype)], axis=1)
    return d2, idx


class FlatIndex:
    """Exact (Flat) index: the whole corpus lives in device memory.

    ``add`` accumulates vectors; ``search`` returns (squared L2, ids), both
    shaped (n_queries, k) — the faiss IndexFlatL2 contract.
    """

    def __init__(self, dim: int = 1024, query_upload: str = "float32",
                 corpus_quant: str = "none"):
        self.dim = dim
        # "float16" halves query staging bytes over the tunnel (~1e-3
        # relative distance noise); opt-in via score_align --query_upload
        self.query_upload = query_upload
        # "int8": per-row symmetric int8 device corpus — half fp16's HBM
        # (doubling single-chip corpus headroom, the ladder step BASELINE.md
        # reserves before IVF) and a single-pass bf16 matmul instead of the
        # exact tier's 6-pass HIGHEST. ~1e-3 relative distance noise;
        # opt-in via score_align --corpus_quant int8
        assert corpus_quant in ("none", "int8"), corpus_quant
        self.corpus_quant = corpus_quant
        self._chunks = []
        self._device_cache = None  # (corpus, corpus_sq) on device
        self._device_cache_q8 = None  # (codes, scales, corpus_sq) on device
        self._fp16_exact = True  # all added vectors round-trip through fp16

    @property
    def ntotal(self) -> int:
        return sum(c.shape[0] for c in self._chunks)

    def add(self, vectors: np.ndarray) -> None:
        vectors = np.asarray(vectors, dtype=np.float32)
        assert vectors.shape[1] == self.dim
        if self._fp16_exact and not np.array_equal(
            vectors, vectors.astype(np.float16).astype(np.float32)
        ):
            self._fp16_exact = False
        self._chunks.append(vectors)
        self._device_cache = None
        self._device_cache_q8 = None

    @property
    def corpus(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros((0, self.dim), dtype=np.float32)
        if len(self._chunks) > 1:
            self._chunks = [np.concatenate(self._chunks, axis=0)]
        return self._chunks[0]

    # above this many similarity-matrix cells, stream the corpus in blocks
    TILE_THRESHOLD = 1 << 28
    BLOCK = 1 << 15

    def _device_corpus(self, tiled: bool):
        """Upload the corpus (+ padding for the tiled path) once; cache.

        When every added vector is exactly fp16-representable (the .embed
        files are fp16, embedding_utils.py upcasts), the device copy is
        fp16: half the upload bytes and HBM, upcast exactly inside the
        search kernels — bit-identical distances."""
        if self._device_cache is None:
            n = self.ntotal
            if tiled:
                pad = (-n) % self.BLOCK
                corpus = np.pad(self.corpus, ((0, pad), (0, 0)))
                corpus_sq = np.sum(corpus * corpus, axis=1)
                corpus_sq[n:] = np.inf  # padding rows never win
            else:
                corpus = self.corpus
                corpus_sq = np.sum(corpus * corpus, axis=1)
            if self._fp16_exact:
                corpus = corpus.astype(np.float16)
            self._device_cache = (jnp.asarray(corpus), jnp.asarray(corpus_sq))
        return self._device_cache

    def _device_corpus_q8(self, tiled: bool):
        """int8 tier of :meth:`_device_corpus`: upload codes (quarter the
        fp32 bytes) + per-row scales once; cache. A fused device-assembled
        corpus (``set_device_corpus``) is re-quantized ON DEVICE — no rows
        cross the host boundary either way."""
        if self._device_cache_q8 is None:
            if self._device_cache is not None and not self._chunks:
                # fused pipeline: quantize the device-resident corpus
                self._device_cache_q8 = _quantize_corpus_device(*self._device_cache)
            else:
                n = self.ntotal
                codes, scales, corpus_sq = _quantize_rows_host(self.corpus)
                if tiled:
                    pad = (-n) % self.BLOCK
                    codes = np.pad(codes, ((0, pad), (0, 0)))
                    scales = np.pad(scales, (0, pad), constant_values=1.0)
                    corpus_sq = np.pad(corpus_sq, (0, pad),
                                       constant_values=np.inf)
                self._device_cache_q8 = (
                    jnp.asarray(codes), jnp.asarray(scales),
                    jnp.asarray(corpus_sq),
                )
        return self._device_cache_q8

    def set_device_corpus(self, rows_fp16, n_valid: int) -> None:
        """Install a device-assembled corpus (fused pipeline, no upload).

        ``rows_fp16`` is an (n_padded, dim) fp16 device array of UNnormalized
        embedding rows gathered from ``utils/embed_cache.py`` (n_padded a
        multiple of ``BLOCK``); L2 normalization happens on device, padding
        rows get ``corpus_sq = inf`` so they never win a top-k. Distances
        then match the host upload path up to fp32 summation order in the
        norms (~1e-7 relative)."""
        assert rows_fp16.shape[0] % self.BLOCK == 0, rows_fp16.shape
        assert n_valid == self.ntotal, (n_valid, self.ntotal)
        self._device_cache = _normalize_corpus(rows_fp16, jnp.int32(n_valid))
        self._device_cache_q8 = None

    def _search_core(self, queries, k_eff: int):
        """Shared search over device-resident queries -> device (d2, idx)."""
        tiled = self.ntotal * queries.shape[0] > self.TILE_THRESHOLD
        if self.corpus_quant == "int8":
            codes, scales, corpus_sq = self._device_corpus_q8(tiled)
            if not tiled and codes.shape[0] != self.ntotal:
                tiled = True  # cache built padded (or fused); reuse tiled
            if tiled and codes.shape[0] % self.BLOCK != 0:
                self._device_cache_q8 = None  # rebuild with padding
                codes, scales, corpus_sq = self._device_corpus_q8(True)
            if tiled:
                return _search_dense_tiled_q8(
                    queries, codes, scales, corpus_sq, k_eff, self.BLOCK
                )
            return _search_dense_q8(queries, codes, scales, corpus_sq, k_eff)
        corpus, corpus_sq = self._device_corpus(tiled)
        if not tiled and corpus.shape[0] != self.ntotal:
            # cache was built padded for the tiled path; reuse it tiled
            tiled = True
        if tiled and corpus.shape[0] % self.BLOCK != 0:
            self._device_cache = None  # rebuild with padding
            corpus, corpus_sq = self._device_corpus(True)
        if tiled:
            return _search_dense_tiled(queries, corpus, corpus_sq, k_eff, self.BLOCK)
        return _search_dense(queries, corpus, corpus_sq, k_eff)

    def search_device_queries(self, queries, k: int):
        """Device-to-device search: ``queries`` is an (nq, dim) device array
        (any float dtype; upcast in-kernel) and the (d2, idx) results stay
        on device — nothing crosses the host boundary. Requires
        ``ntotal >= k`` (no column padding on this path). Distinct from
        ``IVFIndex.search_device``, which stages HOST queries but searches
        on device."""
        assert self.ntotal >= k, (self.ntotal, k)
        return self._search_core(queries, k)

    def search(
        self, queries: np.ndarray, k: int, upload_dtype: str = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """``upload_dtype="float16"`` (or ``query_upload`` at construction)
        stages the queries over the (tunnel-limited) host->device link at
        half the bytes; the kernel upcasts on device. ~1e-3 relative noise
        on the distances — opt-in via score_align --query_upload fp16.
        Device-array queries pass through with no staging conversion."""
        if _is_device_array(queries):
            pass  # already on device: use as-is (fused pipeline path)
        elif (upload_dtype or self.query_upload) == "float16":
            queries = jnp.asarray(np.asarray(queries).astype(np.float16))
        else:
            queries = jnp.asarray(queries, dtype=jnp.float32)
        k_eff = min(k, self.ntotal)
        d2, idx = self._search_core(queries, k_eff)
        return _pad_to_k(np.asarray(d2), np.asarray(idx), k)


def shard_corpus(
    corpus: np.ndarray, mesh: Optional[Mesh] = None, axis: str = "data"
):
    """Pad + device_put a corpus row-sharded over the mesh; returns the
    reusable (mesh, device corpus, device validity mask) triple."""
    if mesh is None:
        devices = np.array(jax.devices())
        mesh = Mesh(devices, (axis,))
    n_dev = mesh.devices.size
    n = corpus.shape[0]
    pad = (-n) % n_dev
    corpus_p = np.pad(corpus, ((0, pad), (0, 0)))
    valid = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    corpus_j = jax.device_put(jnp.asarray(corpus_p), NamedSharding(mesh, P(axis, None)))
    valid_j = jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P(axis)))
    return mesh, corpus_j, valid_j


def sharded_search(
    queries: np.ndarray,
    corpus: np.ndarray,
    k: int,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    prepared=None,
    query_upload: str = "float32",
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN with the corpus sharded row-wise across a device mesh.

    Each device holds one corpus shard (HBM-resident), computes its local
    matmul + top-k, then the per-shard candidates are gathered over ICI and
    re-reduced — the TPU equivalent of faiss' ``fp16-shard`` multi-GPU
    search (reference score_align.py:48-49,205-217). Pass ``prepared`` from
    :func:`shard_corpus` to reuse the device-resident corpus across calls.
    """
    n, d = corpus.shape
    k = min(k, n)
    if prepared is None:
        prepared = shard_corpus(corpus, mesh, axis)
    mesh, corpus_j, valid_j = prepared
    n_dev = mesh.devices.size

    if _is_device_array(queries):
        # already on device (fused pipeline): no host staging; the jit
        # broadcasts the replicated operand across the mesh over ICI
        queries = queries.astype(jnp.float32)
    elif query_upload == "float16":
        # half the staging bytes; the shard-local matmul upcasts exactly
        queries = jnp.asarray(np.asarray(queries).astype(np.float16)).astype(
            jnp.float32
        )
    else:
        queries = jnp.asarray(queries, dtype=jnp.float32)

    per_shard = corpus_j.shape[0] // n_dev
    kk = min(k, per_shard)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,  # all_gather output is replicated; the static
        # rep-checker can't see that through top_k/take_along_axis
    )
    def search_and_merge(q, c_shard, v_shard):
        c_shard = c_shard.astype(jnp.float32)  # exact upcast of fp16 shards
        sims = jnp.dot(
            q, c_shard.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)
        c_sq = jnp.sum(c_shard * c_shard, axis=1)
        d2 = q_sq + c_sq[None, :] - 2.0 * sims
        d2 = jnp.where(v_shard[None, :] > 0, d2, jnp.inf)
        neg_d, idx = jax.lax.top_k(-d2, kk)
        # global ids: offset by this shard's position
        offset = jax.lax.axis_index(axis) * per_shard
        idx = idx + offset

        # final merge ON DEVICE: gather the per-shard candidate lists over
        # ICI (shard-major along the candidate axis, matching the host
        # merge's stable tie order) and re-reduce with one top_k — no
        # stacked-layout host reshuffle, and only (nq, k) crosses D2H
        d_all = jax.lax.all_gather(-neg_d, axis, axis=1, tiled=True)  # (nq, n_dev*kk)
        i_all = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        neg_best, pos = jax.lax.top_k(-d_all, min(k, n_dev * kk))
        return -neg_best, jnp.take_along_axis(i_all, pos, axis=1)

    d_best, i_best = search_and_merge(queries, corpus_j, valid_j)
    return np.asarray(d_best), np.asarray(i_best)


def shard_corpus_q8(
    corpus: np.ndarray, mesh: Optional[Mesh] = None, axis: str = "data"
):
    """int8 tier of :func:`shard_corpus`: quantize per-row on host, then
    shard (codes, scales, dequant-consistent sq) over the mesh — quarter
    the fp32 staging bytes and half fp16's per-shard HBM."""
    if mesh is None:
        devices = np.array(jax.devices())
        mesh = Mesh(devices, (axis,))
    n_dev = mesh.devices.size
    n = corpus.shape[0]
    codes, scales, corpus_sq = _quantize_rows_host(corpus)
    pad = (-n) % n_dev
    codes = np.pad(codes, ((0, pad), (0, 0)))
    scales = np.pad(scales, (0, pad), constant_values=1.0)
    # inf sq marks padding rows: they never win a top-k (same convention
    # as the valid mask of the fp path)
    corpus_sq = np.pad(corpus_sq, (0, pad), constant_values=np.inf)
    row_sh = NamedSharding(mesh, P(axis))
    return (
        mesh,
        jax.device_put(jnp.asarray(codes), NamedSharding(mesh, P(axis, None))),
        jax.device_put(jnp.asarray(scales), row_sh),
        jax.device_put(jnp.asarray(corpus_sq), row_sh),
    )


def sharded_search_q8(
    queries,
    n_total: int,
    k: int,
    prepared,
    query_upload: str = "float32",
) -> Tuple[Array, Array]:
    """:func:`sharded_search` over an int8-quantized sharded corpus: each
    shard runs the single-pass bf16 matmul of :func:`_search_dense_q8`
    locally, then the per-shard candidates merge over ICI exactly like the
    fp path. ``prepared`` comes from :func:`shard_corpus_q8`."""
    mesh, codes_j, scales_j, sq_j = prepared
    k = min(k, n_total)
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    if _is_device_array(queries):
        queries = queries.astype(jnp.float32)
    elif query_upload == "float16":
        queries = jnp.asarray(np.asarray(queries).astype(np.float16)).astype(
            jnp.float32
        )
    else:
        queries = jnp.asarray(queries, dtype=jnp.float32)

    per_shard = codes_j.shape[0] // n_dev
    kk = min(k, per_shard)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,  # see sharded_search
    )
    def search_and_merge(q, c_shard, s_shard, sq_shard):
        sims = jnp.dot(
            q.astype(jnp.bfloat16), c_shard.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * s_shard[None, :]
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)
        d2 = q_sq + sq_shard[None, :] - 2.0 * sims
        neg_d, idx = jax.lax.top_k(-d2, kk)
        offset = jax.lax.axis_index(axis) * per_shard
        idx = idx + offset
        d_all = jax.lax.all_gather(-neg_d, axis, axis=1, tiled=True)
        i_all = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        neg_best, pos = jax.lax.top_k(-d_all, min(k, n_dev * kk))
        return -neg_best, jnp.take_along_axis(i_all, pos, axis=1)

    return search_and_merge(queries, codes_j, scales_j, sq_j)


class ShardedFlatIndex:
    """Flat index whose corpus is sharded row-wise across the device mesh.

    Same ``search`` contract as :class:`FlatIndex`; use for corpora that
    exceed one chip's HBM (the TPU analog of faiss fp16-shard).
    ``corpus_quant="int8"`` composes the two memory levers: row-sharding
    x half-of-fp16 per-shard HBM (~1e-3 distance noise)."""

    def __init__(
        self,
        corpus: np.ndarray,
        mesh: Optional[Mesh] = None,
        query_upload: str = "float32",
        corpus_quant: str = "none",
    ):
        self.corpus = np.asarray(corpus, dtype=np.float32)
        self.dim = self.corpus.shape[1]
        self.query_upload = query_upload
        assert corpus_quant in ("none", "int8"), corpus_quant
        self.corpus_quant = corpus_quant
        if corpus_quant == "int8":
            self._prepared = shard_corpus_q8(self.corpus, mesh)
        else:
            # fp16 device shards when lossless (half the upload + HBM)
            dev = self.corpus
            if np.array_equal(dev, dev.astype(np.float16).astype(np.float32)):
                dev = dev.astype(np.float16)
            self._prepared = shard_corpus(dev, mesh)  # device-resident

    @property
    def ntotal(self) -> int:
        return self.corpus.shape[0]

    def _search(self, queries, k: int):
        if self.corpus_quant == "int8":
            return sharded_search_q8(
                queries, self.ntotal, k,
                prepared=self._prepared, query_upload=self.query_upload,
            )
        return sharded_search(
            queries, self.corpus, k,
            prepared=self._prepared, query_upload=self.query_upload,
        )

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        d2, idx = self._search(queries, min(k, self.ntotal))
        return _pad_to_k(np.asarray(d2), np.asarray(idx), k)

    def search_device_queries(self, queries, k: int):
        """Fused-pipeline entry: device-array queries, no host staging —
        the replicated operand rides ICI to every shard; only the merged
        (nq, k) results cross D2H."""
        assert self.ntotal >= k, (self.ntotal, k)
        return self._search(queries, k)


# ---------------------------------------------------------------------------
# IVF: k-means coarse quantizer + nprobe search (approximate, for the
# tens-of-millions regime where a dense matmul per query batch is wasteful)
# ---------------------------------------------------------------------------


@jax.jit
def _assign_to_centroids(vectors: Array, centroids: Array) -> Array:
    sims = jnp.dot(vectors, centroids.T, preferred_element_type=jnp.float32)
    return jnp.argmax(sims, axis=1)


@partial(jax.jit, static_argnames=("n_iter",))
def _kmeans_iter(data: Array, centroids: Array, n_iter: int):
    nlist = centroids.shape[0]

    def step(c, _):
        sims = jnp.dot(
            data, c.T, preferred_element_type=jnp.float32,
        )
        assign = jnp.argmax(sims, axis=1)
        # segment_sum instead of a one-hot matmul: avoids materializing the
        # (n, nlist) assignment matrix
        sums = jax.ops.segment_sum(data, assign, num_segments=nlist)
        counts = jax.ops.segment_sum(
            jnp.ones((data.shape[0],), jnp.float32), assign, num_segments=nlist
        )[:, None]
        new_c = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), c)
        norms = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        new_c = new_c / jnp.maximum(norms, 1e-12)
        return new_c, None

    out, _ = jax.lax.scan(step, centroids, None, length=n_iter)
    return out


@partial(jax.jit, static_argnames=("nprobe", "block"))
def _ivf_probe_and_blocks(queries, centroids, row_list, nprobe, block):
    """Probe the nprobe nearest lists per query and mark which corpus
    blocks (of ``block`` rows, corpus sorted by list) hold candidates."""
    c_sims = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(c_sims, nprobe)  # (m, nprobe)
    nlist = centroids.shape[0]
    m = queries.shape[0]
    probe_mask = (
        jnp.zeros((m, nlist), jnp.bool_)
        .at[jnp.arange(m)[:, None], probe]
        .set(True)
    )
    mask_any = jnp.any(probe_mask, axis=0)  # (nlist,)
    rows_needed = jnp.where(row_list >= 0, mask_any[jnp.maximum(row_list, 0)], False)
    block_needed = jnp.any(rows_needed.reshape(-1, block), axis=1)
    return probe_mask, block_needed, jnp.sum(block_needed.astype(jnp.int32))


@partial(jax.jit, static_argnames=("k", "n_blocks", "block"))
def _ivf_gather_search(
    queries, probe_mask, block_needed, vec_blocks, sq_blocks, list_blocks,
    id_blocks, k, n_blocks, block,
):
    """Gather the ``n_blocks`` needed corpus blocks and score them densely.

    The last block of each *_blocks array is an all-padding block
    (sq=+inf, list=-1, id=-1) that absorbs the nonzero fill.
    """
    pad_block = vec_blocks.shape[0] - 1
    (blocks,) = jnp.nonzero(block_needed, size=n_blocks, fill_value=pad_block)
    cand_v = vec_blocks[blocks].reshape(-1, vec_blocks.shape[-1])  # (G*B, d)
    cand_sq = sq_blocks[blocks].reshape(-1)
    cand_list = list_blocks[blocks].reshape(-1)
    cand_id = id_blocks[blocks].reshape(-1)

    sims = jnp.dot(
        queries, cand_v.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    q_sq = jnp.sum(queries * queries, axis=1, keepdims=True)
    d2 = q_sq + cand_sq[None, :] - 2.0 * sims
    probed = (cand_list[None, :] >= 0) & jnp.take(
        probe_mask, jnp.maximum(cand_list, 0), axis=1
    )
    d2 = jnp.where(probed, d2, jnp.inf)
    neg_d, pos = jax.lax.top_k(-d2, k)
    ids = cand_id[pos]
    return jnp.where(jnp.isinf(-neg_d), jnp.inf, -neg_d), jnp.where(
        jnp.isinf(-neg_d), -1, ids
    )


class IVFIndex:
    """Inverted-file index: k-means centroids + per-list storage.

    Training (Lloyd iterations) and search (centroid matmul -> probe lists
    -> exact top-k within the probed subset) both run on device. Large
    query batches take a fully device-side path: the corpus lives on device
    sorted by list, probed lists map to contiguous blocks, and only the
    needed blocks are gathered into one dense matmul + top-k per chunk
    (replaces the reference's faiss IVF GPU search,
    postprocess/score_align.py:41-49).
    """

    # device path constants: corpus block rows, query chunk rows
    BLOCK = 512
    QUERY_CHUNK = 512
    # dispatch: use the device path for query batches at least this large
    DEVICE_MIN_QUERIES = 256

    def __init__(
        self,
        dim: int = 1024,
        nlist: int = 1024,
        nprobe: int = 128,
        query_upload: str = "float32",
    ):
        self.dim = dim
        self.nlist = nlist
        self.nprobe = nprobe
        # "float16" halves the query staging bytes over the tunnel (~1e-3
        # relative distance noise); opt-in from score_align --query_upload
        self.query_upload = query_upload
        self.centroids: Optional[np.ndarray] = None
        self._vectors = np.zeros((0, dim), dtype=np.float32)
        self._assignments = np.zeros((0,), dtype=np.int64)
        self._device_state = None
        self._fp16_exact = True

    @property
    def ntotal(self) -> int:
        return self._vectors.shape[0]

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    def train(self, sample: np.ndarray, n_iter: int = 10, seed: int = 42) -> None:
        sample = np.asarray(sample, dtype=np.float32)
        rng = np.random.default_rng(seed)
        nlist = min(self.nlist, sample.shape[0])
        init = sample[rng.choice(sample.shape[0], size=nlist, replace=False)]
        self.centroids = np.asarray(
            _kmeans_iter(jnp.asarray(sample), jnp.asarray(init), n_iter)
        )
        self.nlist = nlist

    def add(self, vectors: np.ndarray) -> None:
        assert self.is_trained, "train the index before adding vectors"
        vectors = np.asarray(vectors, dtype=np.float32)
        if self._fp16_exact and not np.array_equal(
            vectors, vectors.astype(np.float16).astype(np.float32)
        ):
            self._fp16_exact = False
        # assign on device; only the (n,) id vector comes back to the host
        assign = np.asarray(
            _assign_to_centroids(jnp.asarray(vectors), jnp.asarray(self.centroids))
        )
        self._vectors = np.concatenate([self._vectors, vectors])
        self._assignments = np.concatenate([self._assignments, assign])
        self._device_state = None

    def _build_device_state(self):
        """Sort the corpus by list, pad to whole blocks (+1 all-padding
        block), and upload everything once; reused across searches."""
        order = np.argsort(self._assignments, kind="stable")
        n = self._vectors.shape[0]
        bs = self.BLOCK
        n_pad = ((n + bs - 1) // bs + 1) * bs  # +1 trailing pad block
        # fp16 device copy when lossless (half the upload + HBM; upcast
        # exactly in the search kernel)
        dt = np.float16 if self._fp16_exact else np.float32
        vec = np.zeros((n_pad, self.dim), dt)
        vec[:n] = self._vectors[order].astype(dt)
        sq = np.full((n_pad,), np.inf, np.float32)
        sq[:n] = np.sum(
            self._vectors[order] * self._vectors[order], axis=1
        )
        row_list = np.full((n_pad,), -1, np.int32)
        row_list[:n] = self._assignments[order].astype(np.int32)
        ids = np.full((n_pad,), -1, np.int32)
        ids[:n] = order.astype(np.int32)
        nb = n_pad // bs
        self._device_state = dict(
            vec_blocks=jnp.asarray(vec.reshape(nb, bs, self.dim)),
            sq_blocks=jnp.asarray(sq.reshape(nb, bs)),
            list_blocks=jnp.asarray(row_list.reshape(nb, bs)),
            id_blocks=jnp.asarray(ids.reshape(nb, bs)),
            row_list=jnp.asarray(row_list),
            centroids=jnp.asarray(self.centroids),
            n_blocks=nb,
        )
        return self._device_state

    def search_device(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fully device-side IVF search for large query batches.

        Per query chunk: probe lists on device, gather only the corpus
        blocks that hold probed candidates (padded to a power-of-two block
        count so compile count stays bounded), one dense matmul + masked
        top-k. Only the needed-block count crosses to the host between the
        two programs. Device-array queries (fused pipeline) skip the host
        staging entirely — they are sliced into chunks on device."""
        on_device = _is_device_array(queries)
        if on_device:
            nq = queries.shape[0]
            qall = queries.astype(jnp.float32)
            if nq % self.QUERY_CHUNK:
                pad = self.QUERY_CHUNK - nq % self.QUERY_CHUNK
                qall = jnp.pad(qall, ((0, pad), (0, 0)))
        else:
            queries = np.asarray(queries, dtype=np.float32)
            nq = queries.shape[0]
        st = self._device_state or self._build_device_state()
        nprobe = min(self.nprobe, self.nlist)
        bs = self.BLOCK
        nb = st["n_blocks"]
        d_out = np.full((nq, k), np.inf, dtype=np.float32)
        i_out = np.full((nq, k), -1, dtype=np.int64)
        chunk = self.QUERY_CHUNK
        for q0 in range(0, nq, chunk):
            m = min(chunk, nq - q0)
            if on_device:
                qj = jax.lax.dynamic_slice_in_dim(qall, q0, chunk, 0)
            elif self.query_upload == "float16":
                q = queries[q0 : q0 + chunk]
                if m < chunk:
                    q = np.pad(q, ((0, chunk - m), (0, 0)))
                # half the tunnel bytes; the probe/search jits upcast
                qj = jnp.asarray(q.astype(np.float16)).astype(jnp.float32)
            else:
                q = queries[q0 : q0 + chunk]
                if m < chunk:
                    q = np.pad(q, ((0, chunk - m), (0, 0)))
                qj = jnp.asarray(q)
            probe_mask, block_needed, count = _ivf_probe_and_blocks(
                qj, st["centroids"], st["row_list"], nprobe, bs
            )
            g = max(int(count), 1)  # scalar pull; picks the program variant
            g = min(1 << (g - 1).bit_length(), nb)
            kk = min(k, g * bs)
            d2, ids = _ivf_gather_search(
                qj, probe_mask, block_needed,
                st["vec_blocks"], st["sq_blocks"], st["list_blocks"],
                st["id_blocks"], kk, g, bs,
            )
            d2, ids = np.asarray(d2[:m, :kk]), np.asarray(ids[:m, :kk])
            d_out[q0 : q0 + m, :kk] = d2
            i_out[q0 : q0 + m, :kk] = ids
        return d_out, i_out

    def search_device_queries(self, queries, k: int):
        """Fused-pipeline entry: (nq, dim) device-array queries, no host
        staging. The search already runs on device; only the (nq, k)
        results cross to the host (the same contract FlatIndex's method
        keeps fully on device — downstream jits accept either)."""
        assert self.ntotal >= k, (self.ntotal, k)
        return self.search_device(queries, k)

    def search(
        self, queries: np.ndarray, k: int, use_device: Optional[bool] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Probe the nprobe nearest lists per query; exact distances within
        the probed subset. Large query batches run fully on device
        (:meth:`search_device`); small ones are vectorized on host in
        bounded-memory chunks (a device roundtrip would not amortize).
        Corpora beyond one chip's HBM: wrap in :class:`ShardedIVFIndex`."""
        queries = np.asarray(queries, dtype=np.float32)
        if use_device is None:
            use_device = queries.shape[0] >= self.DEVICE_MIN_QUERIES
        if use_device and self.ntotal:
            return self.search_device(queries, k)
        nq = queries.shape[0]
        nprobe = min(self.nprobe, self.nlist)
        c_sims = np.asarray(
            jnp.dot(jnp.asarray(queries), jnp.asarray(self.centroids).T)
        )
        probe = np.argsort(-c_sims, axis=1)[:, :nprobe]  # (nq, nprobe)

        order = np.argsort(self._assignments, kind="stable")
        sorted_assign = self._assignments[order]
        starts = np.searchsorted(sorted_assign, np.arange(self.nlist))
        counts = (
            np.searchsorted(sorted_assign, np.arange(self.nlist), side="right") - starts
        )
        corpus_sq = np.sum(self._vectors * self._vectors, axis=1)
        q_sq = np.sum(queries * queries, axis=1)

        d_out = np.full((nq, k), np.inf, dtype=np.float32)
        i_out = np.full((nq, k), -1, dtype=np.int64)

        # chunk queries so the candidate row block stays bounded
        mean_cand = max(int(counts[probe].mean() * nprobe), 1) if nq else 1
        q_chunk = max(1, int(2_000_000 / mean_cand))
        for q0 in range(0, nq, q_chunk):
            qs = slice(q0, min(q0 + q_chunk, nq))
            p = probe[qs]  # (m, nprobe)
            cnt = counts[p]  # candidates per (query, list)
            tot = cnt.sum(axis=1)  # per query
            if tot.sum() == 0:
                continue
            # flat candidate ids: for each (query, list), the run
            # order[starts[l] : starts[l]+counts[l]]
            reps = cnt.ravel()
            base = np.repeat(starts[p].ravel(), reps)
            within = np.arange(reps.sum()) - np.repeat(
                np.cumsum(reps) - reps, reps
            )
            cand = order[base + within]  # global row ids, flat
            q_of = np.repeat(np.arange(p.shape[0]), tot)

            dots = np.einsum(
                "nd,nd->n", self._vectors[cand], queries[qs][q_of]
            )
            d2 = q_sq[qs][q_of] + corpus_sq[cand] - 2.0 * dots

            # per-query top-k via lexsort on (query, distance)
            sel = np.lexsort((d2, q_of))
            q_sorted = q_of[sel]
            rank = np.arange(len(sel)) - np.searchsorted(q_sorted, q_sorted)
            keep = rank < k
            rows = q_sorted[keep] + q0
            cols = rank[keep]
            d_out[rows, cols] = d2[sel][keep]
            i_out[rows, cols] = cand[sel][keep]
        return d_out, i_out


# ---------------------------------------------------------------------------
# Sharded IVF: the list-sorted corpus blocks spread row-wise over the mesh —
# the TPU analog of faiss fp16-shard applied to the IVF tier (reference
# svecalign/postprocess/score_align.py:48-49,201-217 shards whatever index
# was loaded across local GPUs, IVF included)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nprobe",))
def _ivf_blocks_needed(queries, centroids, list_blocks, nprobe):
    """(nb,) bool: which list-sorted corpus blocks hold probed candidates.

    Runs SPMD over the sharded ``list_blocks``; the centroid matmul is tiny
    and replicated. The host reduces the result to a per-shard gather
    budget (a static shape for the shard_map program)."""
    c_sims = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(c_sims, nprobe)
    m, nlist = queries.shape[0], centroids.shape[0]
    probe_mask = (
        jnp.zeros((m, nlist), jnp.bool_).at[jnp.arange(m)[:, None], probe].set(True)
    )
    mask_any = jnp.any(probe_mask, axis=0)
    rows_needed = jnp.where(
        list_blocks >= 0, mask_any[jnp.maximum(list_blocks, 0)], False
    )
    return jnp.any(rows_needed, axis=1)


class ShardedIVFIndex:
    """IVF index whose corpus shards row-wise across the device mesh.

    Same probe semantics as :class:`IVFIndex` (identical result sets), but
    each device stores only its slice of the list-sorted corpus blocks and
    scores only its local probed blocks; the per-shard top-k candidates are
    gathered over ICI and re-reduced — so corpora larger than one chip's
    HBM keep both the IVF compute saving and the faiss fp16-shard memory
    behavior. Two programs per query chunk: a needed-block count (fixes the
    static per-shard gather budget G, power-of-two bucketed like the
    single-device path) and the shard_map probe+gather+score+merge.

    SNAPSHOT semantics: the wrapped index's vectors, assignments and nprobe
    are copied (and re-laid-out) at construction. Mutating the wrapped
    IVFIndex afterwards does not propagate; searches assert freshness and
    fail loudly instead of silently returning results over an old corpus.
    """

    BLOCK = IVFIndex.BLOCK
    QUERY_CHUNK = IVFIndex.QUERY_CHUNK

    def __init__(self, ivf: IVFIndex, mesh: Optional[Mesh] = None,
                 query_upload: str = None):
        assert ivf.is_trained and ivf.ntotal > 0
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("data",))
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.dim = ivf.dim
        self.nlist = ivf.nlist
        self.nprobe = ivf.nprobe
        self.query_upload = query_upload or ivf.query_upload
        self._ntotal = ivf.ntotal
        # snapshot semantics: the wrapped index's vectors/assignments/nprobe
        # are copied at construction; later ivf.add() or nprobe changes do
        # NOT propagate. Keep a handle so searches can detect staleness.
        self._source = ivf
        self._source_nprobe = ivf.nprobe

        n_dev = mesh.devices.size
        bs = self.BLOCK
        n = ivf.ntotal
        order = np.argsort(ivf._assignments, kind="stable")
        nb = -(-max(-(-n // bs), 1) // n_dev) * n_dev  # blocks, mesh-divisible
        n_pad = nb * bs
        dt = np.float16 if ivf._fp16_exact else np.float32
        vec = np.zeros((n_pad, self.dim), dt)
        vec[:n] = ivf._vectors[order].astype(dt)
        sq = np.full((n_pad,), np.inf, np.float32)
        sq[:n] = np.sum(ivf._vectors[order] * ivf._vectors[order], axis=1)
        row_list = np.full((n_pad,), -1, np.int32)
        row_list[:n] = ivf._assignments[order].astype(np.int32)
        ids = np.full((n_pad,), -1, np.int32)
        ids[:n] = order.astype(np.int32)

        ax = self.axis

        def shard(a, spec):
            return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

        self._vec_blocks = shard(vec.reshape(nb, bs, self.dim), P(ax, None, None))
        self._sq_blocks = shard(sq.reshape(nb, bs), P(ax, None))
        self._list_blocks = shard(row_list.reshape(nb, bs), P(ax, None))
        self._id_blocks = shard(ids.reshape(nb, bs), P(ax, None))
        self._centroids = shard(
            np.asarray(ivf.centroids, np.float32), P(None, None)
        )
        self._nb_shard = nb // n_dev

    @property
    def ntotal(self) -> int:
        return self._ntotal

    def _search_chunk(self, qj, k: int, G: int):
        """One sharded probe+gather+score+merge program over device queries."""
        ax = self.axis
        bs = self.BLOCK
        nprobe = min(self.nprobe, self.nlist)
        n_dev = self.mesh.devices.size
        kk = min(k, G * bs)

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                P(None, None), P(ax, None, None), P(ax, None), P(ax, None),
                P(ax, None), P(None, None),
            ),
            out_specs=(P(), P()),
            check_vma=False,  # all_gather output replication is invisible
            # to the static checker through top_k/take_along_axis
        )
        def search(q, vecb, sqb, listb, idb, cents):
            # replicated probe: identical on every shard (no collective)
            c_sims = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)
            _, probe = jax.lax.top_k(c_sims, nprobe)
            m = q.shape[0]
            probe_mask = (
                jnp.zeros((m, self.nlist), jnp.bool_)
                .at[jnp.arange(m)[:, None], probe]
                .set(True)
            )
            mask_any = jnp.any(probe_mask, axis=0)
            rows_needed = jnp.where(
                listb >= 0, mask_any[jnp.maximum(listb, 0)], False
            )
            block_needed = jnp.any(rows_needed, axis=1)  # (nb_shard,)
            count = jnp.sum(block_needed.astype(jnp.int32))
            # gather the local probed blocks into a dense candidate matrix;
            # overflow slots replicate block 0 and are masked below
            (blocks,) = jnp.nonzero(block_needed, size=G, fill_value=0)
            slot_valid = jnp.arange(G) < count
            cand_v = vecb[blocks].reshape(G * bs, -1).astype(jnp.float32)
            cand_sq = sqb[blocks].reshape(-1)
            cand_list = listb[blocks].reshape(-1)
            cand_id = idb[blocks].reshape(-1)
            sims = jnp.dot(
                q, cand_v.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            q_sq = jnp.sum(q * q, axis=1, keepdims=True)
            d2 = q_sq + cand_sq[None, :] - 2.0 * sims
            probed = (cand_list[None, :] >= 0) & jnp.take(
                probe_mask, jnp.maximum(cand_list, 0), axis=1
            )
            valid = probed & jnp.repeat(slot_valid, bs)[None, :]
            d2 = jnp.where(valid, d2, jnp.inf)
            neg_d, pos = jax.lax.top_k(-d2, kk)
            ids_l = jnp.where(jnp.isinf(-neg_d), -1, cand_id[pos])
            # merge over ICI: shard-major candidate axis, one re-reduce
            d_all = jax.lax.all_gather(-neg_d, ax, axis=1, tiled=True)
            i_all = jax.lax.all_gather(ids_l, ax, axis=1, tiled=True)
            neg_best, ppos = jax.lax.top_k(-d_all, min(k, n_dev * kk))
            return -neg_best, jnp.take_along_axis(i_all, ppos, axis=1)

        return search(
            qj, self._vec_blocks, self._sq_blocks, self._list_blocks,
            self._id_blocks, self._centroids,
        )

    def _gather_budget(self, qj) -> int:
        """Static per-shard block budget for this chunk: max over shards of
        the needed-block count, power-of-two bucketed (bounds the compile
        count exactly like IVFIndex.search_device's scalar pull)."""
        needed = np.asarray(
            _ivf_blocks_needed(
                qj, self._centroids, self._list_blocks,
                min(self.nprobe, self.nlist),
            )
        )
        n_dev = self.mesh.devices.size
        per_shard = needed.reshape(n_dev, self._nb_shard).sum(axis=1)
        g = max(int(per_shard.max()), 1)
        return min(1 << (g - 1).bit_length(), self._nb_shard)

    def _check_fresh(self) -> None:
        """Refuse to search over a stale snapshot (see __init__).

        Real raises, not asserts: the guard must survive ``python -O`` —
        silently answering over an outdated corpus is the exact failure
        this exists to prevent."""
        if self._source.ntotal != self._ntotal:
            raise RuntimeError(
                f"wrapped IVFIndex grew after sharding ({self._source.ntotal}"
                f" vs {self._ntotal} rows); rebuild the ShardedIVFIndex"
            )
        if self._source.nprobe != self._source_nprobe:
            raise RuntimeError(
                f"wrapped IVFIndex nprobe changed after sharding "
                f"({self._source.nprobe} vs {self._source_nprobe}); rebuild "
                "the ShardedIVFIndex"
            )

    def _run_chunks(self, stage_chunk, nq: int, k: int):
        self._check_fresh()
        d_out = np.full((nq, k), np.inf, dtype=np.float32)
        i_out = np.full((nq, k), -1, dtype=np.int64)
        chunk = self.QUERY_CHUNK
        for q0 in range(0, nq, chunk):
            m = min(chunk, nq - q0)
            qj = stage_chunk(q0, m, chunk)
            G = self._gather_budget(qj)
            d2, ids = self._search_chunk(qj, k, G)
            cols = d2.shape[1]
            d_out[q0 : q0 + m, :cols] = np.asarray(d2)[:m]
            i_out[q0 : q0 + m, :cols] = np.asarray(ids)[:m]
        return d_out, i_out

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.asarray(queries, dtype=np.float32)

        def stage_chunk(q0, m, chunk):
            q = queries[q0 : q0 + chunk]
            if m < chunk:
                q = np.pad(q, ((0, chunk - m), (0, 0)))
            if self.query_upload == "float16":
                return jnp.asarray(q.astype(np.float16)).astype(jnp.float32)
            return jnp.asarray(q)

        return self._run_chunks(stage_chunk, queries.shape[0], k)

    def search_device_queries(self, queries, k: int):
        """Fused-pipeline entry: device-array queries, sliced into chunks
        on device; only the merged (nq, k) results cross D2H."""
        assert self.ntotal >= k, (self.ntotal, k)
        nq = queries.shape[0]
        qall = queries.astype(jnp.float32)
        if nq % self.QUERY_CHUNK:
            pad = self.QUERY_CHUNK - nq % self.QUERY_CHUNK
            qall = jnp.pad(qall, ((0, pad), (0, 0)))

        def stage_chunk(q0, m, chunk):
            return jax.lax.dynamic_slice_in_dim(qall, q0, chunk, 0)

        return self._run_chunks(stage_chunk, nq, k)
