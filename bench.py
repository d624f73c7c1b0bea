"""Benchmark: align the example doc pair end-to-end; print ONE JSON line.

Metric: doc-pairs aligned per hour per chip (full coarse-to-fine alignment
of the committed example/voxpopuli en-de pair, including host traceback and
all cost/DP levels). ``vs_baseline``: speedup vs a sequential numpy
implementation with the reference's kernel semantics (tests/oracle.py) run
on this host over the same shapes — the stand-in for the reference's
single-thread Cython CPU path (the reference publishes no speed numbers;
BASELINE.md).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

EXAMPLE = Path("/root/reference/example/voxpopuli")
STEM = "20180313-0900-PLENARY-15"


def run_align(n_iters: int = 4):
    from svecalign_tpu.utils.embedding_utils import make_doc_embedding, read_in_embeddings
    from svecalign_tpu.vecalign.pyramid import vecalign
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    src_sent2id, src_emb = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/en/{STEM}_en.txt"),
        str(EXAMPLE / f"embeds/en/{STEM}_en.embed"),
        use_stopes=True,
    )
    tgt_sent2id, tgt_emb = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/de/{STEM}_de.txt"),
        str(EXAMPLE / f"embeds/de/{STEM}_de.embed"),
        use_stopes=True,
    )
    src_lines = open(EXAMPLE / f"segments/en/{STEM}_en.txt").readlines()
    tgt_lines = open(EXAMPLE / f"segments/de/{STEM}_de.txt").readlines()

    # fp16 tensors match the production CLI path (halved upload)
    v0 = make_doc_embedding(src_sent2id, src_emb, src_lines, 5, overlap_segments=True, dtype=np.float16)
    v1 = make_doc_embedding(tgt_sent2id, tgt_emb, tgt_lines, 5, overlap_segments=True, dtype=np.float16)
    types = make_alignment_types(6)

    kwargs = dict(
        final_alignment_types=types,
        del_percentile_frac=0.2,
        width_over2=8,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
    )

    stack = vecalign(v0.copy(), v1.copy(), **kwargs)  # warmup (compiles)
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        stack = vecalign(v0.copy(), v1.copy(), **kwargs)
        times.append(time.perf_counter() - t0)
    # best-of-N: robust to shared-tunnel noise
    return stack, min(times), (v0, v1)


def _np_banded_costs(v0, v1, n0, n1, path, types, w2):
    """Vectorized numpy (BLAS) banded costs — what a well-implemented CPU
    reference achieves."""
    path = np.asarray(path, np.int32)
    A = len(path)
    B = 2 * w2
    b_off = (path[:, 1] - w2).astype(np.int32)
    yy = b_off[:, None] + np.arange(B)[None, :]
    xx = np.arange(A)[:, None] - yy
    valid = (xx >= 0) & (xx < v0.shape[1]) & (yy >= 0) & (yy < v1.shape[1])
    xc = np.clip(xx, 0, v0.shape[1] - 1)
    yc = np.clip(yy, 0, v1.shape[1] - 1)
    out = np.empty((len(types), A, B), np.float32)
    for t, (xo, yo) in enumerate(types):
        g0 = v0[xo - 1][xc]
        g1 = v1[yo - 1][yc]
        sim = np.einsum("abd,abd->ab", g0, g1)
        denom = 1e-6 + n0[xo - 1][xc] + n1[yo - 1][yc]
        out[t] = np.where(valid, 2.0 * xo * yo * (1.0 - sim) / denom, np.inf)
    return out, b_off


def run_oracle_baseline(stack, v0, v1) -> float:
    """A STRONG sequential CPU baseline over the same shapes: BLAS-backed
    numpy cost matrices + the native C++ float64 DP kernels + host
    traceback — i.e. the reference's architecture implemented well."""
    from svecalign_tpu.ops.dp_native import dense_dp_native, run_banded_dp_native
    from svecalign_tpu.vecalign.traceback import dense_traceback, sparse_traceback

    depths = sorted(stack.keys())
    max_depth = depths[-1]
    t0 = time.perf_counter()

    # dense level: one BLAS matmul + native DP
    mv0 = np.asarray(stack[max_depth]["v0"])
    mv1 = np.asarray(stack[max_depth]["v1"])
    n0 = np.asarray(stack[max_depth]["n0"])
    n1 = np.asarray(stack[max_depth]["n1"])
    sim = mv0[0] @ mv1[0].T
    costs = 2.0 * (1.0 - sim) / (1e-6 + n0[0][:, None] + n1[0][None, :])
    _, bp = dense_dp_native(costs.astype(np.float32), stack[max_depth]["del_penalty"])
    dense_traceback(bp)

    # banded levels over the recorded search paths
    for depth in reversed(range(0, max_depth + 1)):
        if "searchpath" not in stack[depth]:
            continue
        types = stack[depth]["alignment_types"]
        w2 = (np.asarray(stack[depth]["a_b_costs"]).shape[2]) // 2
        feats, b_off = _np_banded_costs(
            np.asarray(stack[depth]["v0"]),
            np.asarray(stack[depth]["v1"]),
            np.asarray(stack[depth]["n0"]),
            np.asarray(stack[depth]["n1"]),
            stack[depth]["searchpath"],
            types,
            w2,
        )
        csum, xp, yp, boff_out = run_banded_dp_native(
            feats, b_off, types, stack[depth]["del_penalty"],
            stack[depth]["size0"], stack[depth]["size1"],
        )
        sparse_traceback(csum, xp, yp, boff_out, stack[depth]["size0"], stack[depth]["size1"])

    return time.perf_counter() - t0


def run_batched(v0, v1, batch: int = 32, n_iters: int = 4, quant="int8") -> float:
    """Throughput of the batched multi-pair driver (seconds per pair),
    via the production raw-rows upload path (int8 quantized uploads: the
    tunnel drops to ~45 MB/s after any D2H transfer, so upload bytes are
    the steady-state bottleneck). ``quant='int4'`` measures the packed
    4-bit upload mode (quarter of fp16 bytes)."""
    from svecalign_tpu.utils.embedding_utils import make_doc_ids, read_in_embeddings
    from svecalign_tpu.vecalign.batch import vecalign_batched_from_rows
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    s2i, emb0 = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/en/{STEM}_en.txt"),
        str(EXAMPLE / f"embeds/en/{STEM}_en.embed"), use_stopes=True,
    )
    t2i, emb1 = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/de/{STEM}_de.txt"),
        str(EXAMPLE / f"embeds/de/{STEM}_de.embed"), use_stopes=True,
    )
    src_lines = open(EXAMPLE / f"segments/en/{STEM}_en.txt").readlines()
    tgt_lines = open(EXAMPLE / f"segments/de/{STEM}_de.txt").readlines()
    ids0 = make_doc_ids(s2i, emb0.shape[0], src_lines, 5, overlap_segments=True)
    ids1 = make_doc_ids(t2i, emb1.shape[0], tgt_lines, 5, overlap_segments=True)
    e0 = emb0.astype(np.float16)
    e1 = emb1.astype(np.float16)
    pairs = [(e0.copy(), ids0.copy(), e1.copy(), ids1.copy()) for _ in range(batch)]
    kwargs = dict(
        final_alignment_types=make_alignment_types(6),
        del_percentile_frac=0.2,
        width_over2=8,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
    )
    from svecalign_tpu.vecalign.batch import run_staged, stage_rows_upload

    vecalign_batched_from_rows(pairs, quantize=quant, **kwargs)  # warmup/compile

    # production loop shape (seg_align/align.py): double-buffered with the
    # staging on a worker thread — in the tunnel's post-D2H mode device_put
    # BLOCKS the calling thread, so same-thread staging would serialize
    # uploads with compute
    from concurrent.futures import ThreadPoolExecutor

    n_buckets = 4
    times = []
    with ThreadPoolExecutor(1) as ex:
        for _ in range(n_iters):
            t0 = time.perf_counter()
            fut = ex.submit(stage_rows_upload, pairs, quant)
            for bi in range(n_buckets):
                handle = fut.result()
                if bi + 1 < n_buckets:
                    fut = ex.submit(stage_rows_upload, pairs, quant)
                run_staged(handle, **kwargs)
            times.append((time.perf_counter() - t0) / n_buckets)
    return min(times) / batch


def run_batched_ab(v0, v1, batch: int = 32, n_iters: int = 3):
    """Interleaved int8/int4 A/B: alternate single-bucket trials between
    the two upload modes so both see the same tunnel state (the round-2
    sequential bench could not distinguish a slow unpack from a tunnel
    that degraded between the two measurements). Returns (int8, int4)
    best seconds-per-pair."""
    from svecalign_tpu.utils.embedding_utils import make_doc_ids, read_in_embeddings
    from svecalign_tpu.vecalign.batch import run_staged, stage_rows_upload
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    s2i, emb0 = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/en/{STEM}_en.txt"),
        str(EXAMPLE / f"embeds/en/{STEM}_en.embed"), use_stopes=True,
    )
    t2i, emb1 = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/de/{STEM}_de.txt"),
        str(EXAMPLE / f"embeds/de/{STEM}_de.embed"), use_stopes=True,
    )
    src_lines = open(EXAMPLE / f"segments/en/{STEM}_en.txt").readlines()
    tgt_lines = open(EXAMPLE / f"segments/de/{STEM}_de.txt").readlines()
    ids0 = make_doc_ids(s2i, emb0.shape[0], src_lines, 5, overlap_segments=True)
    ids1 = make_doc_ids(t2i, emb1.shape[0], tgt_lines, 5, overlap_segments=True)
    e0 = emb0.astype(np.float16)
    e1 = emb1.astype(np.float16)
    pairs = [(e0.copy(), ids0.copy(), e1.copy(), ids1.copy()) for _ in range(batch)]
    kwargs = dict(
        final_alignment_types=make_alignment_types(6),
        del_percentile_frac=0.2,
        width_over2=8,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
    )
    best = {"int8": np.inf, "int4": np.inf}
    for quant in best:  # warm both programs before any timing
        run_staged(stage_rows_upload(pairs, quantize=quant), **kwargs)
    for _ in range(n_iters):
        for quant in ("int8", "int4"):
            t0 = time.perf_counter()
            run_staged(stage_rows_upload(pairs, quantize=quant), **kwargs)
            best[quant] = min(best[quant], time.perf_counter() - t0)
    return best["int8"] / batch, best["int4"] / batch


def run_fused(batch: int = 64, n_iters: int = 4) -> float:
    """Throughput of the fused-pipeline align path (seconds per pair):
    embedding rows are already ON DEVICE (pipeline --fused handoff,
    utils/embed_cache.py), so only the small id maps cross the tunnel.
    Quality is exactly the fp16 file path (bit-identical,
    tests/test_fused.py). main() sweeps pair batches {32, 64, 128, 256} and
    reports the best. Two batch-128 OOMs fixed along the way: the
    deletion-knob sampler's (P, 20000, 1024) gather (round 3, now
    scan-chunked) and the staging build's per-pair-stacked fp32 cache cast
    (round 4, now a deduplicated fp16 bank gathered before the cast —
    stage_rows_device); a size that still OOMs records "OOM" in the sweep
    instead of killing the bench."""
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache
    from svecalign_tpu.utils.embedding_utils import make_doc_ids, read_in_embeddings
    from svecalign_tpu.vecalign.batch import run_staged, stage_rows_device
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    s2i, emb0 = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/en/{STEM}_en.txt"),
        str(EXAMPLE / f"embeds/en/{STEM}_en.embed"), use_stopes=True,
    )
    t2i, emb1 = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/de/{STEM}_de.txt"),
        str(EXAMPLE / f"embeds/de/{STEM}_de.embed"), use_stopes=True,
    )
    src_lines = open(EXAMPLE / f"segments/en/{STEM}_en.txt").readlines()
    tgt_lines = open(EXAMPLE / f"segments/de/{STEM}_de.txt").readlines()
    ids0 = make_doc_ids(s2i, emb0.shape[0], src_lines, 5, overlap_segments=True)
    ids1 = make_doc_ids(t2i, emb1.shape[0], tgt_lines, 5, overlap_segments=True)

    rows = embed_cache.max_rows
    dev = []
    for emb in (emb0, emb1):
        padded = np.zeros((rows, emb.shape[1]), np.float16)
        padded[: emb.shape[0]] = emb.astype(np.float16)
        dev.append(jnp.asarray(padded))
    pairs = [(dev[0], ids0, dev[1], ids1) for _ in range(batch)]
    kwargs = dict(
        final_alignment_types=make_alignment_types(6),
        del_percentile_frac=0.2,
        width_over2=8,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
    )
    run_staged(stage_rows_device(pairs), **kwargs)  # warmup/compile
    n_buckets = 4
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        for _ in range(n_buckets):
            run_staged(stage_rows_device(pairs), **kwargs)
        times.append((time.perf_counter() - t0) / n_buckets)
    return min(times) / batch


_PEAK_BF16 = {
    # per-chip dense bf16 peak (TFLOP/s); device_kind substrings
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v4": 275e12, "v5p": 459e12, "v6e": 918e12, "v6 lite": 918e12,
}


def _peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, val in _PEAK_BF16.items():
        if key in kind:
            return val
    return 197e12  # assume v5e-class


def run_encoder(n_iters: int = 10):
    """Warm on-device encoder forward: tokens/s and flops-derived MFU%.

    Uses the production wav2vec2-large (SpeechLASER) architecture with
    random weights, one 20 s bucket at the max_tokens row count — the
    mining embed stage's steady-state shape. Inputs are staged to the
    device ONCE so this measures device time, not the tunnel.

    Timing = two-point scan slope: N and 2N forwards chained inside ONE jit
    program (each iteration's lengths depend on the previous output, so
    nothing can overlap, dedupe, or DCE), result forced to host. The slope
    cancels dispatch/transfer constants — plain dispatch loops measured up
    to 30% slow (and per-iteration block_until_ready wildly wrong) through
    the axon tunnel.
    """
    import jax
    import jax.numpy as jnp

    from svecalign_tpu.models.laser_encoder import SpeechLaserModel

    model = SpeechLaserModel(max_tokens=150 * 16000)
    bucket = 20 * 16000
    rows = model._rows_for_bucket(bucket)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((rows, bucket)) * 8000).astype(np.int16)
    wav_d = jax.device_put(jnp.asarray(wav))
    scales = jax.device_put(jnp.full((rows,), 1.0 / 32767.0, jnp.float32))
    lengths = jax.device_put(jnp.full((rows,), bucket, jnp.int32))

    def make_chained(n):
        @jax.jit
        def chained(params, wav_i16, scales, lengths):
            def body(c, _):
                emb = model._dequant_apply(params, wav_i16, scales, lengths + c)
                return jnp.int32(jnp.sum(emb)) % 2, None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c

        return chained

    def timed(n):
        fn = make_chained(n)
        np.asarray(fn(model.params, wav_d, scales, lengths))  # compile + warm
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fn(model.params, wav_d, scales, lengths))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(2 * n_iters) - timed(n_iters)) / n_iters

    # analytic forward FLOPs from the architecture
    cfg = model.config
    d = cfg.encoder_dim
    ffn = cfg.encoder_ffn_dim
    # conv feature extractor
    conv_flops = 0
    t_len = bucket
    c_in = 1
    for c_out, k, s in cfg.conv_layers:
        t_len = (t_len - k) // s + 1
        conv_flops += 2 * t_len * k * c_in * c_out
        c_in = c_out
    frames = t_len
    # transformer: qkvo (8 d^2) + ffn (4 d ffn) per token, + attention
    # score/value matmuls (4 T d per token), x layers
    per_token = cfg.encoder_layers * (8 * d * d + 4 * d * ffn + 4 * frames * d)
    flops = rows * (conv_flops + frames * per_token)

    tokens_per_sec = rows * frames / dt
    mfu = flops / dt / _peak_flops()
    audio_rtf = rows * 20.0 / dt  # seconds of audio per wall second
    return tokens_per_sec, mfu, audio_rtf


def run_sonar(n_iters: int = 4):
    """Device time of the second embedder (SONAR w2v-BERT conformer trunk),
    scan-slope measured like run_encoder: 20 s bucket (2000 fbank frames ->
    1000 stacked tokens), 8 rows."""
    import jax
    import jax.numpy as jnp

    from svecalign_tpu.models.sonar_encoder import SonarSpeechModel

    model = SonarSpeechModel(batch_size=8)
    bucket = 2000  # 10 ms frames pre-stack
    samples = 400 + (bucket - 1) * 160
    rows = model.batch_size
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((rows, samples)) * 8000).astype(np.int16)
    wav_d = jax.device_put(jnp.asarray(wav))
    scales = jax.device_put(jnp.full((rows,), 1.0 / 32767.0, jnp.float32))
    lengths = jax.device_put(jnp.full((rows,), bucket, jnp.int32))

    def make_chained(n):
        @jax.jit
        def chained(params, w, s, lengths):
            def body(c, _):
                emb = model._forward.__wrapped__(params, w, s, lengths + c, bucket)
                return jnp.int32(jnp.sum(emb)) % 2, None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c

        return chained

    def timed(n):
        fn = make_chained(n)
        np.asarray(fn(model.params, wav_d, scales, lengths))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fn(model.params, wav_d, scales, lengths))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(2 * n_iters) - timed(n_iters)) / n_iters

    cfg = model.config
    d, ffn, t = cfg.model_dim, cfg.ffn_dim, bucket // 2
    # conformer block: 2 macaron FFNs + attention qkvo + rel-pos attention
    # matmuls + conv module (pointwise GLU + depthwise + pointwise)
    per_token = cfg.n_layers * (
        8 * d * ffn + 8 * d * d + 6 * t * d + 6 * d * d + 62 * d
    )
    flops = rows * t * (per_token + 2 * (2 * cfg.n_mels) * d)  # + projection
    tokens_per_sec = rows * t / dt
    mfu = flops / dt / _peak_flops()
    return tokens_per_sec, mfu


def run_embed_file(n_warm: int = 3):
    """Sustained file-embed throughput on the production path: one 240 s
    document's overlap windows through encode_spans (device-side window
    assembly, pipeline defaults: int16 block-quantized upload, max_tokens
    600 s). Wall-clock e2e per file — upload + assembly + forwards + pulls
    — NOT a scan slope: the tunnel is part of what this path optimizes
    (round-2 host staging uploaded ~31x the raw audio bytes and the embed
    stage was 91 percent of sustained e2e wall, BASELINE.md).

    Returns (seconds per file best-of-N, audio-hours embedded per wall-hour
    at that rate)."""
    from svecalign_tpu.utils.embed_model_utils import load_embed_model

    seconds = 240.0
    sr = 16000
    rng = np.random.default_rng(0)
    wave = np.zeros(int(seconds * sr), np.float32)
    # speech-shaped bursts + gaps, same generator family as
    # tools/rehearse_corpus.py, so the windows match rehearsal statistics
    t = 0.0
    segs = []
    while t < seconds - 3.0:
        burst, gap = rng.uniform(0.4, 2.4), rng.uniform(0.3, 1.2)
        i0, i1 = int(t * sr), min(int((t + burst) * sr), len(wave))
        wave[i0:i1] = 0.35 * rng.standard_normal(i1 - i0).astype(np.float32)
        segs.append((i0, i1))
        t += burst + gap
    # overlap windows exactly as seg_align/concat_segs.py (5 overlaps, 20 s)
    spans = []
    for i, (s, _) in enumerate(segs):
        for j in range(5):
            if i + j >= len(segs):
                break
            if segs[i + j][1] - s > 20 * sr:
                break
            spans.append((s, segs[i + j][1]))

    # 150 s batches, not the pipeline's 600 s: the four bucket programs at
    # 600 s (rows up to 150) cost several extra minutes of cold axon
    # compile per bench run for a slightly rosier number; 150 s measures
    # the same path with modest compiles (UNDER-states production rate)
    model = load_embed_model("speech_laser", max_tokens=150 * sr)
    model.encode_spans(wave, spans)  # compile + warm
    best = np.inf
    for _ in range(n_warm):
        t0 = time.perf_counter()
        model.encode_spans(wave, spans)
        best = min(best, time.perf_counter() - t0)
    return best, (seconds / 3600.0) / (best / 3600.0)


def run_knn(n_iters: int = 5):
    """Exact kNN q/s over a device-resident corpus (the score_align hot
    op): 256k x 1024 fp16 corpus, 4096-query batches, k=16. The search
    pulls results to host every call, so the loop is properly synced; the
    fp32 number includes the 16 MB/batch query upload (the production
    default), the fp16 number is --query_upload fp16 (half the bytes),
    the device number is the fused path (queries already on device, only
    the (nq, k) results cross the tunnel), and the int8 number is
    --corpus_quant int8 with device queries (half fp16's corpus HBM and a
    single-pass bf16 matmul instead of 6-pass HIGHEST fp32).

    The four modes run ROUND-ROBIN inside one window, min-of-N per mode
    (CLAUDE.md measurement rule) — sequential per-mode loops made
    round-over-round kNN comparisons hostage to tunnel mood (round-4
    VERDICT #7). Deliberately dispatch loops, NOT scan-slope:
    score_align's real call pattern is dispatch+pull-per-chunk, so the
    dispatch/sync overhead IS part of the production rate (the
    scan-slope rule applies to pure device-time measurements like
    run_encoder/run_sonar)."""
    import jax.numpy as jnp

    from svecalign_tpu.ops.topk import FlatIndex

    rng = np.random.default_rng(1)
    n, d, nq, k = 262_144, 1024, 4096, 16
    corpus = rng.standard_normal((n, d)).astype(np.float16).astype(np.float32)
    queries = rng.standard_normal((nq, d)).astype(np.float32)
    idx = FlatIndex(dim=d)
    idx.add(corpus)
    idx8 = FlatIndex(dim=d, corpus_quant="int8")  # half fp16's HBM,
    idx8.add(corpus)  # single-pass bf16 matmul vs the exact 6-pass HIGHEST
    qd = jnp.asarray(queries)

    modes = {
        "fp32": lambda: idx.search(queries, k, upload_dtype="float32"),
        "fp16": lambda: idx.search(queries, k, upload_dtype="float16"),
        "device": lambda: np.asarray(idx.search_device_queries(qd, k)[0]),
        "int8": lambda: np.asarray(idx8.search_device_queries(qd, k)[0]),
    }
    for call in modes.values():  # compile/upload/cache, all before timing
        call()
    best = {m: float("inf") for m in modes}
    for _ in range(n_iters):
        for mode, call in modes.items():
            t0 = time.perf_counter()
            call()
            best[mode] = min(best[mode], time.perf_counter() - t0)

    qps = nq / best["fp32"]
    qps16 = nq / best["fp16"]
    qps_dev = nq / best["device"]
    qps_i8 = nq / best["int8"]
    tflops = qps_dev * 2 * n * d / 1e12
    return qps, qps16, qps_dev, qps_i8, tflops


_phase_t0 = time.perf_counter()


def _phase(name: str) -> None:
    """Progress marker on stderr (the driver only parses the stdout JSON);
    a timed-out bench run is undebuggable without these."""
    print(f"[bench +{time.perf_counter() - _phase_t0:7.1f}s] {name}",
          file=sys.stderr, flush=True)


def _init_devices_with_retry():
    """Initialize the JAX backend, retrying through transient tunnel outages.

    Two failure modes were observed on axon: a raised ``Unable to initialize
    backend`` (retryable in-process — jax leaves ``_backends`` empty on a
    raised init, so discovery re-runs) and a HANG inside the plugin's init
    (not interruptible in-process). Each attempt therefore first probes
    ``jax.devices()`` in a subprocess with a hard timeout, and only
    initializes in-process once the probe succeeds.

    Tunables (env, mainly for tests): ``SVECALIGN_BENCH_INIT_ATTEMPTS``
    (default 3), ``SVECALIGN_BENCH_PROBE_TIMEOUT`` seconds (default 300).
    """
    import os
    import subprocess

    attempts = int(os.environ.get("SVECALIGN_BENCH_INIT_ATTEMPTS", "3"))
    probe_timeout = float(os.environ.get("SVECALIGN_BENCH_PROBE_TIMEOUT", "300"))
    waits = (60.0, 180.0)
    # mirror utils.jax_setup: the axon plugin overrides the JAX_PLATFORMS env
    # var, so the probe re-honors an explicit non-axon choice via config
    probe_code = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS', '')\n"
        "if p and 'axon' not in p:\n"
        "    jax.config.update('jax_platforms', p)\n"
        "jax.devices()\n"
    )
    last_err = "unknown"
    for i in range(attempts):
        try:
            subprocess.run(
                [sys.executable, "-c", probe_code],
                cwd=str(REPO), check=True, timeout=probe_timeout,
                capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            last_err = f"backend init probe hung > {probe_timeout:.0f}s"
        except subprocess.CalledProcessError as e:
            tail = (e.stderr or "").strip().splitlines()
            last_err = tail[-1] if tail else f"probe rc={e.returncode}"
        else:
            from svecalign_tpu.utils.jax_setup import setup_jax

            setup_jax()
            import jax

            try:
                return jax.devices()
            except Exception as e:
                last_err = f"{type(e).__name__}: {e}"
        if i + 1 < attempts:
            wait = waits[min(i, len(waits) - 1)]
            _phase(f"backend init failed ({last_err}); retry in {wait:.0f}s")
            time.sleep(wait)
    raise RuntimeError(f"backend unavailable after {attempts} attempts: {last_err}")


def main():
    # the one-JSON-line contract holds even on failure: the driver records
    # stdout verbatim, and a raw traceback there is machine-unreadable
    # (BENCH_r03 was lost to exactly that during a tunnel outage)
    try:
        _init_devices_with_retry()
        _run_bench()
    except Exception as e:
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "doc_pairs_aligned_per_hour_per_chip",
            "value": None,
            "unit": "doc-pairs/hour/chip",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        }))
        sys.exit(1)


def _run_bench():
    _phase("run_align")
    stack, ours, (v0, v1) = run_align()
    from svecalign_tpu.vecalign import batch as batch_mod

    batch_mod.upload_stats["bytes"] = 0
    batch_mod.upload_stats["buckets"] = 0
    _phase("run_batched")
    batched = run_batched(v0, v1)
    # 4 iters x 4 buckets x 32 pairs staged in run_batched (+1 warmup)
    staged_pairs = batch_mod.upload_stats["buckets"] * 32
    bytes_per_pair = (
        batch_mod.upload_stats["bytes"] / staged_pairs if staged_pairs else 0
    )
    # interleaved A/B: int4's round-2 "3x slower than int8" was
    # indistinguishable from mid-bench tunnel degradation; alternating
    # trials share tunnel state (and the int4 unpack is now a half-block
    # concat instead of a lane-shuffling interleave)
    _phase("run_batched_ab")
    batched_ab8, batched4 = run_batched_ab(v0, v1)
    batched = min(batched, batched_ab8)
    # fused sweep: the headline is the BEST pair batch, so the driver JSON
    # records the number the docs claim (round-2 gap: docs said batch 64,
    # bench only ran 32)
    fused_sweep = {}
    # 256 joined the sweep in round 5: the device traceback removed the
    # byte-proportional plane pulls that used to punish big buckets (128
    # first beat 64 in the same capture); an OOM at 256 records gracefully
    for b in (32, 64, 128, 256):
        _phase(f"run_fused batch={b}")
        try:
            fused_sweep[b] = run_fused(batch=b, n_iters=2)
        except Exception as e:  # a failure at one size must not kill the sweep
            _phase(f"run_fused batch={b} failed: {type(e).__name__}")
            fused_sweep[b] = f"failed:{type(e).__name__}"
    ran = {b: t for b, t in fused_sweep.items() if isinstance(t, float)}
    if ran:
        fused_batch = min(ran, key=lambda b: ran[b])
        fused = ran[fused_batch]
    else:
        # every size failed: keep the rest of the bench's metrics — the
        # headline falls back to the upload modes, fused fields go null
        fused_batch = None
        fused = None
    _phase("run_oracle_baseline")
    baseline = run_oracle_baseline(stack, v0, v1)
    _phase("run_encoder")
    enc_tokens, enc_mfu, enc_rtf = run_encoder()
    _phase("run_sonar")
    sonar_tokens, sonar_mfu = run_sonar()
    _phase("run_embed_file")
    embed_file_s, embed_audio_rate = run_embed_file()
    _phase("run_knn")
    knn_qps, knn_qps16, knn_qps_dev, knn_qps_i8, knn_tflops = run_knn()
    _phase("done")

    # DP cells/sec: total banded cells (types x A x B) + dense cells, per second
    cells = 0
    for depth, entry in stack.items():
        if "a_b_costs" in entry:
            cells += int(np.prod(np.asarray(entry["a_b_costs"]).shape))
        if "costs_1to1" in entry:
            cells += int(np.prod(np.asarray(entry["costs_1to1"]).shape))

    import jax

    # headline: best quality-gated mode — int8/int4 uploads hold the
    # committed-example gold-F1 gate (tests/test_batch_align.py); the fused
    # pipeline mode is bit-identical to the fp16 file path
    # (tests/test_fused.py); per-mode numbers follow
    modes = [(batched, "int8"), (batched4, "int4")]
    if fused is not None:
        modes.append((fused, "fused"))
    best, best_mode = min(modes)
    result = {
        "metric": "doc_pairs_aligned_per_hour_per_chip",
        "value": round(3600.0 / best, 2),
        "unit": "doc-pairs/hour/chip",
        "vs_baseline": round(baseline / best, 3),
        "headline_mode": best_mode,
        "batched_seconds_per_pair": round(batched, 4),
        "single_pair_seconds": round(ours, 4),
        "baseline_numpy_seconds_per_pair": round(baseline, 4),
        "dp_cells_per_sec": round(cells / batched, 1),
        "upload_bytes_per_pair": int(bytes_per_pair),
        "int4_seconds_per_pair": round(batched4, 4),
        "int4_doc_pairs_per_hour": round(3600.0 / batched4, 2),
        "fused_seconds_per_pair": round(fused, 4) if fused is not None else None,
        "fused_doc_pairs_per_hour": (
            round(3600.0 / fused, 2) if fused is not None else None
        ),
        "fused_pair_batch": fused_batch,
        "fused_sweep_ms_per_pair": {
            str(b): (round(1000 * t, 2) if isinstance(t, float) else t)
            for b, t in fused_sweep.items()
        },
        "encoder_tokens_per_sec": round(enc_tokens, 1),
        "encoder_mfu_pct": round(100 * enc_mfu, 2),
        "encoder_audio_rtf": round(enc_rtf, 1),
        "sonar_tokens_per_sec": round(sonar_tokens, 1),
        "sonar_mfu_pct": round(100 * sonar_mfu, 2),
        "embed_file_240s_seconds": round(embed_file_s, 3),
        "embed_audio_hours_per_hour": round(embed_audio_rate, 1),
        "knn_queries_per_sec": round(knn_qps, 1),
        "knn_fp16_upload_queries_per_sec": round(knn_qps16, 1),
        "knn_device_query_queries_per_sec": round(knn_qps_dev, 1),
        "knn_int8_corpus_queries_per_sec": round(knn_qps_i8, 1),
        "knn_tflops": round(knn_tflops, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
