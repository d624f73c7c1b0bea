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


def run_batched(v0, v1, batch: int = 32, n_iters: int = 4) -> float:
    """Throughput of the batched multi-pair driver (seconds per pair),
    via the production raw-rows upload path (int8 quantized uploads: the
    tunnel drops to ~45 MB/s after any D2H transfer, so upload bytes are
    the steady-state bottleneck)."""
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

    vecalign_batched_from_rows(pairs, quantize=True, **kwargs)  # warmup/compile

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
            fut = ex.submit(stage_rows_upload, pairs, True)
            for bi in range(n_buckets):
                handle = fut.result()
                if bi + 1 < n_buckets:
                    fut = ex.submit(stage_rows_upload, pairs, True)
                run_staged(handle, **kwargs)
            times.append((time.perf_counter() - t0) / n_buckets)
    return min(times) / batch


def main():
    stack, ours, (v0, v1) = run_align()
    batched = run_batched(v0, v1)
    baseline = run_oracle_baseline(stack, v0, v1)

    # DP cells/sec: total banded cells (types x A x B) + dense cells, per second
    cells = 0
    for depth, entry in stack.items():
        if "a_b_costs" in entry:
            cells += int(np.prod(np.asarray(entry["a_b_costs"]).shape))
        if "costs_1to1" in entry:
            cells += int(np.prod(np.asarray(entry["costs_1to1"]).shape))

    import jax

    result = {
        "metric": "doc_pairs_aligned_per_hour_per_chip",
        "value": round(3600.0 / batched, 2),
        "unit": "doc-pairs/hour/chip",
        "vs_baseline": round(baseline / batched, 3),
        "batched_seconds_per_pair": round(batched, 4),
        "single_pair_seconds": round(ours, 4),
        "baseline_numpy_seconds_per_pair": round(baseline, 4),
        "dp_cells_per_sec": round(cells / batched, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
