"""Bisect which device stage kills the TPU worker at gridded hour shapes.

Two runs crashed deterministically at batch.py's dense-level pull for the
rehearsal's hour bucket once the shape grid padded it to (1024, 1024) —
the pull is only where the async error surfaces, so this script forces
each queued program in pipeline order (staging gather, masked downsample,
norm sampling, deletion knob, dense costs, dense DP) with a tiny pull
after each and prints how far it got. Run it twice: with the grid on
(default) and with SVECALIGN_SHAPE_GRID=0 (control — this configuration
completed on chip before the grid existed).

    python tools/bisect_grid_fault.py /tmp/reh4full [--pairs 16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def step(name, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"OK {name}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus")
    ap.add_argument("--pairs", type=int, default=16,
                    help="bucket size: the LARGEST this many pairs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from svecalign_tpu.seg_align import align as align_mod
    from svecalign_tpu.utils import embed_cache
    from svecalign_tpu.utils.embedding_utils import (
        make_doc_ids,
        read_sent2id,
    )
    from svecalign_tpu.utils.file_utils import read_metadata
    from svecalign_tpu.vecalign import batch as B
    from svecalign_tpu.vecalign.vecalign import load_ignore_index_file

    corpus = Path(args.corpus)
    mined = corpus / "mined"
    pairs = read_metadata((corpus / "metadata.tsv").as_posix())
    valid = align_mod.collect_pair_tasks(
        pairs,
        {
            "segs": (mined / "segments" / "en", mined / "segments" / "de"),
            "concats": (mined / "cat_segs" / "en", mined / "cat_segs" / "de"),
            "embeds": (mined / "embeds" / "en", mined / "embeds" / "de"),
        },
        Path("/tmp/bisect_out"),
        ign_indices_dir=mined / "untrans_cat_seg_ids" / "en-de",
    )

    from svecalign_tpu.pipeline import _auto_size_fused_cache

    embed_cache.enable()
    _auto_size_fused_cache(mined / "cat_segs", ("en", "de"))

    items = []
    for p in valid:
        entry = []
        for seg_path, concat_path, embed_path, ign in zip(
            p.segs, p.concats, p.embeds, p.ignores
        ):
            embed_cache.put_from_file(embed_path)
            rows_n, dev = embed_cache.get(embed_path)
            lines = open(seg_path, encoding="utf-8").readlines()
            ids = make_doc_ids(
                read_sent2id(concat_path), rows_n, lines, 5,
                ignore_indices=load_ignore_index_file(ign) if ign else None,
                overlap_segments=True,
            )
            entry += [dev, ids]
        items.append(tuple(entry))

    items.sort(key=lambda it: it[1].shape[1] + it[3].shape[1])
    bucket = items[-args.pairs:]
    print(f"bucket sizes: n={max(i[1].shape[1] for i in bucket)} "
          f"m={max(i[3].shape[1] for i in bucket)} P={len(bucket)} "
          f"grid={'ON' if B.shape_grid_enabled() else 'OFF'}", flush=True)

    def pull(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    handle = step("stage_rows_device (dispatch)",
                  lambda: B.stage_rows_device(bucket))
    v0, v1, sizes0, sizes1 = handle
    step("staging force", lambda: (pull(v0[:, :, -1]), pull(v1[:, :, -1])))

    d_sizes0 = jnp.asarray(sizes0.astype(np.int32))
    d_sizes1 = jnp.asarray(sizes1.astype(np.int32))
    lvl = {"v0": v0, "v1": v1, "d0": d_sizes0, "d1": d_sizes1}
    depth = 0
    s0, s1 = v0.shape[2], v1.shape[2]
    while s0 * s1 > 300 ** 2:
        depth += 1
        s0 //= 2
        s1 //= 2
        lvl = {
            "v0": B._downsample_masked(lvl["v0"], lvl["d0"]),
            "v1": B._downsample_masked(lvl["v1"], lvl["d1"]),
            "d0": lvl["d0"] // 2, "d1": lvl["d1"] // 2,
        }
        step(f"downsample depth {depth} "
             f"({lvl['v0'].shape[2]}x{lvl['v1'].shape[2]})",
             lambda: pull(lvl["v0"][:, :, -1]))

    import math

    key = jax.random.PRNGKey(42)
    o1 = lvl["v1"].shape[1]
    samps1 = math.ceil(100 / o1)
    sample1 = B._device_norm_sample(key, lvl["v1"], lvl["d1"], samps1)
    n0 = B._batched_norms_from_sample(lvl["v0"], sample1)
    sample0 = B._device_norm_sample(key, lvl["v0"], lvl["d0"],
                                    math.ceil(100 / lvl["v0"].shape[1]))
    n1 = B._batched_norms_from_sample(lvl["v1"], sample0)
    step("norm sampling", lambda: (pull(n0), pull(n1)))

    pen = B._device_knob_penalty(
        key, lvl["v0"][:, 0], lvl["v1"][:, 0], n0[:, 0], n1[:, 0],
        lvl["d0"], lvl["d1"], S=20000, frac=0.2,
    )
    step("deletion knob", lambda: pull(pen))

    costs = B._batched_dense_costs(
        lvl["v0"][:, 0], lvl["v1"][:, 0], n0[:, 0], n1[:, 0]
    )
    step("dense costs", lambda: pull(costs))

    bp = B._batched_dense_bp(costs, pen)
    step("dense dp", lambda: float(np.sum(bp.astype(np.int64))))
    print("ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
