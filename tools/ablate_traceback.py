"""A/B the device-side DP traceback against the host-pull path, interleaved.

The batched aligner's host path pulls the FULL backpointer planes per
bucket (~10 MB at pair_batch 64, example size) — the tunnel's pulls are
superlinear in bytes and stall the host afterwards (tools/ablate_stall.py).
SVECALIGN_DEVICE_TRACEBACK walks the pointers on device and pulls only the
visited path (~0.7 MB). This tool measures the end-to-end effect by the
repo's rule: both modes round-robin in ONE window, paired per-rep ratios
(axon wall drifts too much for separate runs to compare).

Usage (on the chip):
    python tools/ablate_traceback.py --batch 64 --reps 8
    python tools/ablate_traceback.py --hour_scale --batch 8 --reps 4

Prints one JSON report.
"""

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EXAMPLE = Path("/root/reference/example/voxpopuli")
STEM = "20180313-0900-PLENARY-15"


def example_pairs(batch):
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache
    from svecalign_tpu.utils.embedding_utils import make_doc_ids, read_in_embeddings

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
    return [(dev[0], ids0, dev[1], ids1) for _ in range(batch)]


def synth_pairs(batch, n, m, rng):
    """Hour-scale-style synthetic pairs (device fp16 rows + id maps)."""
    import jax.numpy as jnp

    r0, r1 = 5 * n, 5 * m
    e0 = jnp.asarray(rng.standard_normal((r0, 256)).astype(np.float16))
    e1 = jnp.asarray(rng.standard_normal((r1, 256)).astype(np.float16))
    ids0 = rng.integers(0, r0, size=(5, n)).astype(np.int32)
    ids1 = rng.integers(0, r1, size=(5, m)).astype(np.int32)
    return [(e0, ids0, e1, ids1) for _ in range(batch)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--hour_scale", action="store_true",
                    help="2000x2000-segment synthetic pairs instead of the "
                    "example pair")
    args = ap.parse_args()

    from svecalign_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from svecalign_tpu.vecalign.batch import run_staged, stage_rows_device
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    if args.hour_scale:
        pairs = synth_pairs(args.batch, 2000, 2000, np.random.default_rng(0))
    else:
        pairs = example_pairs(args.batch)
    kwargs = dict(
        final_alignment_types=make_alignment_types(6),
        del_percentile_frac=0.2,
        width_over2=8,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
    )

    def run(mode):
        os.environ["SVECALIGN_DEVICE_TRACEBACK"] = mode
        t0 = time.perf_counter()
        out = run_staged(stage_rows_device(pairs), **kwargs)
        return time.perf_counter() - t0, out

    # warm both program sets (order: host first, device second)
    _, out_host = run("0")
    _, out_dev = run("1")
    # outputs must be identical before any timing claim
    for (a_h, s_h), (a_d, s_d) in zip(out_host, out_dev):
        assert a_d == a_h, "device traceback changed the alignments!"
        np.testing.assert_array_equal(s_d, s_h)

    walls = {"0": [], "1": []}
    ratios = []
    for rep in range(args.reps):
        # order-fair: alternate which mode runs first within the pair
        order = ("0", "1") if rep % 2 == 0 else ("1", "0")
        t = {}
        for mode in order:
            t[mode], _ = run(mode)
        walls["0"].append(t["0"])
        walls["1"].append(t["1"])
        ratios.append(t["0"] / t["1"])

    report = {
        "workload": "hour_scale" if args.hour_scale else "example_pair",
        "pair_batch": args.batch,
        "reps": args.reps,
        "host_tb_wall_s": [round(w, 4) for w in walls["0"]],
        "device_tb_wall_s": [round(w, 4) for w in walls["1"]],
        "host_tb_min_ms_per_pair": round(min(walls["0"]) / args.batch * 1e3, 3),
        "device_tb_min_ms_per_pair": round(min(walls["1"]) / args.batch * 1e3, 3),
        "paired_ratio_host_over_device": [round(r, 4) for r in ratios],
        "median_paired_ratio": round(statistics.median(ratios), 4),
        "outputs_identical": True,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
