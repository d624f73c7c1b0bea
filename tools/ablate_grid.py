"""Interleaved same-window A/B of the align shape-grid modes.

Round 4 shipped a pow2 shape grid (vecalign/batch.py shape_grid_mode) to
collapse align compile keys — and the fused bench headline regressed
~30% (9.4 -> 12.5 ms/pair) in the same round. At example size the pow2
grid pads 237x217 -> 256x256 = 1.27x the cells, which matches the
slowdown almost exactly — but per the repo measurement rule (CLAUDE.md)
axon numbers are only comparable when the competing programs run
interleaved in ONE window. This tool measures that: the bench headline
workload (committed example pair, fused device staging, pair_batch 64)
through each grid mode round-robin, min-of-N per mode.

Usage (on chip):

    python tools/ablate_grid.py --batch 64 --reps 4
    python tools/ablate_grid.py --modes off,pow2,quarter,eighth

Prints one JSON report: per-mode ms/pair + the padded dims each mode
compiles, plus a pure-arithmetic cell-inflation / compile-class table
for a mix of document sizes (no chip needed for that part).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EXAMPLE = Path("/root/reference/example/voxpopuli")
STEM = "20180313-0900-PLENARY-15"


def class_arithmetic(modes):
    """No-chip part: cell inflation + compile-class counts per mode over a
    representative size mix (example pair + rehearsal-like sizes)."""
    from svecalign_tpu.vecalign import batch as B

    # doc dims (segments per side) seen in bench + rehearsal corpora
    size_mix = [
        (237, 217),            # committed example pair (bench headline)
        (2000, 2000),          # hour-scale stress pair
        (480, 520), (250, 300), (700, 650), (120, 90), (1500, 1400),
        (333, 345), (610, 580), (95, 260),
    ]
    out = {}
    for mode in modes:
        os.environ["SVECALIGN_SHAPE_GRID"] = mode
        infl, classes = [], set()
        for n, m in size_mix:
            if mode == "off":
                gn, gm = n, m
            else:
                gn, gm = B._grid_dim(n), B._grid_dim(m)
            infl.append(gn * gm / (n * m))
            classes.add((gn, gm))
        ex = size_mix[0]
        gn = ex[0] if mode == "off" else B._grid_dim(ex[0])
        gm = ex[1] if mode == "off" else B._grid_dim(ex[1])
        out[mode] = {
            "example_dims": [gn, gm],
            "example_cell_inflation": round(gn * gm / (ex[0] * ex[1]), 3),
            "mean_cell_inflation": round(float(np.mean(infl)), 3),
            "compile_classes_over_mix": len(classes),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n_buckets", type=int, default=4,
                    help="staged buckets per timed sample (bench uses 4)")
    ap.add_argument("--modes", default="off,pow2,quarter,eighth")
    ap.add_argument("--arith_only", action="store_true",
                    help="skip the chip measurement (class table only)")
    args = ap.parse_args()
    modes = args.modes.split(",")

    report = {"modes": modes, "batch": args.batch,
              "arithmetic": class_arithmetic(modes)}
    if args.arith_only:
        print(json.dumps(report))
        return

    from svecalign_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache
    from svecalign_tpu.utils.embedding_utils import make_doc_ids, read_in_embeddings
    from svecalign_tpu.vecalign.batch import run_staged, stage_rows_device
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    s2i, emb0 = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/en/{STEM}_en.txt"),
        str(EXAMPLE / f"embeds/en/{STEM}_en.embed"), use_stopes=True)
    t2i, emb1 = read_in_embeddings(
        str(EXAMPLE / f"cat_segs/de/{STEM}_de.txt"),
        str(EXAMPLE / f"embeds/de/{STEM}_de.embed"), use_stopes=True)
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
    pairs = [(dev[0], ids0, dev[1], ids1) for _ in range(args.batch)]
    kwargs = dict(
        final_alignment_types=make_alignment_types(6),
        del_percentile_frac=0.2, width_over2=8, max_size_full_dp=300,
        costs_sample_size=20000, num_samps_for_norm=100,
    )

    def one_pass():
        return run_staged(stage_rows_device(pairs), **kwargs)

    # warm every mode's program family first (cold compiles excluded),
    # and pin that each mode's ALIGNMENTS are index-identical
    ref_aligns = None
    compile_s = {}
    for mode in modes:
        os.environ["SVECALIGN_SHAPE_GRID"] = mode
        t0 = time.perf_counter()
        res = one_pass()
        compile_s[mode] = round(time.perf_counter() - t0, 2)
        aligns = [a for a, _ in res]
        if ref_aligns is None:
            ref_aligns = aligns
        else:
            assert aligns == ref_aligns, f"mode {mode} changed alignments!"
        print(f"warm {mode}: {compile_s[mode]}s (cold)", file=sys.stderr)

    # round-robin interleaved timing: one window, min-of-N per mode
    times = {m: [] for m in modes}
    for rep in range(args.reps):
        for mode in modes:
            os.environ["SVECALIGN_SHAPE_GRID"] = mode
            t0 = time.perf_counter()
            for _ in range(args.n_buckets):
                one_pass()
            times[mode].append((time.perf_counter() - t0) / args.n_buckets)
        print(f"rep {rep}: " + " ".join(
            f"{m}={times[m][-1] / args.batch * 1e3:.2f}ms" for m in modes),
            file=sys.stderr)

    report["cold_first_pass_s"] = compile_s
    report["ms_per_pair"] = {
        m: round(min(ts) / args.batch * 1e3, 3) for m, ts in times.items()}
    report["all_reps_ms_per_pair"] = {
        m: [round(t / args.batch * 1e3, 3) for t in ts]
        for m, ts in times.items()}
    best = min(report["ms_per_pair"], key=report["ms_per_pair"].get)
    report["best_mode"] = best
    print(json.dumps(report))


if __name__ == "__main__":
    main()
