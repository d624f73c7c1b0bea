"""Hour-scale stress config: batched alignment of 2000x2000-segment pairs.

The BASELINE.md "hour-scale documents" row comes from this script: synthetic
hour-long plenaries (2000 VAD segments per side -> ~10k overlap rows per
document), batch 4, int8 uploads, 5-level pyramid. Prints seconds/pair and
pairs/hour/chip, plus the fused (device-resident) variant.

Usage: python tools/stress_hour_scale.py [--nseg 2000] [--batch 4]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_pair(rng, nseg: int, dim: int = 1024, n_over: int = 5):
    """Random unit-ish embedding rows + the concat-stage id layout:
    overlap plane j holds windows (i..i+j), -1 past the document tail."""
    rows = np.zeros((nseg * n_over, dim), np.float16)
    rows[:] = rng.standard_normal((nseg * n_over, dim)).astype(np.float16)
    ids = np.full((n_over, nseg), -1, np.int32)
    r = 0
    for i in range(nseg):
        for j in range(n_over):
            if i + j < nseg:
                ids[j, i] = r
                r += 1
    return rows[:r], ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nseg", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--quant", type=str, default="int8")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from svecalign_tpu.utils import embed_cache
    from svecalign_tpu.vecalign import batch as B
    from svecalign_tpu.vecalign.vecalign import make_alignment_types

    rng = np.random.default_rng(0)
    e0, i0 = synth_pair(rng, args.nseg)
    e1, i1 = synth_pair(rng, args.nseg)
    pairs = [(e0, i0, e1, i1) for _ in range(args.batch)]
    kwargs = dict(
        final_alignment_types=make_alignment_types(6),
        del_percentile_frac=0.2,
        width_over2=8,
        max_size_full_dp=300,
        costs_sample_size=20000,
        num_samps_for_norm=100,
    )

    # upload path (the standalone align CLI)
    B.run_staged(B.stage_rows_upload(pairs, quantize=args.quant), **kwargs)  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        B.run_staged(B.stage_rows_upload(pairs, quantize=args.quant), **kwargs)
    per = (time.perf_counter() - t0) / args.iters / args.batch
    print(
        f"upload({args.quant}): {per:.3f} s/pair  "
        f"{3600 / per:.0f} pairs/hour/chip  "
        f"({B.upload_stats['bytes'] / max(B.upload_stats['buckets'], 1) / args.batch / 1e6:.2f} MB staged/pair)"
    )

    # fused path (pipeline --fused): rows already on device
    r_max = 1 << (max(e0.shape[0], e1.shape[0]) - 1).bit_length()
    embed_cache.max_rows = r_max
    dev_pairs = []
    for e, i in ((e0, i0), (e1, i1)):
        padded = np.zeros((r_max, e.shape[1]), np.float16)
        padded[: e.shape[0]] = e
        dev_pairs.append(jnp.asarray(padded))
    fpairs = [(dev_pairs[0], i0, dev_pairs[1], i1) for _ in range(args.batch)]
    B.run_staged(B.stage_rows_device(fpairs), **kwargs)  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        B.run_staged(B.stage_rows_device(fpairs), **kwargs)
    per_f = (time.perf_counter() - t0) / args.iters / args.batch
    print(f"fused: {per_f:.3f} s/pair  {3600 / per_f:.0f} pairs/hour/chip")


if __name__ == "__main__":
    main()
