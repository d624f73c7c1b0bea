"""Measure the untranslate-stage fbank paths: host loop vs batched device.

The untranslate stages (preprocess/detect_untranslate_segs,
postprocess/filter_untrans_align) used to compute one fbank per segment on
the host CPU (pinned there to dodge ~25 ms axon roundtrips per tiny call;
~2 h of single-core work at VoxPopuli scale). ops/fbank.fbank_batch now
concatenates a whole file's segments into one program. This tool measures
the crossover on real hardware with an order-fair interleaved A/B (the
profile_embed.py lesson: axon numbers are only comparable when the
competing programs run interleaved in one window).

Usage (from /root/repo, axon default):
    python tools/ablate_fbank.py [--n_segs 400] [--seg_seconds 5] [--reps 5]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_segs", type=int, default=400,
                    help="segments per trial (one document's VAD count)")
    ap.add_argument("--seg_seconds", type=float, default=5.0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from svecalign_tpu.ops.fbank import fbank, fbank_batch

    rng = np.random.default_rng(0)
    lens = (rng.uniform(0.4, args.seg_seconds * 2, args.n_segs) * 16000).astype(int)
    waves = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lens]
    audio_s = float(lens.sum()) / 16000

    # warm both paths with the FULL trial shape: a subset would compile a
    # smaller bucket and the first timed device trial would pay the real
    # compile (20-300 s on axon)
    fbank_batch(waves)
    fbank_batch(waves, on_host=True)
    fbank(waves[0])

    timings = {"device_batch": [], "host_batch": [], "host_loop": []}
    order = ["device_batch", "host_batch", "host_loop"]
    for rep in range(args.reps):
        for mode in order[rep % 3:] + order[: rep % 3]:  # order-fair rotation
            t0 = time.perf_counter()
            if mode == "device_batch":
                fbank_batch(waves)
            elif mode == "host_batch":
                fbank_batch(waves, on_host=True)
            else:
                for w in waves:
                    fbank(w)
            timings[mode].append(time.perf_counter() - t0)

    import jax

    print(f"backend={jax.default_backend()} n_segs={args.n_segs} "
          f"audio={audio_s:.0f}s")
    for mode, ts in timings.items():
        best = min(ts)
        print(f"{mode:13s} best {best:7.3f}s  ({audio_s / best:8.0f}x realtime)  "
              f"all {['%.3f' % t for t in ts]}")


if __name__ == "__main__":
    main()
