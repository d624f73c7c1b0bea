"""Does axon compile CONCURRENT programs in parallel?

The embed stage's cold bill (~80-230 s per process for LASER, ~580 s for
SONAR) is paid serially: the chunk loop first-touches each (bucket, rows)
forward one at a time. If the axon compile service overlaps concurrent
compile requests, first-calling every bucket's forward from N threads at
stage start would collapse the bill from sum to roughly max.

One mode per process (the in-process jit cache would poison a second
mode):

    python tools/ablate_compile_parallel.py --mode seq
    python tools/ablate_compile_parallel.py --mode par

Compare the two runs' total_s. Both print per-bucket wall too: in par
mode near-equal per-bucket walls ≈ the service serialized us anyway.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["seq", "par"], required=True)
    ap.add_argument("--model", default="speech_laser",
                    choices=["speech_laser", "sonar"])
    ap.add_argument("--max_tokens", type=int, default=600 * 16000,
                    help="rehearsal setting (pipeline --embed_max_tokens)")
    args = ap.parse_args()

    import numpy as np

    from svecalign_tpu.utils.embed_model_utils import load_embed_model

    model = load_embed_model(args.model, max_tokens=args.max_tokens)
    if args.model == "speech_laser":
        buckets = list(model.BUCKETS)
    else:
        buckets = list(model.BUCKET_FRAMES)

    def touch(bucket):
        """First-call one bucket's forward (compiles it)."""
        rows = model._rows_per_chunk(bucket)
        width = model._bucket_width(bucket)
        wav = np.zeros((rows, width), np.int16)
        scales = np.ones((rows,), np.float32)
        lengths = np.full((rows,), bucket, np.int32)
        t0 = time.perf_counter()
        out = model._span_forward(wav, scales, lengths, bucket)
        np.asarray(out)  # force
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    if args.mode == "seq":
        walls = [touch(b) for b in buckets]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(len(buckets)) as ex:
            walls = list(ex.map(touch, buckets))
    total = time.perf_counter() - t0
    print(
        f"mode={args.mode} model={args.model} total_s={total:.1f} "
        "per_bucket="
        + " ".join(f"{b}:{w:.1f}" for b, w in zip(buckets, walls)),
        flush=True,
    )


if __name__ == "__main__":
    main()
