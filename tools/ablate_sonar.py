"""Ablation timings for the SONAR conformer trunk on the real chip.

Times the trunk forward (scan-slope: chained N vs 2N iterations inside one
jit, differenced) under config ablations to locate the device-time sinks:
position flavor (relative_key / relative / none) and depthwise-conv kernel
size. Run from /root/repo (axon cwd requirement):

    python tools/ablate_sonar.py [--rows 8] [--frames 2000] [--iters 3]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def time_trunk(pos_type: str, conv_kernel: int, rows: int, frames: int, iters: int):
    import jax
    import jax.numpy as jnp

    from svecalign_tpu.models.sonar_encoder import SonarEncoderConfig, SonarSpeechModel

    cfg = SonarEncoderConfig(
        position_embeddings_type=pos_type, conv_kernel=conv_kernel
    )
    model = SonarSpeechModel(config=cfg, batch_size=rows)
    samples = 400 + (frames - 1) * 160
    rng = np.random.default_rng(0)
    wav = jax.device_put(jnp.asarray(
        (rng.standard_normal((rows, samples)) * 8000).astype(np.int16)
    ))
    scales = jax.device_put(jnp.full((rows,), 1.0 / 32767.0, jnp.float32))
    lengths = jax.device_put(jnp.full((rows,), frames, jnp.int32))

    def make_chained(n):
        @jax.jit
        def chained(params, w, s, lens):
            def body(c, _):
                emb = model._forward.__wrapped__(params, w, s, lens + c, frames)
                return jnp.int32(jnp.sum(emb)) % 2, None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c

        return chained

    def timed(n):
        fn = make_chained(n)
        np.asarray(fn(model.params, wav, scales, lengths))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(fn(model.params, wav, scales, lengths))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(2 * iters) - timed(iters)) / iters
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--configs", type=str,
                    default="relative_key:31,none:31,none:1,relative:31")
    args = ap.parse_args()

    for spec in args.configs.split(","):
        pos, kern = spec.split(":")
        dt = time_trunk(pos, int(kern), args.rows, args.frames, args.iters)
        print(f"pos={pos:<13} conv_k={kern:>3}  {dt*1e3:8.2f} ms/forward",
              flush=True)


if __name__ == "__main__":
    main()
