"""Isolate the multi-second host-CPU stalls that follow big encodes.

Observed (tools/profile_embed.py): after an hour-file encode, the NEXT
file's pure-numpy quantize runs 20-60x slow for 10-30 s — on this
single-core host something (the axon client?) holds the CPU/GIL. The
stall did NOT scale with chunk count (101 vs 427 chunks: ~16.6 vs
~16.9 s) but both freed ~2 GB of device buffers, suggesting
bytes-proportional client/server work.

This tool generates device work with independently varied (a) allocated/
freed bytes, (b) execution count, (c) pulled bytes, then times a fixed
host numpy probe immediately after. Run from /root/repo on the chip:

    python tools/ablate_stall.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from svecalign_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp


def probe(label: str) -> float:
    a = np.empty(8_000_000, np.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        float(np.abs(a).max())
    dt = time.perf_counter() - t0
    print(f"  probe after {label}: {dt:.3f} s", flush=True)
    return dt


@jax.jit
def _bump(x):
    return x + 1


def churn(n_execs: int, mb_per_exec: int, pull: bool, burst: bool = False):
    """n_execs executions, each allocating/freeing mb_per_exec MB.

    ``burst``: hold every output alive and drop them ALL at once at the
    end — the encode loop's actual free pattern (``pending`` keeps each
    chunk's embedding until the deferred pulls finish, then the whole
    list dies together right when the next file's host phase starts)."""
    n = mb_per_exec * 1024 * 1024 // 2  # int16 elements
    base = jnp.zeros(max(n, 1), jnp.int16)
    kept = []
    out = None
    for _ in range(n_execs):
        out = _bump(base)  # new buffer each call; prior one freed
        if burst:
            kept.append(out)
        if pull:
            np.asarray(out[:1])
    # sync everything, then drop refs
    if out is not None:
        out.block_until_ready()
    del out, base, kept


def main():
    # warm up the jit + device
    churn(4, 1, False)
    probe("warmup")

    for label, execs, mb, pull, burst in [
        ("128 execs x 16 MB (2 GB churn, incremental frees)", 128, 16, False, False),
        ("128 execs x 1 MB (128 MB churn, incremental frees)", 128, 1, False, False),
        ("16 execs x 128 MB (2 GB churn, incremental frees)", 16, 128, False, False),
        ("128 execs x 16 MB + per-exec 4 B pulls", 128, 16, True, False),
        # the encode loop's real shape: everything freed in one burst
        # right before the next file's host phase
        ("128 execs x 16 MB BURST-freed (2 GB at once)", 128, 16, False, True),
        ("128 execs x 1 MB BURST-freed (128 MB at once)", 128, 1, False, True),
    ]:
        t0 = time.perf_counter()
        churn(execs, mb, pull, burst)
        print(f"{label}: churn wall {time.perf_counter() - t0:.2f} s",
              flush=True)
        probe(label)
        time.sleep(1)
        probe(label + " (+1 s later)")
        time.sleep(5)
        probe(label + " (+6 s later)")

    # D2H-bytes case: one big pull (an hour-file's deferred embedding pulls
    # are ~50-100 MB fp32) — is the stall proportional to PULLED bytes?
    # First chip run (2026-08-18) answered YES and only for pulls: frees /
    # execs topped out at 1.9 s of probe damage, while a single 64 MB pull
    # took 3.96 s AND left the probe 80x slow (4.18 s) with 2.79 s still
    # +5 s later. The sweep below sizes the fix: is the post-pull damage
    # linear in bytes (fp16 pulls = half the stall), and does splitting
    # the pull into chunks change anything?
    def pull_case(label, mb, chunks=1):
        n = mb * 1024 * 1024 // 2
        big = _bump(jnp.zeros(n, jnp.int16))
        big.block_until_ready()
        step = n // chunks
        t0 = time.perf_counter()
        for c in range(chunks):
            np.asarray(big[c * step : (c + 1) * step])
        print(f"{label}: pull wall {time.perf_counter() - t0:.2f} s",
              flush=True)
        del big
        probe(label)
        time.sleep(5)
        probe(label + " (+5 s later)")
        time.sleep(10)
        probe(label + " (+15 s later)")

    pull_case("64 MB pull", 64)
    pull_case("32 MB pull (fp16-sized)", 32)
    pull_case("8 MB pull", 8)
    pull_case("64 MB pull in 16 x 4 MB", 64, chunks=16)


if __name__ == "__main__":
    main()
