"""Isolate the on-device cost of the window assembler (ops/assemble.py).

The interleaved embed A/B measured device-assembled encodes ~1.8 s slower
per 54-chunk file than host staging purely in device time (pull_s), i.e.
~33 ms per assembler call — ~250x the HBM-traffic floor. This ablation
times the assembler's pieces as scan slopes (N vs 2N chained in one jit,
the only reliable timing through the axon tunnel — CLAUDE.md) to find
where those milliseconds live.

Run from /root/repo:  python tools/ablate_assemble.py
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

WAVE_LEN = 240 * 16000
BLOCK = 16000
WIDTH = 20 * 16000
ROWS = 7


def scan_slope(make_step, carry0, n=8):
    """Chained scan timing: returns seconds per step."""

    def timed(k):
        @jax.jit
        def run(c):
            def body(c, _):
                return make_step(c), None

            c, _ = jax.lax.scan(body, c, None, length=k)
            return c

        np.asarray(jax.tree.leaves(run(carry0))[0])  # compile+warm
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(run(carry0))[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(2 * n) - timed(n)) / n


def main():
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.integers(-30000, 30000, WAVE_LEN).astype(np.int16))
    scales = jnp.asarray(np.full(WAVE_LEN // BLOCK, 1 / 32767.0, np.float32))
    idx = jnp.asarray(
        np.stack(
            [
                rng.integers(0, WAVE_LEN - WIDTH, ROWS).astype(np.int32),
                np.full(ROWS, WIDTH, np.int32),
                np.full(ROWS, WIDTH, np.int32),
            ],
            axis=1,
        )
    )
    wave_f32 = (wave.astype(jnp.float32) * 1 / 32767.0)
    wave_padded = jnp.concatenate([wave_f32, jnp.zeros(WIDTH, jnp.float32)])

    # 1. dequant only (whole wave int16 -> f32 with block scales + concat)
    def dequant(c):
        w = (wave + c).astype(jnp.float32).reshape(-1, BLOCK) * scales[:, None]
        w = jnp.concatenate([w.reshape(-1), jnp.zeros(WIDTH, jnp.float32)])
        return c + jnp.int16(jnp.sum(w[:1]) % 2)

    print(f"dequant+concat: {scan_slope(dequant, jnp.int16(0)) * 1e3:.3f} ms",
          flush=True)

    # 2. fori_loop slices only (from prebuilt padded f32 wave)
    def slices(c):
        def body(r, out):
            row = jax.lax.dynamic_slice(wave_padded, (idx[r, 0] + c,), (WIDTH,))
            return jax.lax.dynamic_update_slice(out, row[None, :], (r, 0))

        rows = jax.lax.fori_loop(
            0, ROWS, body, jnp.zeros((ROWS, WIDTH), jnp.float32)
        )
        return (c + jnp.int32(jnp.sum(rows[:, :1])) % 2) % 8

    print(f"fori slices:    {scan_slope(slices, jnp.int32(0)) * 1e3:.3f} ms",
          flush=True)

    # 3. vmap gather slices (the round-3 first attempt, for comparison)
    def gslices(c):
        def one(start):
            return jax.lax.dynamic_slice(wave_padded, (start + c,), (WIDTH,))

        rows = jax.vmap(one)(idx[:, 0])
        return (c + jnp.int32(jnp.sum(rows[:, :1])) % 2) % 8

    print(f"vmap slices:    {scan_slope(gslices, jnp.int32(0)) * 1e3:.3f} ms",
          flush=True)

    # 4. mask + per-row requantize only
    rows0 = jnp.asarray(rng.standard_normal((ROWS, WIDTH)).astype(np.float32))

    def requant(c):
        rows = rows0 + c
        rows = jnp.where(jnp.arange(WIDTH)[None, :] < idx[:, 1][:, None], rows, 0.0)
        peak = jnp.max(jnp.abs(rows), axis=1)
        scale = jnp.where(peak > 0, peak / 32767.0, 1.0)
        rows_q = jnp.rint(rows / scale[:, None]).astype(jnp.int16)
        return (c + rows_q[0, 0].astype(jnp.float32) % 2) % 8

    print(f"mask+requant:   {scan_slope(requant, jnp.float32(0)) * 1e3:.3f} ms",
          flush=True)

    # 5. the dequant+concat producer FUSED into the gather consumer (the
    # round-3 single-program assembler): this is what the embed A/B showed
    # costing ~28 ms per chunk — XLA fuses the dequant into the gather and
    # the gather degenerates
    def fused_producer(c):
        w = wave.astype(jnp.float32).reshape(-1, BLOCK) * scales[:, None]
        w = jnp.concatenate([w.reshape(-1), jnp.zeros(WIDTH, jnp.float32)])

        def one(start):
            return jax.lax.dynamic_slice(w, (start + c,), (WIDTH,))

        rows = jax.vmap(one)(idx[:, 0])
        peak = jnp.max(jnp.abs(rows), axis=1)
        scale = jnp.where(peak > 0, peak / 32767.0, 1.0)
        rows_q = jnp.rint(rows / scale[:, None]).astype(jnp.int16)
        return (c + rows_q[0, 0].astype(jnp.int32) % 2) % 8

    print(f"fused producer: {scan_slope(fused_producer, jnp.int32(0)) * 1e3:.3f} ms",
          flush=True)

    # 6. the production pair: materialized dequant (once per file) + the
    # real assembler program (ops/assemble.py get_dequant/get_assembler)
    from svecalign_tpu.ops.assemble import get_assembler, get_dequant

    wp = get_dequant(WAVE_LEN, WIDTH)(wave, scales)
    asm = get_assembler(WAVE_LEN + WIDTH, WIDTH, False)

    def composite(c):
        rows_q, scale, lens = asm(wp, idx.at[0, 0].add(c))
        return (c + rows_q[0, 0].astype(jnp.int32) % 2) % 8

    print(f"real assembler: {scan_slope(composite, jnp.int32(0)) * 1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
