"""Minimal repro for the TPU worker crash in the batched dense DP.

tools/bisect_grid_fault.py isolated the fault to the batched dense DP at
(P=16, 256, 256) — gridded hour-bucket shapes — while (16, 209, 204) and
(16, 129, 129) ran fine. This probes a shape grid one SUBPROCESS per
shape (a faulting program kills the TPU worker; isolation keeps one
crash from poisoning the next probe). It now exercises the production
path (_batched_dense_bp: device scan + HOST reassembly) — with the
on-device (r, c) gathers removed, every historical crash shape passes;
keep this tool around to re-verify if the reassembly ever moves back on
device.

    python tools/repro_dense_fault.py            # sweep shapes
    python tools/repro_dense_fault.py 16 256 256 # probe one shape
"""

import subprocess
import sys


def probe(p: int, n: int, m: int) -> str:
    code = f"""
import numpy as np, jax, jax.numpy as jnp
from svecalign_tpu.vecalign import batch as B
rng = np.random.default_rng(0)
costs = jnp.asarray(rng.random(({p}, {n}, {m}), dtype=np.float32))
pen = jnp.full(({p},), 0.5, jnp.float32)
bp = B._batched_dense_bp(costs, pen)
print("SUM", int(np.sum(bp.astype(np.int64))))
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=580, cwd="/root/repo",
    )
    if r.returncode == 0 and "SUM" in r.stdout:
        return "ok"
    if "UNAVAILABLE" in r.stderr or "crashed" in r.stderr:
        return "CRASH"
    return f"rc={r.returncode}: {r.stderr.strip().splitlines()[-1][:120] if r.stderr.strip() else '?'}"


def main() -> None:
    if len(sys.argv) == 4:
        p, n, m = map(int, sys.argv[1:])
        print(f"({p},{n},{m}): {probe(p, n, m)}", flush=True)
        return
    for p, n, m in [
        (16, 256, 256),
        (16, 255, 255),
        (16, 257, 257),
        (16, 256, 255),
        (16, 240, 240),
        (16, 224, 224),
        (1, 256, 256),
        (4, 256, 256),
        (16, 288, 288),
        (16, 512, 512),
    ]:
        print(f"({p},{n},{m}): {probe(p, n, m)}", flush=True)


if __name__ == "__main__":
    main()
