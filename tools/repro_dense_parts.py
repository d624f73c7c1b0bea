"""Bisect WHICH op inside dense_dp faults the TPU worker at hazard shapes.

tools/repro_dense_fault.py showed the crash follows no simple shape
predicate ((289,289) faults while (257,257) and (513,513) run). This
probes dense_dp's pieces separately at one shape, each in a subprocess:

  diag   — the (n_diags, rmax) anti-diagonal cost gather only
  scan   — the wavefront lax.scan on the gathered diagonals
  gather — the final (d, r) -> (r, c) meshgrid gather
  full   — the whole vmapped dense_dp (control)

    python tools/repro_dense_parts.py 16 288 288
"""

import subprocess
import sys

BODY = """
import numpy as np, jax, jax.numpy as jnp
P, N, M = {p}, {n}, {m}
rng = np.random.default_rng(0)
costs = jnp.asarray(rng.random((P, N, M), dtype=np.float32))
pen = jnp.full((P,), 0.5, jnp.float32)
inf = jnp.float32(jnp.inf)

def diag_of(costs1):
    n, m = costs1.shape
    rmax, cmax = n + 1, m + 1
    r_idx = jnp.arange(rmax, dtype=jnp.int32)
    n_diags = rmax + cmax - 1
    dd = jnp.arange(n_diags, dtype=jnp.int32)[:, None]
    rr = r_idx[None, :]
    cc = dd - rr
    valid = (rr >= 1) & (cc >= 1) & (rr - 1 < n) & (cc - 1 < m)
    return jnp.where(
        valid,
        costs1[jnp.clip(rr - 1, 0, n - 1), jnp.clip(cc - 1, 0, m - 1)],
        inf,
    ), dd[:, 0]

def scan_of(cost_diag, dd, pen1):
    rmax = cost_diag.shape[1]
    cmax = cost_diag.shape[0] - rmax + 1
    r_idx = jnp.arange(rmax, dtype=jnp.int32)
    def shift_down(v):
        return jnp.concatenate([jnp.full((1,), inf), v[:-1]])
    def step(carry, inputs):
        p1, p2 = carry
        cdiag, d = inputs
        c = d - r_idx
        on_grid = (c >= 0) & (c < cmax)
        cost0 = shift_down(p2) + cdiag
        cost1 = p1 + pen1
        cost2 = shift_down(p1) + pen1
        val = jnp.where(cost1 < cost0, cost1, cost0)
        bp = jnp.where(cost1 < cost0, 1, 0)
        bp = jnp.where(cost2 < val, 2, bp)
        val = jnp.where(cost2 < val, cost2, val)
        val = jnp.where(on_grid, val, inf)
        bp = jnp.where(on_grid, bp, -1).astype(jnp.int8)
        return (val, p1), (val, bp)
    p0 = jnp.full((rmax,), inf)
    _, (vd, bd) = jax.lax.scan(step, (p0, p0), (cost_diag, dd))
    return vd, bd

def gather_of(val_diags, rmax, cmax):
    r_idx = jnp.arange(rmax, dtype=jnp.int32)
    rg, cg = jnp.meshgrid(r_idx, jnp.arange(cmax, dtype=jnp.int32),
                          indexing="ij")
    return val_diags[rg + cg, rg]

mode = "{mode}"
if mode == "full":
    from svecalign_tpu.vecalign import batch as B
    bp = B._batched_dense_bp(costs, pen)
    print("SUM", int(np.sum(bp.astype(np.int64))))
elif mode in ("csum_only", "bp_only", "bp_i32", "both_i32"):
    @jax.jit
    @jax.vmap
    def run(costs1, pen1):
        cd, dd = diag_of(costs1)
        vd, bd = scan_of(cd, dd, pen1)
        rmax, cmax = costs1.shape[0] + 1, costs1.shape[1] + 1
        csum = gather_of(vd, rmax, cmax)
        bp = gather_of(bd, rmax, cmax)
        if mode == "csum_only":
            return csum
        if mode == "bp_only":
            return bp
        if mode == "bp_i32":
            return csum, bp.astype(jnp.int32)
        return csum.astype(jnp.float32), bp.astype(jnp.int32)
    out = run(costs, pen)
    leaves = jax.tree.leaves(out)
    print("SUM", [float(jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), x.astype(jnp.float32), 0.0))) for x in leaves][0])
elif mode == "diag":
    cd, dd = jax.jit(jax.vmap(lambda c: diag_of(c)[0]))(costs), None
    print("SUM", float(jnp.sum(jnp.where(jnp.isfinite(cd), cd, 0.0))))
elif mode == "scan":
    @jax.jit
    @jax.vmap
    def run(costs1, pen1):
        cd, dd = diag_of(costs1)
        vd, bd = scan_of(cd, dd, pen1)
        return jnp.sum(bd.astype(jnp.int32))
    print("SUM", int(jnp.sum(run(costs, pen))))
elif mode == "gather":
    @jax.jit
    @jax.vmap
    def run(costs1, pen1):
        cd, dd = diag_of(costs1)
        vd, bd = scan_of(cd, dd, pen1)
        out = gather_of(vd, costs1.shape[0] + 1, costs1.shape[1] + 1)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))
    print("SUM", float(jnp.sum(run(costs, pen))))
"""


def probe(mode: str, p: int, n: int, m: int) -> str:
    code = BODY.format(p=p, n=n, m=m, mode=mode)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=580, cwd="/root/repo",
    )
    if r.returncode == 0 and "SUM" in r.stdout:
        return "ok"
    if "UNAVAILABLE" in r.stderr or "crashed" in r.stderr:
        return "CRASH"
    return f"rc={r.returncode}: {r.stderr.strip().splitlines()[-1][:160] if r.stderr.strip() else '?'}"


def main() -> None:
    p, n, m = map(int, sys.argv[1:4]) if len(sys.argv) >= 4 else (16, 288, 288)
    modes = sys.argv[4:] or ["diag", "scan", "gather", "full"]
    for mode in modes:
        print(f"{mode} ({p},{n},{m}): {probe(mode, p, n, m)}", flush=True)


if __name__ == "__main__":
    main()
