"""bench.py contract: ONE machine-readable JSON line on stdout, always.

The driver runs ``python bench.py`` on the real chip and records stdout.
Round 3's capture was lost because a tunnel outage produced a raw traceback
instead of JSON (BENCH_r03.json: parsed=null). These tests force a terminal
backend failure (a bogus platform, zero retries) and assert the failure
record is still one parseable JSON line.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_bench_with_bad_platform():
    env = {
        "PATH": "/usr/bin:/bin",
        "HOME": "/root",
        # a platform jax cannot initialize; the probe honors non-axon
        # JAX_PLATFORMS explicitly so this fails fast instead of hanging
        "JAX_PLATFORMS": "bogus_platform",
        "SVECALIGN_BENCH_INIT_ATTEMPTS": "1",
        "SVECALIGN_BENCH_PROBE_TIMEOUT": "120",
    }
    return subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=300,
    )


def test_error_path_emits_one_json_line():
    proc = _run_bench_with_bad_platform()
    assert proc.returncode != 0  # failure must stay visible to the driver
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "doc_pairs_aligned_per_hour_per_chip"
    assert rec["value"] is None
    assert "error" in rec and rec["error"]
    # the record should say what actually went wrong
    assert "bogus" in rec["error"] or "attempts" in rec["error"]
