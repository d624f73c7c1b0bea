"""Multi-host (DCN) and file-shard distribution tests.

Two layers, matching SURVEY.md section 5.8 / section 4 implication (d):
- the ``SVECALIGN_COORDINATOR`` -> ``jax.distributed.initialize`` hook is
  exercised with two REAL local processes over CPU, completing a psum
  across the 2-process pod (the reference has no collective layer at all;
  this is the TPU-native addition);
- the reference's ``--rank/--n_shard`` file contract is checked for shard
  -union invariance: the union of n_shard=4 stage outputs must equal the
  n_shard=1 output (segment stage, energy VAD, synthetic wavs).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
from svecalign_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp

pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()  # one CPU dev per proc

# a real cross-process collective: sum of (process_id + 1) over the pod
from functools import partial
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("dcn",))
local = jnp.ones((1,), jnp.float32) * (pid + 1)
arr = jax.make_array_from_single_device_arrays(
    (2,), NamedSharding(mesh, P("dcn")), [jax.device_put(local, jax.local_devices()[0])]
)

@partial(jax.shard_map, mesh=mesh, in_specs=P("dcn"), out_specs=P())
def pod_sum(x):
    return jax.lax.psum(x, "dcn")

total = pod_sum(arr)
val = float(total.addressable_data(0)[0])
assert val == 3.0, val
print(f"proc {pid} OK psum={val}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_psum(tmp_path):
    port = _free_port()
    import numpy  # noqa: F401  (worker uses np via inherited import)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            SVECALIGN_COORDINATOR=f"127.0.0.1:{port}",
            SVECALIGN_NUM_PROCESSES="2",
            SVECALIGN_PROCESS_ID=str(pid),
            SVECALIGN_NO_COMPILE_CACHE="1",
        )
        env.pop("XLA_FLAGS", None)  # one device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", "import numpy as np\n" + _WORKER],
                env=env,
                cwd="/root/repo",
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert any("proc 0 OK psum=3.0" in o for o in outs), outs
    assert any("proc 1 OK psum=3.0" in o for o in outs), outs


# ---------------------------------------------------------------------------
# rank/n_shard union invariance (the reference's inter-job contract)
# ---------------------------------------------------------------------------


def _make_corpus(tmp_path: Path, n_pairs: int = 5):
    """Synthetic tiny wav metadata: tone bursts so the energy VAD finds
    real segments."""
    from svecalign_tpu.utils.audio_utils import save_waveform

    sr = 16000
    rng = np.random.default_rng(0)
    meta = tmp_path / "metadata.tsv"
    lines = []
    for i in range(n_pairs):
        audio = 1e-4 * rng.standard_normal(sr * 3).astype(np.float32)
        t = np.arange(len(audio)) / sr
        s = 0.5 + 0.2 * i
        seg = (t >= s) & (t < s + 1.0)
        audio[seg] += 0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t[seg]).astype(
            np.float32
        )
        src = tmp_path / f"doc{i}_en.wav"
        tgt = tmp_path / f"doc{i}_de.wav"
        save_waveform(audio, str(src), sr)
        save_waveform(audio[::-1].copy(), str(tgt), sr)
        lines.append(f"{src}\t{tgt}")
    meta.write_text("\n".join(lines) + "\n")
    return meta


def _run_segment(meta: Path, out_dir: Path, rank: int, n_shard: int):
    from svecalign_tpu.preprocess import segment

    argv = [
        "segment", str(meta), str(out_dir),
        "--lang", "en",
        "--vad_model", "energy",
        "--rank", str(rank), "--n_shard", str(n_shard),
    ]
    old = sys.argv
    sys.argv = argv
    try:
        segment.main()
    finally:
        sys.argv = old


def test_segment_shard_union_invariance(tmp_path):
    """union(n_shard=4 outputs) == n_shard=1 outputs, file-for-file."""
    meta = _make_corpus(tmp_path)

    single = tmp_path / "single"
    _run_segment(meta, single, 0, 1)
    sharded = tmp_path / "sharded"
    for rank in range(4):
        _run_segment(meta, sharded, rank, 4)

    single_files = sorted((single / "en").glob("*.txt"))
    sharded_files = sorted((sharded / "en").glob("*.txt"))
    assert [f.name for f in single_files] == [f.name for f in sharded_files]
    assert len(single_files) == 5
    for a, b in zip(single_files, sharded_files):
        assert a.read_text() == b.read_text(), a.name
        assert a.read_text().strip(), f"{a.name} found no speech"


def test_dp_encode_spans_matches_single_device():
    """Embed-stage data parallelism: encode_spans with chunk rows sharded
    over the mesh's data axis must match the single-device path up to
    fp32 reduction-order noise (different per-shard batch shapes compile
    different reduction tilings, so the check is per-row cosine)."""
    from svecalign_tpu.models.laser_encoder import SpeechLaserModel
    from svecalign_tpu.models.sonar_encoder import SonarSpeechModel
    from svecalign_tpu.parallel.mesh import make_mesh
    from tests.test_models import TINY_LASER, TINY_SONAR

    rng = np.random.default_rng(3)
    wave = (0.25 * rng.standard_normal(16000 * 8)).astype(np.float32)
    spans = [(3000 * k, 3000 * k + 14000 + 500 * (k % 3)) for k in range(16)]

    def rows_close(a, b):
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        assert (an * bn).sum(axis=1).min() >= 1 - 1e-5

    kw = dict(config=TINY_LASER, max_tokens=4 * 16000, upload_dtype="fp32")
    out = []
    for mesh in (make_mesh(), make_mesh(n_devices=1)):
        m = SpeechLaserModel(mesh=mesh, **kw)
        m.BUCKETS = (16000,)
        m.WAVE_BUCKETS_S = (10,)
        out.append(m.encode_spans(wave, spans))
    assert out[0].shape == (16, TINY_LASER.encoder_dim)
    rows_close(out[0], out[1])

    skw = dict(config=TINY_SONAR, batch_size=2, upload_dtype="fp32")
    out = []
    for mesh in (make_mesh(), make_mesh(n_devices=1)):
        m = SonarSpeechModel(mesh=mesh, **skw)
        m.BUCKET_FRAMES = (50, 100)
        out.append(m.encode_spans(wave, spans))
    rows_close(out[0], out[1])
