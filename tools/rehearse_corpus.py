"""Sustained multi-document e2e rehearsal: the missing evidence class for
the <2 h VoxPopuli budget (BASELINE.md) — every prior e2e run was 1-5 toy
pairs, so the budget was arithmetic, not measurement.

Synthesizes a corpus of paired wav documents (speech-shaped noise bursts
separated by silences, so the energy VAD finds real segments; the "tgt"
side is the same burst pattern with jittered timing and mixed noise, so
alignments are non-trivial but correlated), then drives the FULL 16-stage
fused pipeline over it on the real chip and reports sustained
pairs/hour + the per-stage wall-clock breakdown.

Run from /root/repo (axon cwd requirement):

    python tools/rehearse_corpus.py --out /tmp/rehearsal \
        [--pairs 32] [--hour_pairs 2] [--small_sec 240] [--hour_sec 1800]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synth_document(rng, seconds: float, sr: int = 16000):
    """(src_wav, tgt_wav): shared burst schedule, jittered on the tgt side."""
    n = int(seconds * sr)
    src = np.zeros(n, np.float32)
    tgt = np.zeros(n, np.float32)
    t = 0.0
    while t < seconds - 3.0:
        burst = rng.uniform(0.4, 2.4)        # speech-shaped burst
        gap = rng.uniform(0.3, 1.2)          # silence the VAD can split on
        jit = rng.uniform(-0.12, 0.12)       # tgt timing jitter
        for wav, t0, lowpass in ((src, t, True), (tgt, max(t + jit, 0.0), False)):
            i0, i1 = int(t0 * sr), min(int((t0 + burst) * sr), n)
            if i1 <= i0:
                continue
            m = i1 - i0
            base = rng.standard_normal(m).astype(np.float32)
            if lowpass:
                # 1/f-ish rolloff on the src side only: the two sides must
                # differ spectrally or the untranslated-duplicate filter
                # (fbank MSE <= 5) rightly removes every alignment
                shaped = np.cumsum(base)
                shaped -= shaped.mean()
            else:
                shaped = base
            shaped /= max(np.abs(shaped).max(), 1e-6)
            env = np.sin(np.linspace(0, np.pi, m)) ** 0.5
            wav[i0:i1] = 0.35 * shaped * env
        t += burst + gap
    # independent low-level noise so the two sides are not bit-equal
    src += 0.003 * rng.standard_normal(n).astype(np.float32)
    tgt += 0.003 * rng.standard_normal(n).astype(np.float32)
    return src, tgt


def build_corpus(out: Path, pairs: int, hour_pairs: int,
                 small_sec: float, hour_sec: float) -> Path:
    from svecalign_tpu.utils import audio_io

    rng = np.random.default_rng(0)
    (out / "audio/en").mkdir(parents=True, exist_ok=True)
    (out / "audio/de").mkdir(parents=True, exist_ok=True)
    lines = []
    for i in range(pairs):
        sec = hour_sec if i < hour_pairs else small_sec
        src, tgt = synth_document(rng, sec)
        sp = out / f"audio/en/doc{i:03d}_en.wav"
        tp = out / f"audio/de/doc{i:03d}_de.wav"
        if not sp.exists():
            audio_io.write(str(sp), src, 16000)
        if not tp.exists():
            audio_io.write(str(tp), tgt, 16000)
        lines.append(f"{sp}\t{tp}\n")
        print(f"synth {i + 1}/{pairs} ({sec:.0f}s)", flush=True)
    meta = out / "metadata.tsv"
    meta.write_text("".join(lines))
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--pairs", type=int, default=32)
    ap.add_argument("--hour_pairs", type=int, default=2,
                    help="documents at --hour_sec; the rest use --small_sec")
    ap.add_argument("--small_sec", type=float, default=240.0)
    ap.add_argument("--hour_sec", type=float, default=1800.0)
    ap.add_argument("--pair_batch", type=int, default=16)
    ap.add_argument("--embed_model_type", type=str, default="speech_laser",
                    choices=["speech_laser", "sonar"])
    ap.add_argument("--skip_synth", action="store_true",
                    help="reuse audio already under --out")
    ap.add_argument("--data_parallel", type=int, default=1,
                    help="forwarded to the pipeline (align-stage pair-axis "
                    "sharding; the embed stages auto-shard over all visible "
                    "devices regardless)")
    ap.add_argument("--sharded_index", action="store_true",
                    help="forwarded to the pipeline (score_align shards the "
                    "kNN corpora over the device mesh)")
    ap.add_argument("--overlap_untrans", action="store_true",
                    help="forwarded to the pipeline (untrans stages on a "
                    "background thread concurrent with embed)")
    args = ap.parse_args()

    out = Path(args.out)
    meta = out / "metadata.tsv"
    if not args.skip_synth or not meta.exists():
        meta = build_corpus(out, args.pairs, args.hour_pairs,
                            args.small_sec, args.hour_sec)

    import svecalign_tpu.pipeline as pl

    total_audio_sec = (
        args.hour_pairs * args.hour_sec
        + (args.pairs - args.hour_pairs) * args.small_sec
    ) * 2

    argv = [
        "pipeline", str(meta), str(out / "mined"),
        "--src_lang", "en", "--tgt_lang", "de",
        "--vad_model", "energy", "--fused",
        "--embed_model_type", args.embed_model_type,
        "--pair_batch", str(args.pair_batch),
        # throughput rehearsal: random-weight encoders make absolute DP
        # costs meaningless, so keep the cost gate open — the point is
        # sustained stage throughput, not mining quality
        "--max_cost", "1000",
    ]
    if args.data_parallel != 1:
        argv += ["--data_parallel", str(args.data_parallel)]
    if args.sharded_index:
        argv += ["--sharded_index"]
    if args.overlap_untrans:
        argv += ["--overlap_untrans"]
    old_argv = sys.argv
    sys.argv = argv
    t0 = time.perf_counter()
    try:
        pl.main()
    finally:
        sys.argv = old_argv
    wall = time.perf_counter() - t0

    finals = sorted(
        (out / "mined").glob("alignments_*_tsvs/en-de/align.rm_overlap.sort.tsv.gz")
    )
    n_mined = 0
    if finals:
        import gzip

        with gzip.open(finals[0], "rt") as fp:
            n_mined = sum(1 for _ in fp)

    # long-process health: host RSS is the 1-core box's scarcest resource
    # after the tunnel; a leak here is exactly what a 24-h shard dies of
    rss_kb = 0
    try:
        with open("/proc/self/status") as fp:
            for line in fp:
                if line.startswith("VmRSS:"):
                    rss_kb = int(line.split()[1])
                    break
    except OSError:
        pass

    report = {
        "pairs": args.pairs,
        "host_rss_gb": round(rss_kb / 1e6, 2),
        "hour_pairs": args.hour_pairs,
        "total_audio_hours": round(total_audio_sec / 3600, 2),
        "wall_seconds": round(wall, 1),
        "doc_pairs_per_hour_sustained": round(args.pairs / (wall / 3600), 1),
        "audio_hours_per_wall_hour": round(
            (total_audio_sec / 3600) / (wall / 3600), 1
        ),
        "mined_rows": n_mined,
        "stage_seconds": {k: round(v, 1) for k, v in pl.stage_seconds.items()},
    }
    print(json.dumps(report, indent=2))
    (out / "report.json").write_text(json.dumps(report))


if __name__ == "__main__":
    main()
