"""Phase-level profile of the embed stage's file-encode loop on the real
chip: where does a warm encode of one document's overlap windows spend its
wall time (host slicing, staging waits, forward dispatch, scatter, final
pulls)?  The rehearsal showed embed at 91% of sustained e2e wall
(BASELINE.md) — this tool decides which lever to pull next.

Run from /root/repo (axon cwd requirement), pointing at an existing
rehearsal corpus:

    python tools/profile_embed.py --audio /tmp/rehearsal32b/audio/en/doc005_en.wav \
        --concat /tmp/rehearsal32b/mined/cat_segs/en/doc005_en.txt [--reps 3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", type=str, required=True)
    ap.add_argument("--concat", type=str, required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--assembly", type=str, default="host",
                    choices=["host", "device", "ab"],
                    help="host = slice+stage every window batch (round-2 "
                         "path); device = one waveform upload + on-device "
                         "window gather (encode_spans); ab = alternate the "
                         "two per rep in ONE process (axon numbers are only "
                         "comparable when the competitors share a tunnel "
                         "window — CLAUDE.md measurement rule)")
    ap.add_argument("--ab_max_tokens", type=str, default=None,
                    help="two max_tokens values (seconds) to alternate per "
                         "rep with device assembly, e.g. '150:480' — "
                         "measures whether bigger batches amortize the "
                         "per-chunk dispatch overhead")
    ap.add_argument("--ab_gc", action="store_true", default=False,
                    help="alternate Python GC disabled/enabled per rep in "
                         "device mode — tests whether the multi-second "
                         "host stalls between encodes are gen2 GC passes "
                         "over jax's trace caches rather than client RPC "
                         "work")
    ap.add_argument("--ab_buckets", type=str, default=None,
                    help="two window-bucket sets to alternate per rep, "
                         "e.g. '4,20,30:4,8,14,20,30' — measures the "
                         "padding-waste lever in one tunnel window "
                         "(device assembly only). Units: seconds for "
                         "speech_laser, FRAMES for sonar (BUCKET_FRAMES)")
    ap.add_argument("--ab_fused_chunk", action="store_true", default=False,
                    help="alternate the fused per-chunk program (window "
                         "gather + forward + fp16 scatter as ONE "
                         "executable) against the 3-program split, under "
                         "keep_device+fp16_pull (the fused-pipeline hot "
                         "path). Also bit-compares the two modes' rows.")
    ap.add_argument("--model", type=str, default="speech_laser",
                    choices=["speech_laser", "sonar"],
                    help="which encoder to profile (sonar = w2v-BERT "
                         "conformer; its buckets are frame counts)")
    args = ap.parse_args()

    from svecalign_tpu.models import laser_encoder
    from svecalign_tpu.utils.embed_model_utils import load_embed_model, slice_segments
    from svecalign_tpu.utils.file_utils import read_segments

    from svecalign_tpu.utils.audio_utils import SAMPLE_RATE, load_waveform

    model = load_embed_model(args.model)
    segments = read_segments(args.concat)
    print(f"{len(segments)} windows; total window audio "
          f"{sum(e - s for s, e in segments) / 16000:.0f} s "
          f"(assembly={args.assembly})", flush=True)

    if sum(map(bool, (args.ab_buckets, args.ab_gc, args.ab_max_tokens,
                      args.ab_fused_chunk))) > 1:
        ap.error("--ab_buckets / --ab_gc / --ab_max_tokens / "
                 "--ab_fused_chunk are mutually exclusive (one A/B "
                 "variable per run)")
    modes = {"host": ["host"], "device": ["device"],
             "ab": ["host", "device"]}[args.assembly]
    bucket_sets = None
    bucket_attr = "BUCKETS" if args.model == "speech_laser" else "BUCKET_FRAMES"
    bucket_unit = 16000 if args.model == "speech_laser" else 1
    if args.ab_buckets:
        bucket_sets = [
            tuple(int(x) * bucket_unit for x in part.split(","))
            for part in args.ab_buckets.split(":")
        ]
        modes = [f"device/buckets={i}" for i in range(len(bucket_sets))]
    if args.ab_gc:
        modes = ["device/gc=on", "device/gc=off"]
    if args.ab_fused_chunk:
        from svecalign_tpu.utils import embed_cache

        if getattr(model, "_span_forward_pure", lambda: None)() is None:
            ap.error(
                "--ab_fused_chunk: this encoder cannot inline its forward "
                "(mesh-sharded pjit path, or no _span_forward_pure hook) — "
                "both A/B arms would silently run the split path"
            )
        embed_cache.enable(rows=max(4096, -(-len(segments) // 1024) * 1024))
        modes = ["device/chunk=fused", "device/chunk=split"]
    models = None
    if args.ab_max_tokens:
        secs = [int(x) for x in args.ab_max_tokens.split(":")]
        models = [load_embed_model("speech_laser", max_tokens=s * 16000)
                  for s in secs]
        modes = [f"device/max_tokens={s}s" for s in secs]

    reports = []
    chunk_ab_rows = {}
    for rep in range(args.reps + 1):  # rep 0 = cold (compiles)
        # alternate within-rep order: the tunnel drifts monotonically over
        # a window, so a fixed order systematically biases the later mode
        order = list(enumerate(modes))
        if rep % 2:
            order = order[::-1]
        for mi, mode in order:
            if bucket_sets is not None:
                setattr(model, bucket_attr, bucket_sets[mi])
            if models is not None:
                model = models[mi]
            if args.ab_gc:
                import gc

                gc.disable() if mode.endswith("off") else gc.enable()
            # ambient host-CPU probe: a fixed numpy op (~5 passes over
            # 15 MB). If THIS is slow, host compute in general is being
            # starved (axon client teardown of the previous encode's
            # buffers), not the specific op it lands on.
            probe = np.empty(4_000_000, np.float32)
            t0 = time.perf_counter()
            for _ in range(5):
                float(np.abs(probe).max())
            t_ambient = time.perf_counter() - t0
            prof = laser_encoder.start_encode_profile()
            t0 = time.perf_counter()
            if mode == "host":
                arg = slice_segments(args.audio, segments)
            else:
                arg = load_waveform(args.audio, sr=SAMPLE_RATE)
            t_slice = time.perf_counter() - t0
            t0 = time.perf_counter()
            if mode == "host":
                emb = model.encode(arg)
            elif mode.startswith("device/chunk="):
                import os as _os

                _os.environ["SVECALIGN_FUSED_CHUNK"] = (
                    "1" if mode.endswith("fused") else "0"
                )
                emb, _dev = model.encode_spans(
                    arg, segments, keep_device=True, fp16_pull=True
                )
            else:
                emb = model.encode_spans(arg, segments)
            t_enc = time.perf_counter() - t0
            if args.ab_fused_chunk:
                prev = chunk_ab_rows.get(rep)
                if prev is None:
                    chunk_ab_rows[rep] = np.asarray(emb)
                else:
                    same = np.array_equal(prev, np.asarray(emb))
                    print(f"rep {rep}: fused-vs-split rows "
                          f"{'BIT-IDENTICAL' if same else 'DIFFER (max '
                          + repr(float(np.max(np.abs(prev.astype(np.float32) - np.asarray(emb, dtype=np.float32))))) + ')'}",
                          flush=True)
            rpt = {
                "rep": rep, "cold": rep == 0, "mode": mode,
                "ambient_s": round(t_ambient, 3),
                "slice_s": round(t_slice, 3),
                "encode_s": round(t_enc, 3),
                **{k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in prof.items()},
            }
            rpt["unaccounted_s"] = round(
                t_enc - prof["stage_wait_s"] - prof["forward_dispatch_s"]
                - prof["scatter_dispatch_s"] - prof["pull_s"], 3)
            reports.append(rpt)
            print(json.dumps(rpt), flush=True)
            del emb

    for mode in modes:
        warm = [r for r in reports if not r["cold"] and r["mode"] == mode]
        if warm:
            mean = {k: round(float(np.mean([r[k] for r in warm])), 3)
                    for k in warm[0] if k not in ("rep", "cold", "mode")}
            # min is the tunnel-noise-robust summary (MEASUREMENT RULE)
            best = min(r["slice_s"] + r["encode_s"] for r in warm)
            print(f"WARM {mode}: best_total={best:.3f}", json.dumps(mean),
                  flush=True)


if __name__ == "__main__":
    main()
