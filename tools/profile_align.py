"""Attribute the batched align stage's wall time: compile vs steady-state.

The rehearsal showed align = 171 s for 32 pairs (5.3 s/pair) while bench
measures ~10 ms/pair warm at example size — the gap is presumed to be
per-bucket-shape axon compiles (every bucket pads to its own max doc
sizes, and each refinement level's band length ``a_pad`` is
data-dependent, so few programs are ever reused across buckets).

This tool measures instead of presuming: it loads a rehearsal corpus's
align-stage inputs (``tools/rehearse_corpus.py`` layout) and runs the
REAL driver (``seg_align.align._run_pairs_batched``) ``--reps`` times in
one process. Rep 1 is cold (compiles included), reps 2+ are warm; the
difference is the compile bill. A wrapper around ``vecalign.batch
.run_staged`` records per-bucket wall and padded shapes, so the report
also shows how many distinct shape sets a run pays for.

Usage (on the chip, after a rehearsal run left /tmp/reh4full behind):

    python tools/profile_align.py /tmp/reh4full --pair_batch 16 --reps 2

Prints one JSON report to stdout.
"""

import argparse
import json
import sys
import time
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus", help="rehearsal dir (metadata.tsv + mined/)")
    ap.add_argument("--pair_batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--upload_quant", default="fp16",
                    help="fp16 mirrors the fused path's precision; the "
                    "rehearsal itself stages rows on device (no upload), "
                    "but the pyramid programs past staging are shared")
    ap.add_argument("--out_dir", default="/tmp/profile_align_out")
    ap.add_argument("--fused", action="store_true",
                    help="pre-fill the embed cache from the .embed files "
                    "(device-resident fp16 rows, as the embed stage leaves "
                    "them) so the run exercises the fused staging path "
                    "(stage_rows_device) instead of the file+upload path")
    args = ap.parse_args()

    corpus = Path(args.corpus)
    mined = corpus / "mined"
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    from svecalign_tpu.seg_align import align as align_mod
    from svecalign_tpu.utils.file_utils import read_metadata
    from svecalign_tpu.vecalign import batch as batch_mod

    pairs = read_metadata((corpus / "metadata.tsv").as_posix())
    valid = align_mod.collect_pair_tasks(
        pairs,
        {
            "segs": (mined / "segments" / "en", mined / "segments" / "de"),
            "concats": (mined / "cat_segs" / "en", mined / "cat_segs" / "de"),
            "embeds": (mined / "embeds" / "en", mined / "embeds" / "de"),
        },
        out_dir,
        ign_indices_dir=mined / "untrans_cat_seg_ids" / "en-de",
    )
    if not valid:
        print(json.dumps({"error": f"no valid pairs under {corpus}"}))
        sys.exit(1)

    if args.fused:
        # production sizing rule + the embed stage's device handoff format
        from svecalign_tpu.pipeline import _auto_size_fused_cache
        from svecalign_tpu.utils import embed_cache

        embed_cache.enable()
        _auto_size_fused_cache(mined / "cat_segs", ("en", "de"))
        t0 = time.perf_counter()
        for p in valid:
            for path in p.embeds:
                embed_cache.put_from_file(path)
        cache_fill_s = round(time.perf_counter() - t0, 2)
    else:
        cache_fill_s = None

    drv_args = SimpleNamespace(
        alignment_max_size=6, search_buffer_size=5, del_percentile_frac=0.2,
        max_size_full_dp=300, costs_sample_size=20000, num_samps_for_norm=100,
        seed=42, pair_batch=args.pair_batch, data_parallel=1,
        upload_quant=args.upload_quant, dp_backend="auto",
        is_stopes_embed=True, fp16_embed=False,
    )

    real_run_staged = batch_mod.run_staged
    real_stage_dev = batch_mod.stage_rows_device
    real_stage_up = batch_mod.stage_rows_upload
    buckets = []   # per run_staged call: seconds + padded shapes
    stagings = []  # per staging call: seconds (worker thread wall)

    def _timed_stage(real, label):
        def wrapper(pairs, **kw):
            t0 = time.perf_counter()
            res = real(pairs, **kw)
            stagings.append({
                "rep": rep, "mode": label,
                "seconds": round(time.perf_counter() - t0, 3),
            })
            return res
        return wrapper

    def timed_run_staged(handle, **kw):
        t0 = time.perf_counter()
        res = real_run_staged(handle, **kw)
        dt = time.perf_counter() - t0
        v0 = handle[0]
        buckets.append({
            "rep": rep, "seconds": round(dt, 3),
            "P": int(v0.shape[0]), "n_pad": int(v0.shape[2]),
            "m_pad": int(handle[1].shape[2]),
        })
        return res

    # align.py imports these at call time (function-level import) — patch
    # the source module
    batch_mod.run_staged = timed_run_staged
    batch_mod.stage_rows_device = _timed_stage(real_stage_dev, "device")
    batch_mod.stage_rows_upload = _timed_stage(real_stage_up, "upload")

    rep_walls = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        align_mod._run_pairs_batched(drv_args, valid)
        rep_walls.append(round(time.perf_counter() - t0, 2))

    batch_mod.run_staged = real_run_staged
    batch_mod.stage_rows_device = real_stage_dev
    batch_mod.stage_rows_upload = real_stage_up

    warm = min(rep_walls[1:]) if len(rep_walls) > 1 else None
    report = {
        "pairs": len(valid),
        "pair_batch": args.pair_batch,
        "fused": args.fused,
        "cache_fill_seconds": cache_fill_s,
        "rep_wall_seconds": rep_walls,
        "cold_minus_warm_seconds": (
            round(rep_walls[0] - warm, 2) if warm is not None else None
        ),
        "warm_seconds_per_pair": (
            round(warm / len(valid), 4) if warm is not None else None
        ),
        "buckets": buckets,
        "stagings": stagings,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
