"""Miniature full fused pipeline for the multi-chip dryrun.

Runs ALL 16 stages (segment .. sort, reference run.sh order —
/root/reference/example/voxpopuli/run.sh:1-191) over a tiny synthesized
corpus with tiny-config encoders, optionally with the mesh knobs on
(--data_parallel 0, --sharded_index; the embed stages auto-shard over
every visible device). `__graft_entry__.dryrun_multichip` launches this
twice in SEQUENTIAL subprocesses — once with N virtual CPU devices, once
with 1 — and asserts the mined rows match: that proves the stage
COMPOSITION under sharding (embed-cache handoff -> fused align -> fused
mining with a sharded index), not just the per-stage units the rest of
the dryrun covers.

Sequential, never concurrent: the 1-core host starves XLA:CPU's
in-process collective rendezvous if two device-heavy processes overlap
(CLAUDE.md round-4 note).
"""

import argparse
import gzip
import json
import sys
from pathlib import Path


def _tiny_models():
    """Swap both encoder builders for tiny-config versions.

    The production configs (24x1024 wav2vec2 / conformer) are pointless on
    virtual CPU devices; what the dryrun must exercise is the dp mesh
    plumbing and the fused stage handoff, which are config-independent.
    """
    from svecalign_tpu.models import laser_encoder, sonar_encoder
    from svecalign_tpu.utils import embed_model_utils

    def build(embed_model_type, *a, **kw):
        if embed_model_type == "speech_laser":
            cfg = laser_encoder.LaserEncoderConfig(
                # 320x downsampling like production, so a 12 s window is
                # 600 frames of dim-64 attention — CPU-feasible
                conv_layers=(
                    (64, 10, 5), (64, 8, 4), (64, 8, 4), (64, 4, 2),
                    (64, 4, 2),
                ),
                encoder_dim=64,
                encoder_layers=2,
                encoder_heads=4,
                encoder_ffn_dim=128,
                conv_pos_kernel=16,
                conv_pos_groups=4,
            )
            return laser_encoder.SpeechLaserModel(
                config=cfg, max_tokens=60 * 16000, upload_dtype="fp32"
            )
        cfg = sonar_encoder.SonarEncoderConfig(
            n_mels=80, model_dim=64, n_layers=2, n_heads=4, ffn_dim=128,
            pool_dim=64,
        )
        return sonar_encoder.SonarSpeechModel(
            config=cfg, batch_size=4, upload_dtype="fp32"
        )

    embed_model_utils._build_embed_model = build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--sec", type=float, default=12.0)
    ap.add_argument("--embed_model_type", type=str, default="speech_laser")
    ap.add_argument("--mesh", action="store_true",
                    help="align --data_parallel 0 + score_align "
                    "--sharded_index (embed auto-shards regardless)")
    ap.add_argument("--overlap_untrans", action="store_true",
                    help="forwarded to the pipeline (untrans stages on a "
                    "background thread concurrent with embed)")
    args = ap.parse_args()

    out = Path(args.out)
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from rehearse_corpus import build_corpus

    meta = build_corpus(out, args.pairs, hour_pairs=0,
                        small_sec=args.sec, hour_sec=args.sec)

    _tiny_models()

    import svecalign_tpu.pipeline as pl

    argv = [
        "pipeline", str(meta), str(out / "mined"),
        "--src_lang", "en", "--tgt_lang", "de",
        "--vad_model", "energy", "--fused",
        "--embed_model_type", args.embed_model_type,
        "--pair_batch", "2",
        # random tiny weights: keep the cost gate open (stage composition
        # is the test subject, not mining quality), and keep k below the
        # tiny corpus size so margins don't hit the documented k > ntotal
        # collapse (score_align warns about it)
        "--max_cost", "1000", "--knn_k", "4",
    ]
    if args.mesh:
        argv += ["--data_parallel", "0", "--sharded_index"]
    if args.overlap_untrans:
        argv += ["--overlap_untrans"]
    old = sys.argv
    sys.argv = argv
    try:
        pl.main()
    finally:
        sys.argv = old

    finals = sorted(
        (out / "mined").glob(
            "alignments_*_tsvs/en-de/align.rm_overlap.sort.tsv.gz"
        )
    )
    assert finals, f"no mined tsv under {out / 'mined'}"
    rows = {}
    prefix = str(out.resolve())
    with gzip.open(finals[0], "rt") as fp:
        for line in fp:
            score, src, tgt = line.rstrip("\n").split("\t")
            # paths embed the per-run out dir; strip it so two runs with
            # different --out compare key-for-key
            key = f"{src}\t{tgt}".replace(prefix, "").replace(str(out), "")
            rows[key] = float(score)
    (out / "mined_rows.json").write_text(json.dumps(rows))
    print(f"mini_pipeline OK: {len(rows)} mined rows -> {out}/mined_rows.json")


if __name__ == "__main__":
    main()
