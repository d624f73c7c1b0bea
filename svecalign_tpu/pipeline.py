"""One-command mining orchestrator: run all 16 stages end to end.

The reference's only orchestration is a bash script of CLI calls
(reference example/voxpopuli/run.sh); this driver runs the same stage graph
in-process with the same filesystem contract — every stage still writes the
standard directory tree, so resume (skip-existing), inspection, and mixing
with manual CLI runs all keep working. ``--stages`` selects a subset;
``--rank/--n_shard`` shards the heavy stages across hosts.

CLI: ``python -m svecalign_tpu.pipeline METADATA OUT_DIR --src_lang en
--tgt_lang de [--stages segment,...,sort] [--vad_model energy]
[--sl_ckpt_dir D] [--max_cost 0.7] [--pair_batch 8] [...]``
"""

import argparse
import sys
from pathlib import Path

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

STAGES = [
    "segment",            # 4.1
    "untrans_segs",       # 4.2
    "concat_segs",        # 5.1
    "untrans_concats",    # 5.2
    "embed",              # 5.3
    "align",              # 5.4
    "filter_cost",        # 6.1
    "filter_untrans",     # 6.2
    "concat_aligns",      # 6.3
    "filter_dur",         # 6.4
    "embed_align",        # 6.5
    "prep_index",         # 6.6
    "score_align",        # 6.7
    "prep_tsv",           # 6.8
    "remove_overlaps",    # 6.9
    "sort",               # 6.10
]


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata", type=str)
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--src_lang", type=str, required=True)
    parser.add_argument("--tgt_lang", type=str, required=True)
    parser.add_argument("--stages", type=str, default=",".join(STAGES),
                        help="comma-separated subset of: " + ",".join(STAGES))
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--n_shard", type=int, default=1)
    # knobs forwarded to the stages (reference defaults)
    parser.add_argument("--vad_model", type=str, default="energy")
    parser.add_argument("--vad_ckpt", type=str, default=None)
    parser.add_argument("--embed_model_type", type=str, default="speech_laser")
    parser.add_argument("--sl_ckpt_dir", type=str, default=None)
    parser.add_argument("--src_ckpt_name", type=str, default=None)
    parser.add_argument("--tgt_ckpt_name", type=str, default=None)
    parser.add_argument("--alignment_max_size", type=int, default=6)
    parser.add_argument("--pair_batch", type=int, default=1)
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard the align stage's pair axis over this many "
                             "local devices (0 = all). See seg_align.align. "
                             "(The embed stages need no flag: both encoders "
                             "auto-shard their batch rows over all visible "
                             "devices' 'data' mesh axis.)")
    parser.add_argument("--sharded_index", action="store_true", default=False,
                        help="score_align: shard the loaded kNN corpora (Flat "
                             "or IVF) row-wise across the device mesh.")
    parser.add_argument("--fused", action="store_true", default=False,
                        help="fused embed->align handoff: keep each document's "
                             "embedding rows ON DEVICE between the stages so the "
                             "align stage skips the .embed read + re-upload "
                             "(the tunnel-limited resource; utils/embed_cache.py). "
                             "The .embed files are still written — resume and "
                             "the stage-boundary file contract are unchanged. "
                             "Note: fused align always uses the batched driver, "
                             "whose seeded device-PRNG sampling differs slightly "
                             "from the per-pair path — outputs can differ from "
                             "the same command without --fused (a mode switch, "
                             "not nondeterminism; gold-quality gated in tests).")
    parser.add_argument("--fused_max_rows", type=int, default=0,
                        help="row cap per cached document (one global shape -> "
                             "one compile); bigger documents fall back to the "
                             "15-45x slower file+upload path. 0 (default) = "
                             "auto-size from the concat files right before the "
                             "embed stage, so hour-scale documents stay fused.")
    parser.add_argument("--embed_max_tokens", type=int, default=600 * 16000,
                        help="embed-stage batch size in SAMPLES (the stage "
                             "CLI's --max_tokens keeps the reference default "
                             "150 s). 600 s quarters the per-chunk program "
                             "launches and buffer-deletion RPCs, which are "
                             "what the tunneled single-core host actually "
                             "pays per chunk (measured: 20-s-bucket batch "
                             "rows 7 -> 28, file pull phase 4.3 -> 3.5 s).")
    parser.add_argument("--window_assembly", type=str, default="device",
                        choices=["device", "host"],
                        help="embed stages: 'device' uploads each waveform "
                             "once and gathers the overlap windows on device "
                             "(~31x fewer upload bytes); 'host' stages every "
                             "padded window batch from the host (round-2 "
                             "path, bit-identical under fp32 uploads).")
    parser.add_argument("--overlap_untrans", action="store_true", default=False,
                        help="run the untranslated-duplicate stages "
                             "(detect_untranslate_segs + _concats — serial "
                             "single-core host fbank work, the largest "
                             "non-embed stage) on a background thread "
                             "CONCURRENTLY with concat_segs+embed, joining "
                             "before align. Legal because their outputs feed "
                             "only align/filter_untrans; outputs are "
                             "byte-identical either way. Whether it wins on "
                             "a 1-core host is a measurement (BASELINE.md); "
                             "stage_seconds then double-counts the "
                             "overlapped wall.")
    parser.add_argument("--corpus_quant", type=str, default="fp16",
                        choices=["fp16", "int8"],
                        help="score_align device-corpus precision: int8 "
                             "halves fp16's HBM (2x single-chip corpus "
                             "headroom) and searches single-pass bf16 "
                             "(~1e-3 margin noise); fp16 is exact.")
    parser.add_argument("--knn_k", type=int, default=16,
                        help="score_align --k (neighbors per margin "
                             "denominator). Corpora smaller than k collapse "
                             "the margin scores (reference semantics) — "
                             "lower this for toy/miniature corpora.")
    parser.add_argument("--max_cost", type=float, default=0.7)
    parser.add_argument("--max_num_align", type=int, default=3)
    parser.add_argument("--min_dur", type=float, default=1.0)
    parser.add_argument("--min_audio_length", type=int, default=2000)
    parser.add_argument("--mining_threshold", type=float, default=0.0)
    parser.add_argument("--max_overlap", type=float, default=0.8)
    return parser.parse_args()


def _auto_size_fused_cache(cat_dir: Path, langs) -> None:
    """Derive the fused cache's per-document row cap from the concat files
    (each line = one embedding row, known before any embedding happens).

    The round-2 default of 4096 silently un-fused exactly the hour-scale
    documents the pipeline targets (a 2000-segment plenary has ~10k overlap
    rows): a too-small cap makes the embed stage skip the device handoff
    and the align stage quietly pay the 15-45x slower file+upload path.
    Rounded up to a multiple of 1024 so the one-global-shape compile
    discipline keeps a clean tile size."""
    from svecalign_tpu.utils import embed_cache

    largest = 0
    for lang in langs:
        for txt in (cat_dir / lang).glob("*.txt"):
            with open(txt, "rb") as fp:
                largest = max(largest, sum(1 for _ in fp))
    if largest == 0:
        logger.warning(
            f"fused auto-size: no concat files under {cat_dir}; keeping "
            f"max_rows={embed_cache.max_rows}"
        )
        return
    embed_cache.max_rows = max(4096, -(-largest // 1024) * 1024)
    logger.info(
        f"fused cache auto-sized: max_rows={embed_cache.max_rows} "
        f"(largest concat document: {largest} rows)"
    )


stage_seconds: dict = {}
"""Wall-clock per stage invocation of the last pipeline run (stage name ->
cumulative seconds; segment/embed run once per language). Logged at the
end of main(); tools/rehearse_corpus.py reads it for the sustained-run
breakdown."""


def _invoke(module: str, *argv: str, threadsafe: bool = False) -> None:
    """Run a stage CLI in-process (same interpreter, shared jit caches).

    threadsafe=True passes argv straight into the stage's ``main(argv)``
    instead of mutating the process-global sys.argv — required for any
    stage launched on the --overlap_untrans background thread, where a
    concurrent foreground stage would otherwise race on sys.argv."""
    import importlib
    import time

    logger.info(f">>> {module} {' '.join(argv)}")
    mod = importlib.import_module(module)
    t0 = time.perf_counter()
    if threadsafe:
        try:
            mod.main(list(argv))
        finally:
            name = module.rsplit(".", 1)[1]
            stage_seconds[name] = stage_seconds.get(name, 0.0) + time.perf_counter() - t0
        return
    old = sys.argv
    sys.argv = [module.rsplit(".", 1)[1], *argv]
    try:
        mod.main()
    finally:
        sys.argv = old
        name = module.rsplit(".", 1)[1]
        stage_seconds[name] = stage_seconds.get(name, 0.0) + time.perf_counter() - t0


def main():
    args = parse_args()
    logger.info(args)
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = set(stages) - set(STAGES)
    assert not unknown, f"unknown stages: {unknown}"

    if args.fused:
        from svecalign_tpu.utils import embed_cache

        embed_cache.enable(rows=args.fused_max_rows or 4096)

    out = Path(args.out_dir)
    meta = args.metadata
    sl, tl = args.src_lang, args.tgt_lang
    seg = str(out / "segments")
    unsegs = str(out / "untrans_segs")
    cat = str(out / "cat_segs")
    uncats = str(out / "untrans_cat_seg_ids")
    emb = str(out / "embeds")
    ali = str(out / "alignments")
    ali_c = f"{ali}_{args.max_cost}"
    ali_cc = f"{ali_c}_clean"
    ali_cat = f"{ali_cc}_cat{args.max_num_align}"
    ali_min = f"{ali_cat}_min{args.min_dur:g}s"
    ali_emb = f"{ali_min}_embed"
    ali_idx = f"{ali_min}_embed_indexes"
    ali_mrg = f"{ali_min}_margin"
    ali_tsv = f"{ali_min}_tsvs"
    shard = ["--rank", str(args.rank), "--n_shard", str(args.n_shard)]
    langs = ["--src_lang", sl, "--tgt_lang", tl]
    # embed-file format follows the embedder: SpeechLASER writes stopes
    # .npy, SONAR writes headerless raw (reference embed_model_utils.py)
    stopes = args.embed_model_type == "speech_laser"

    if "segment" in stages:
        for lang, tgt in [(sl, []), (tl, ["--use_tgt"])]:
            _invoke("svecalign_tpu.preprocess.segment", meta, seg, "--lang", lang,
                    "--vad_model", args.vad_model,
                    *(["--vad_ckpt", args.vad_ckpt] if args.vad_ckpt else []),
                    *shard, *tgt)

    def _run_untrans(threadsafe: bool = False) -> None:
        if "untrans_segs" in stages:
            _invoke("svecalign_tpu.preprocess.detect_untranslate_segs", meta,
                    unsegs, "--seg_dir", seg, *langs, threadsafe=threadsafe)
        if "untrans_concats" in stages:
            _invoke("svecalign_tpu.seg_align.detect_untranslate_concats", meta,
                    uncats, "--seg_dir", seg, "--identical_seg_dir", unsegs,
                    *langs, threadsafe=threadsafe)

    # --overlap_untrans: the untrans stages are serial single-core fbank
    # work whose inputs (segments + raw audio) exist now and whose outputs
    # feed only align/filter_untrans — run them concurrently with the
    # device-bound embed stage and join before align. Only worth doing
    # when embed actually runs in this invocation.
    untrans_thread = None
    untrans_exc: list = []
    if args.overlap_untrans and "embed" in stages:
        import threading

        def _untrans_bg():
            try:
                _run_untrans(threadsafe=True)
            except BaseException as e:  # re-raised at join
                untrans_exc.append(e)

        untrans_thread = threading.Thread(target=_untrans_bg, name="untrans")
        untrans_thread.start()
    else:
        if "untrans_segs" in stages:
            _invoke("svecalign_tpu.preprocess.detect_untranslate_segs", meta,
                    unsegs, "--seg_dir", seg, *langs)
    if "concat_segs" in stages:
        for lang, tgt in [(sl, []), (tl, ["--use_tgt"])]:
            _invoke("svecalign_tpu.seg_align.concat_segs", meta, cat,
                    "--seg_dir", seg, "--lang", lang, *tgt)
    if untrans_thread is None and "untrans_concats" in stages:
        _invoke("svecalign_tpu.seg_align.detect_untranslate_concats", meta, uncats,
                "--seg_dir", seg, "--identical_seg_dir", unsegs, *langs)
    if "embed" in stages:
        if args.fused and not args.fused_max_rows:
            _auto_size_fused_cache(Path(cat), [sl, tl])
        for lang, name, tgt in [(sl, args.src_ckpt_name, []), (tl, args.tgt_ckpt_name, ["--use_tgt"])]:
            ck = []
            if args.sl_ckpt_dir and name:
                ck = ["--sl_ckpt_dir", args.sl_ckpt_dir, "--sl_ckpt_name", name]
            _invoke("svecalign_tpu.seg_align.embed", meta, emb, "--concat_dir", cat,
                    "--lang", lang, "--embed_model_type", args.embed_model_type,
                    "--window_assembly", args.window_assembly,
                    "--max_tokens", str(args.embed_max_tokens),
                    *ck, *shard, *tgt)
    if untrans_thread is not None:
        untrans_thread.join()
        if untrans_exc:
            raise untrans_exc[0]
    if "align" in stages:
        # SONAR writes headerless raw fp16 (embed stage default): align must
        # be told, or read_in_embeddings parses the bytes as fp32 garbage.
        # (stopes .npy carries its dtype in the header — no flag needed.)
        _invoke("svecalign_tpu.seg_align.align", meta, ali, *langs,
                "--seg_dir", seg, "--concat_dir", cat, "--embed_dir", emb,
                *(["--is_stopes_embed"] if stopes else ["--fp16_embed"]),
                "-a", str(args.alignment_max_size),
                "--ign_indices_dir", uncats, "--pair_batch", str(args.pair_batch),
                *(["--data_parallel", str(args.data_parallel)]
                  if args.data_parallel != 1 else []))
    if args.fused and not ({"embed_align", "prep_index", "score_align"} & set(stages)):
        # no downstream consumer left (embed_align reuses the cached overlap
        # rows; prep_index/score_align resolve corpus/queries against the
        # cache): free the HBM right after the align stage
        from svecalign_tpu.utils import embed_cache

        embed_cache.clear()
    if "filter_cost" in stages:
        _invoke("svecalign_tpu.postprocess.filter_by_cost", meta, ali_c,
                "--align_dir", ali, "--max_cost", str(args.max_cost), *langs)
    if "filter_untrans" in stages:
        _invoke("svecalign_tpu.postprocess.filter_untrans_align", meta, ali_cc,
                "--align_dir", ali_c, *langs, "--seg_dir", seg)
    if "concat_aligns" in stages:
        _invoke("svecalign_tpu.postprocess.concat_aligns", meta, ali_cat,
                "--max_num_align", str(args.max_num_align), "--align_dir", ali_cc,
                "--seg_dir", seg, *langs, "--apply_dur_cond_to_both_sides")
    if "filter_dur" in stages:
        _invoke("svecalign_tpu.postprocess.filter_by_dur", meta, ali_min,
                "--align_dir", ali_cat, "--seg_dir", seg, *langs,
                "--min_dur", str(args.min_dur))
    if "embed_align" in stages:
        for name, tgt in [(args.src_ckpt_name, []), (args.tgt_ckpt_name, ["--use_tgt"])]:
            ck = []
            if args.sl_ckpt_dir and name:
                ck = ["--sl_ckpt_dir", args.sl_ckpt_dir, "--sl_ckpt_name", name]
            # same --max_tokens as the embed stage, or load_embed_model's
            # memo misses and a SECOND encoder (params + compiles) is built
            _invoke("svecalign_tpu.postprocess.embed_align", meta, ali_emb, *langs,
                    "--align_dir", ali_min, "--seg_dir", seg,
                    "--concat_seg_dir", cat, "--concat_seg_embed_dir", emb,
                    "--embed_model_type", args.embed_model_type,
                    "--window_assembly", args.window_assembly,
                    "--max_tokens", str(args.embed_max_tokens), *ck, *tgt)
    if "prep_index" in stages:
        for tgt in ([], ["--use_tgt"]):
            _invoke("svecalign_tpu.postprocess.prep_index", meta, ali_idx,
                    "--data_dir", ali_emb, *langs, "--embed_fp16",
                    "--sample_ratio", "0.5",
                    *(["--embed_stopes"] if stopes else []), *tgt)
    if "score_align" in stages:
        _invoke("svecalign_tpu.postprocess.score_align", meta, ali_mrg,
                "--embed_dir", ali_emb, "--align_dir", ali_min, *langs,
                "--index_dir", ali_idx, "--embed_fp16",
                "--k", str(args.knn_k),
                *(["--embed_stopes"] if stopes else []),
                *(["--sharded_index"] if args.sharded_index else []),
                *(["--corpus_quant", "int8"]
                  if args.corpus_quant == "int8" else []))
    if "prep_tsv" in stages:
        _invoke("svecalign_tpu.postprocess.prep_tsv", meta, ali_tsv, *langs,
                "--align_dir", ali_mrg, "--seg_dir", seg)
    if "remove_overlaps" in stages:
        _invoke("svecalign_tpu.postprocess.remove_overlaps",
                "--output_dir", f"{ali_tsv}/{sl}-{tl}",
                "--output_filename", "align.rm_overlap.tsv.gz",
                "--mining_result_path", f"{ali_tsv}/{sl}-{tl}/align.tsv.gz",
                "--min_audio_length", str(args.min_audio_length),
                "--mining_threshold", str(args.mining_threshold),
                "--max_overlap", str(args.max_overlap))
    if "sort" in stages:
        _invoke("svecalign_tpu.postprocess.sort_tsv",
                "--in_tsv", f"{ali_tsv}/{sl}-{tl}/align.rm_overlap.tsv.gz",
                "--out_tsv", f"{ali_tsv}/{sl}-{tl}/align.rm_overlap.sort.tsv.gz")
    if args.fused:
        from svecalign_tpu.utils import embed_cache

        logger.info(f"embed_cache stats: {embed_cache.stats}")
        embed_cache.clear()
    breakdown = " | ".join(f"{k} {v:.1f}s" for k, v in stage_seconds.items())
    logger.info(f"stage breakdown: {breakdown}")
    logger.info("Pipeline finished!")


if __name__ == "__main__":
    main()
