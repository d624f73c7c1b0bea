"""Stage 5.3 — embed every concatenated segment of every audio file.

For each audio: read its concat-segment windows, slice them in memory, run
the JAX speech encoder in bucketed batches, write ``OUT/{lang}/{stem}.embed``
(fp16 .npy for SpeechLASER flavor). Sharding + skip-existing + atomic
rename preserved. (Reference svecalign/seg_align/embed.py; the /tmp wav
round-trip is gone.)

CLI: ``python -m svecalign_tpu.seg_align.embed METADATA OUT_DIR
--concat_dir C --lang L [--use_tgt] [--rank/--n_shard]
[--embed_model_type speech_laser|sonar] [--sl_ckpt_dir D --sl_ckpt_name N]
[--max_tokens ...] [--embed_fp32]``
"""

import argparse
import time
from pathlib import Path

from svecalign_tpu.utils.embed_model_utils import (
    add_embed_args,
    embed_segments_to_file,
    load_embed_model,
)
from svecalign_tpu.utils.file_utils import read_metadata, read_segments
from svecalign_tpu.utils.log_utils import logging, my_tqdm
from svecalign_tpu.utils.mp_utils import get_shard_range

logger = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata", type=str,
                        help="the meta file that each line contains paired audio paths")
    parser.add_argument("out_dir", type=str,
                        help="the output dir. will save as *.embed.")
    parser.add_argument("--concat_dir", type=str, required=True,
                        help="will apply embedding to all segments files (*.txt) here.")
    parser.add_argument("--lang", type=str, required=True,
                        help="language. read from `concat_dir/lang`, output to `out_dir/lang`.")
    parser.add_argument("--use_tgt", action="store_true", default=False,
                        help="whether to read target side.")
    parser.add_argument("--rank", type=int, default=0)
    parser.add_argument("--n_shard", type=int, default=1)
    add_embed_args(parser)
    return parser.parse_args()


def main():
    args = parse_args()
    logger.info(args)

    all_pairs = read_metadata(args.metadata)
    all_inputs = sorted({pair[1] if args.use_tgt else pair[0] for pair in all_pairs})

    start, end = get_shard_range(len(all_inputs), args.n_shard, args.rank)
    all_inputs = all_inputs[start:end]

    concat_dir = Path(args.concat_dir) / args.lang
    out_dir = Path(args.out_dir) / args.lang
    out_dir.mkdir(parents=True, exist_ok=True)

    logger.info(f"Embed model = {args.embed_model_type}")
    embed_model = load_embed_model(
        args.embed_model_type,
        sl_ckpt_dir=args.sl_ckpt_dir,
        sl_ckpt_name=args.sl_ckpt_name,
        max_tokens=args.max_tokens,
        sonar_name=args.sonar_name,
        batch_size=args.batch_size or 16,
        upload_precision=getattr(args, "upload_precision", "int16"),
    )

    embed_fp32 = args.embed_fp32
    logger.info(f"Embed with {'fp32' if embed_fp32 else 'fp16'}")

    # SVECALIGN_EMBED_PROFILE=1: per-file phase timers (stage-wait /
    # dispatch / pull / bytes) at INFO — the first question when an embed
    # run is slow is always "tunnel, host, or device?"
    import os

    profiling = os.environ.get("SVECALIGN_EMBED_PROFILE", "") not in ("", "0")

    def load_inputs(audio_file):
        """Segment list + decoded waveform for one file — pure host/disk
        work, prefetched for file i+1 on a worker thread while file i
        encodes (the wav decode is 0.5-3 s of single-core time that
        otherwise serializes against idle device time). Returns None when
        the file should be skipped."""
        audio_stem = Path(audio_file).stem
        seg_file = concat_dir / f"{audio_stem}.txt"
        if not seg_file.exists():
            logger.warning(f"{seg_file} not exists! Skip.")
            return None
        all_segments = read_segments(seg_file)
        if len(all_segments) == 0:
            logger.warning(
                f"encountered empty segment file {seg_file}, corresponding "
                f"audio file is {audio_file}"
            )
            return None
        embed_out_path = out_dir / f"{audio_stem}.embed"
        if embed_out_path.exists():
            return None  # skip processed inputs
        waveform = None
        if args.window_assembly == "device" and getattr(
            embed_model, "supports_spans", False
        ):
            from svecalign_tpu.utils.audio_utils import (
                SAMPLE_RATE,
                load_waveform,
            )

            waveform = load_waveform(audio_file, sr=SAMPLE_RATE)
        return all_segments, waveform, embed_out_path

    # overlap the cold per-bucket forward compiles with the first files'
    # host work + encodes (1.4x on the compile bill — encode_common
    # .prewarm_span_programs); skipped for tiny corpora where daemon
    # threads could outlive the process mid-compile. The concat files are
    # cheap host text, so scan the PENDING ones first and request only
    # the buckets this corpus actually hits, most-frequent first — the
    # compile service partially serializes, and SONAR's unused 3000-6000
    # frame conformer compiles otherwise starve the modal-bucket program
    # the first file blocks on.
    # SVECALIGN_PREWARM_SCAN=0 reverts to all-buckets prewarm (A/B knob)
    if len(all_inputs) >= 4 and hasattr(embed_model, "prewarm_span_programs"):
        buckets = None
        if hasattr(embed_model, "_span_plan") and os.environ.get(
            "SVECALIGN_PREWARM_SCAN", "1"
        ) != "0":
            from collections import Counter

            counts: Counter = Counter()
            for audio_file in all_inputs:
                stem = Path(audio_file).stem
                if (out_dir / f"{stem}.embed").exists():
                    continue  # skip-existing: contributes no compiles
                seg_file = concat_dir / f"{stem}.txt"
                if not seg_file.exists():
                    continue
                for s, e in read_segments(seg_file):
                    counts[embed_model._span_plan(s, e - s)[0]] += 1
            if counts:
                buckets = [b for b, _ in counts.most_common()]
        embed_model.prewarm_span_programs(buckets=buckets)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(load_inputs, all_inputs[0]) if all_inputs else None
        for fi, audio_file in enumerate(my_tqdm(all_inputs)):
            loaded = fut.result()
            if fi + 1 < len(all_inputs):
                fut = ex.submit(load_inputs, all_inputs[fi + 1])
            if loaded is None:
                continue
            all_segments, waveform, embed_out_path = loaded
            audio_stem = Path(audio_file).stem
            tmp_out_path = out_dir / f"{audio_stem}.tmp.embed"

            prof = None
            if profiling:
                from svecalign_tpu.models import laser_encoder

                prof = laser_encoder.start_encode_profile()
                t_file = time.perf_counter()
            embed_segments_to_file(
                embed_model,
                args.embed_model_type,
                audio_file,
                all_segments,
                str(tmp_out_path),
                fp16=not embed_fp32,
                # fused pipeline: keep rows on device under the FINAL path
                cache_key=str(embed_out_path),
                window_assembly=args.window_assembly,
                waveform=waveform,
            )
            tmp_out_path.replace(embed_out_path)
            if profiling:
                logger.info(
                    f"profile {audio_stem}: "
                    f"{time.perf_counter() - t_file:.2f}s total | "
                    + " ".join(
                        f"{k}={v:.2f}" if isinstance(v, float) else f"{k}={v}"
                        for k, v in prof.items()
                    )
                )
    logger.info("Finished!")


if __name__ == "__main__":
    main()
