"""Stage 4.2 — detect identical (untranslated) segments between the sides.

For each source segment, find the nearest target segment by midpoint; flag
the pair identical when the duration difference and the sliding-window
fbank MSE are both under threshold. Emits index pairs, one per line, into
``OUT/{src}-{tgt}/{srcstem}-{tgtstem}.{src,tgt}.txt``. Skip-existing and
atomic tmp-rename semantics preserved. (Reference svecalign/preprocess/
detect_untranslate_segs.py.)

CLI: ``python -m svecalign_tpu.preprocess.detect_untranslate_segs METADATA
OUT_DIR --seg_dir D --src_lang S --tgt_lang T [--dur_diff 0.1]
[--fbank_dist_thres 5.0] [--n_proc N]``
"""

import argparse
from pathlib import Path
from typing import List, Tuple

from svecalign_tpu.utils.audio_utils import SAMPLE_RATE, find_untranslated_segs
from svecalign_tpu.utils.file_utils import read_metadata, read_segments
from svecalign_tpu.utils.log_utils import logging, my_tqdm
from svecalign_tpu.utils.mp_utils import start_multi_processes

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata", type=str,
                        help="the meta file that each line contains paired audio paths")
    parser.add_argument("out_dir", type=str, help="the output dir.")
    parser.add_argument("--seg_dir", type=str, required=True,
                        help="the dir for all segments.")
    parser.add_argument("--src_lang", type=str, required=True)
    parser.add_argument("--tgt_lang", type=str, required=True)
    parser.add_argument("--dur_diff", type=float, default=0.1,
                        help="the max time difference between two segments. in second")
    parser.add_argument("--fbank_dist_thres", type=float, default=5.0,
                        help="the MSE threshold between two fbank.")
    parser.add_argument("--n_proc", type=int, default=1, help="Num of processes.")
    return parser.parse_args(argv)


def detect(
    pid: int,
    pairs: List[Tuple[str, str]],
    src_seg_dir: Path,
    tgt_seg_dir: Path,
    max_frame_diff: int,
    fbank_dist_thres: float,
    out_dir: Path,
):
    for src_audio_path, tgt_audio_path in my_tqdm(pairs, desc=f"[Proc {pid}]"):
        src_name = Path(src_audio_path).stem
        tgt_name = Path(tgt_audio_path).stem

        src_out_path = out_dir / f"{src_name}-{tgt_name}.src.txt"
        tgt_out_path = out_dir / f"{src_name}-{tgt_name}.tgt.txt"
        if src_out_path.exists() and tgt_out_path.exists():
            continue  # skip processed inputs

        src_segs = read_segments(src_seg_dir / f"{src_name}.txt")
        tgt_segs = read_segments(tgt_seg_dir / f"{tgt_name}.txt")

        duplicates = find_untranslated_segs(
            src_segs, tgt_segs, src_audio_path, tgt_audio_path,
            max_frame_diff, fbank_dist_thres,
        )

        # always write (possibly empty) outputs, atomically
        tmp_src = out_dir / f"{src_name}-{tgt_name}.src.txt.tmp"
        tmp_tgt = out_dir / f"{src_name}-{tgt_name}.tgt.txt.tmp"
        with open(tmp_src, mode="w") as src_fp, open(tmp_tgt, mode="w") as tgt_fp:
            for _src_dup, _tgt_dup in duplicates:
                src_fp.write(f"{_src_dup}\n")
                tgt_fp.write(f"{_tgt_dup}\n")
        tmp_src.replace(src_out_path)
        tmp_tgt.replace(tgt_out_path)


def main(argv=None):
    """argv=None reads sys.argv (CLI contract); the pipeline's overlapped
    untrans thread passes an explicit list so two concurrently-running
    stages never race on the process-global sys.argv."""
    args = parse_args(argv)
    logger.info(args)

    all_pairs = read_metadata(args.metadata)

    out_dir = Path(args.out_dir) / f"{args.src_lang}-{args.tgt_lang}"
    out_dir.mkdir(parents=True, exist_ok=True)

    start_multi_processes(
        data=all_pairs,
        n_proc=args.n_proc,
        func=detect,
        src_seg_dir=Path(args.seg_dir) / args.src_lang,
        tgt_seg_dir=Path(args.seg_dir) / args.tgt_lang,
        max_frame_diff=int(args.dur_diff * SAMPLE_RATE),
        fbank_dist_thres=args.fbank_dist_thres,
        out_dir=out_dir,
    )
    logger.info("Finished!")


if __name__ == "__main__":
    main()
