"""Stage 6.2 — re-check surviving alignments for untranslated duplicates.

For each alignment, compare the merged source and target spans by duration
difference (default 0.5 s) and sliding-window fbank MSE (threshold 5.0);
remove identical ones. ``--save_audio`` dumps the detected pairs as ogg for
human audit. Multiprocess, skip-existing, atomic rename. (Reference
svecalign/postprocess/filter_untrans_align.py.)

CLI: ``python -m svecalign_tpu.postprocess.filter_untrans_align METADATA
OUT_DIR --align_dir A --src_lang S --tgt_lang T --seg_dir D
[--dur_diff 0.5] [--fbank_dist_thres 5.0] [--n_proc N] [--save_audio]``
"""

import argparse
from pathlib import Path
from typing import List, Optional, Tuple, Union

from svecalign_tpu.utils.audio_utils import SAMPLE_RATE, Segment, compute_fbank_dist
from svecalign_tpu.utils.file_utils import (
    alignments_to_timestamps,
    delete_if_exist,
    read_alignments,
    read_lines,
    read_metadata,
    read_segments,
)
from svecalign_tpu.utils.log_utils import logging, my_tqdm
from svecalign_tpu.utils.mp_utils import start_multi_processes

logger = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata", type=str,
                        help="the meta file that each line contains paired audio paths")
    parser.add_argument("out_dir", type=str, help="dir to save cleaned alignments.")
    parser.add_argument("--align_dir", type=str, required=True,
                        help="where the alignments are saved.")
    parser.add_argument("--src_lang", type=str, required=True)
    parser.add_argument("--tgt_lang", type=str, required=True)
    parser.add_argument("--seg_dir", type=str, required=True,
                        help="the dir for all segments.")
    parser.add_argument("--dur_diff", type=float, default=0.5,
                        help="the max time difference between two segments. in second")
    parser.add_argument("--fbank_dist_thres", type=float, default=5.0,
                        help="the MSE threshold between two fbank.")
    parser.add_argument("--n_proc", type=int, default=1, help="Num of processes.")
    parser.add_argument("--save_audio", action="store_true", default=False,
                        help="Whether to save the untranslated alignments as audios. "
                             "If True, will save to `${out_dir}/wavs`.")
    return parser.parse_args()


def check_and_save(
    align_path: Union[str, Path],
    src_segs: List[Tuple[int, int]],
    tgt_segs: List[Tuple[int, int]],
    src_audio_path: Union[str, Path],
    tgt_audio_path: Union[str, Path],
    max_frame_diff: int,
    fbank_dist_thres: float,
    out_path: Path,
    audio_out_dir: Optional[Path] = None,
    use_gpu: bool = False,
) -> int:
    """Check alignment pairs; write the clean ones; return #duplicates."""
    duplicate_cnt = 0

    alignments = read_alignments(align_path)
    src_times, tgt_times, n_samples = alignments_to_timestamps(
        align=alignments, src_segs=src_segs, tgt_segs=tgt_segs, ignore_empty=False
    )
    assert n_samples == len(alignments)

    align_id_to_save = []
    for ii in range(n_samples):
        src_seg = Segment(start=src_times[ii][0], end=src_times[ii][1], path=src_audio_path)
        tgt_seg = Segment(start=tgt_times[ii][0], end=tgt_times[ii][1], path=tgt_audio_path)

        if abs(src_seg.duration - tgt_seg.duration) > max_frame_diff:
            align_id_to_save.append(ii)
            continue
        dist = compute_fbank_dist(src_seg.fbank(use_gpu), tgt_seg.fbank(use_gpu))
        if dist > fbank_dist_thres:
            align_id_to_save.append(ii)
            continue

        duplicate_cnt += 1
        if audio_out_dir:
            audio_out_dir.mkdir(parents=True, exist_ok=True)
            src_seg.save((audio_out_dir / f"{ii}.src.ogg").as_posix())
            tgt_seg.save((audio_out_dir / f"{ii}.tgt.ogg").as_posix())

    if len(align_id_to_save) == 0:
        logger.info(f"{align_path} is completely filtered out.")
    else:
        out_path.parent.mkdir(parents=True, exist_ok=True)
        lines = read_lines(align_path)
        with open(out_path, mode="w") as fp:
            for ii in align_id_to_save:
                fp.write(f"{lines[ii]}\n")

    return duplicate_cnt


def check_alignments(
    pid: int,
    audio_pairs: List[Tuple[str, str]],
    align_dir: Path,
    seg_dir: Path,
    src_lang: str,
    tgt_lang: str,
    max_frame_diff: int,
    fbank_dist_thres: float,
    out_dir: Path,
    audio_out_dir: Optional[Path] = None,
):
    duplicate_cnt = 0
    for src_audio, tgt_audio in my_tqdm(audio_pairs, desc=f"[Proc {pid}]"):
        src_stem = Path(src_audio).stem
        tgt_stem = Path(tgt_audio).stem

        in_align_path = align_dir / f"{src_stem}-{tgt_stem}.txt"
        if not in_align_path.exists():
            logger.warning(f"{in_align_path.as_posix()} not exist. Skip.")
            continue

        out_align_path = out_dir / f"{src_stem}-{tgt_stem}.txt"
        if out_align_path.exists():
            continue  # skip processed

        tmp_out = out_align_path.with_suffix(".tmp")
        delete_if_exist(tmp_out)

        duplicate_cnt += check_and_save(
            align_path=in_align_path,
            src_segs=read_segments(seg_dir / src_lang / f"{src_stem}.txt"),
            tgt_segs=read_segments(seg_dir / tgt_lang / f"{tgt_stem}.txt"),
            src_audio_path=src_audio,
            tgt_audio_path=tgt_audio,
            max_frame_diff=max_frame_diff,
            fbank_dist_thres=fbank_dist_thres,
            out_path=tmp_out,
            audio_out_dir=(audio_out_dir / f"{src_stem}-{tgt_stem}")
            if audio_out_dir is not None
            else None,
        )
        # a completely-filtered pair writes no tmp file at all; missing
        # output = "no alignments" downstream (the reference crashes here:
        # its tmp_out_align_path.replace raises FileNotFoundError,
        # reference filter_untrans_align.py:110,172)
        if tmp_out.exists():
            tmp_out.replace(out_align_path)

    logger.info(f"Found {duplicate_cnt} duplications!")


def main():
    args = parse_args()
    logger.info(args)

    all_pairs = read_metadata(args.metadata)
    max_frame_diff = int(args.dur_diff * SAMPLE_RATE)

    src_lang, tgt_lang = args.src_lang, args.tgt_lang
    align_dir = Path(args.align_dir) / f"{src_lang}-{tgt_lang}"

    out_dir = Path(args.out_dir) / f"{src_lang}-{tgt_lang}"
    out_dir.mkdir(parents=True, exist_ok=True)

    audio_out_dir = None
    if args.save_audio:
        audio_out_dir = out_dir / "wavs"
        audio_out_dir.mkdir(parents=True, exist_ok=True)

    start_multi_processes(
        data=all_pairs,
        n_proc=args.n_proc,
        func=check_alignments,
        align_dir=align_dir,
        seg_dir=Path(args.seg_dir),
        src_lang=src_lang,
        tgt_lang=tgt_lang,
        max_frame_diff=max_frame_diff,
        fbank_dist_thres=args.fbank_dist_thres,
        out_dir=out_dir,
        audio_out_dir=audio_out_dir,
    )


if __name__ == "__main__":
    main()
