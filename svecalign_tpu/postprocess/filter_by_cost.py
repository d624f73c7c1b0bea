"""Stage 6.1 — drop deletions and high-cost alignments.

Removes alignments with an empty side and alignments whose cost exceeds
``--max_cost`` (the paper uses 0.7); warns when a pair keeps less than half
of its alignments. (Reference svecalign/postprocess/filter_by_cost.py.)

CLI: ``python -m svecalign_tpu.postprocess.filter_by_cost METADATA OUT_DIR
--align_dir A --max_cost 0.7 --src_lang S --tgt_lang T``
"""

import argparse
import os
from pathlib import Path
from typing import Optional

from svecalign_tpu.utils.file_utils import read_alignments_with_score, read_metadata
from svecalign_tpu.utils.log_utils import logging, my_tqdm

logger = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("metadata", type=str,
                        help="the meta file that each line contains paired audio paths")
    parser.add_argument("out_dir", type=str, help="dir to save alignments.")
    parser.add_argument("--align_dir", type=str, required=True,
                        help="where the alignments are saved.")
    parser.add_argument("--max_cost", type=float, required=True, help="the threshold.")
    parser.add_argument("--src_lang", type=str, required=True)
    parser.add_argument("--tgt_lang", type=str, required=True)
    return parser.parse_args()


def do_filter(
    in_path: str,
    out_path: str,
    max_cost: Optional[float] = None,
    min_cost: Optional[float] = None,
) -> float:
    """Filter one alignment file; supports either a max or a min threshold.
    Returns the kept ratio."""
    assert (max_cost is None) != (min_cost is None), f"{min_cost} {max_cost}"

    old_cnt = new_cnt = 0
    low_quality_cnt = deletion_cnt = 0

    out_alignments = []
    for src_segs, tgt_segs, cost in read_alignments_with_score(in_path):
        old_cnt += 1
        if len(src_segs) == 0 or len(tgt_segs) == 0:
            deletion_cnt += 1
            continue
        if max_cost is not None and cost > max_cost:
            low_quality_cnt += 1
            continue
        if min_cost is not None and cost < min_cost:
            low_quality_cnt += 1
            continue
        new_cnt += 1
        out_alignments.append((src_segs, tgt_segs, cost))

    if out_alignments:
        with open(out_path, mode="w") as out_fp:
            for src_segs, tgt_segs, cost in out_alignments:
                out_fp.write(f"{src_segs}:{tgt_segs}:{cost}\n")
    else:
        logger.warning("Empty output. Will not write!")

    logger.debug(
        f"{os.path.basename(in_path)} || Threshold: {max_cost} || "
        f"#Kept: {new_cnt}/{old_cnt} || #Low quality: {low_quality_cnt} || "
        f"#Deletions: {deletion_cnt}"
    )
    return new_cnt / old_cnt


def main():
    args = parse_args()
    logger.info(args)

    all_pairs = read_metadata(args.metadata)

    align_dir = Path(args.align_dir) / f"{args.src_lang}-{args.tgt_lang}"
    out_dir = Path(args.out_dir) / f"{args.src_lang}-{args.tgt_lang}"
    out_dir.mkdir(parents=True, exist_ok=True)

    bad_alignments = []
    for src, tgt in my_tqdm(all_pairs):
        src_stem = Path(src).stem
        tgt_stem = Path(tgt).stem
        kept_ratio = do_filter(
            in_path=(align_dir / f"{src_stem}-{tgt_stem}.txt").as_posix(),
            out_path=(out_dir / f"{src_stem}-{tgt_stem}.txt").as_posix(),
            max_cost=args.max_cost,
        )
        if kept_ratio < 0.5:
            bad_alignments.append(f"{src_stem}-{tgt_stem}")

    logger.info(
        f"{len(bad_alignments)} / {len(all_pairs)} pairs kept less than half alignments."
    )
    logger.debug(bad_alignments)
    logger.info("Finished!")


if __name__ == "__main__":
    main()
