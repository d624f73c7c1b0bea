"""Per-document-pair alignment driver and CLI.

Equivalent to reference svecalign/vecalign/vecalign.py:36-298: load overlap
texts + embeddings for both sides, build the overlap tensors, run the
coarse-to-fine aligner, print ``[x]:[y]:cost`` lines and optionally score
against a gold alignment.

CLI: ``python -m svecalign_tpu.vecalign.vecalign -s SRC -t TGT
--src_embed TXT BIN --tgt_embed TXT BIN [...]``
"""

import argparse
import math
import pickle
import sys
from pathlib import Path
from typing import List, Optional, Set, Tuple, Union

from svecalign_tpu.utils.embedding_utils import make_doc_embedding, read_in_embeddings
from svecalign_tpu.utils.file_utils import read_alignments
from svecalign_tpu.utils.log_utils import logging
from svecalign_tpu.vecalign.pyramid import vecalign
from svecalign_tpu.vecalign.score import log_final_scores, score_multiple

logger = logging.getLogger("vecalign")


def make_alignment_types(max_alignment_size: int) -> List[Tuple[int, int]]:
    """All (n, m) with n, m >= 1 and n + m <= max_alignment_size.
    (reference vecalign.py:154-162; excludes deletions)."""
    return [
        (x, y)
        for x in range(1, max_alignment_size)
        for y in range(1, max_alignment_size)
        if x + y <= max_alignment_size
    ]


def make_many_to_one_alignment_types(max_alignment_size: int) -> List[Tuple[int, int]]:
    """All (m, 1) with m <= max_alignment_size (reference vecalign.py:165-171)."""
    return [(m, 1) for m in range(1, max_alignment_size + 1)]


def print_alignments(alignments, scores=None, src_lines=None, tgt_lines=None, ofile=sys.stdout):
    """Emit ``[x ids]:[y ids]`` lines (``:cost`` appended when scores are
    given; 6 decimals — the stage-file contract), optionally followed by
    the aligned text for human inspection."""
    for idx, (x, y) in enumerate(alignments):
        tail = "" if scores is None else ":%.6f" % scores[idx]
        print(f"{x}:{y}{tail}", file=ofile)
        if src_lines is not None and tgt_lines is not None:
            for tag, lines, ids in (("SRC: ", src_lines, x), ("TGT: ", tgt_lines, y)):
                text = " ".join(lines[i].replace("\n", " ").strip() for i in ids)
                print(" " * 40, tag, text, file=ofile)


def load_ignore_index_file(path: Union[str, Path]) -> Set[Tuple[int, int]]:
    """Parse an untranslated-concat id file (``"i j"`` per line, produced
    by detect_untranslate_concats) into a set of (i, j) tuples; duplicate
    lines indicate a corrupt file and raise."""
    with open(path, encoding="utf-8") as fp:
        entries = [
            tuple(int(tok) for tok in line.split())
            for line in fp
            if line.strip()
        ]
    if len(entries) != len(set(entries)):
        seen: Set[Tuple[int, int]] = set()
        dupes = {e for e in entries if e in seen or seen.add(e)}
        raise ValueError(f"{path}: duplicate ignore entries {sorted(dupes)}")
    return set(entries)


def align(
    # per-side inputs: segment files, [concat_txt, embed_bin] path pairs,
    # embedding storage flavor flags, optional untranslated-id files
    src: str, tgt: str,
    src_embed: List[str], src_stopes: bool,
    tgt_stopes: bool, tgt_embed: List[str],
    alignment_max_size: int, many_to_one: Optional[int],
    # aligner knobs (reference defaults: buffer 5, -d 0.2, cap 300,
    # 20000 cost samples, 100 norm samples)
    search_buffer_size: int, del_percentile_frac: float,
    max_size_full_dp: int, costs_sample_size: int, num_samps_for_norm: int,
    overlap_segments: bool, print_aligned_text: bool,
    src_fp16: bool = False, tgt_fp16: bool = False,
    src_ignore_indices: Optional[Union[str, Path]] = None,
    tgt_ignore_indices: Optional[Union[str, Path]] = None,
    # output / debug switches
    verbose: bool = False, debug_save_stack: Optional[str] = None,
    gold_alignment: Optional[str] = None, print_results: bool = False,
    save_aligned_text_to_file: Optional[str] = None,
    # TPU-rebuild extensions (not in the reference CLI)
    seed: int = 42, dp_backend: str = "auto",
):
    """Align a single pair of documents. Returns the DP stack."""
    if verbose:
        logger.setLevel(logging.DEBUG)

    if alignment_max_size < 2:
        logger.warning("clamping alignment_max_size to 2 (1-1 alignments)")
        alignment_max_size = 2

    # per-side overlap depth: symmetric a-1 normally; M:1 caps the target
    # side at single segments
    if many_to_one is not None:
        final_alignment_types = make_many_to_one_alignment_types(many_to_one)
        max_sizes = (many_to_one, 1)
    else:
        final_alignment_types = make_alignment_types(alignment_max_size)
        max_sizes = (alignment_max_size - 1,) * 2
    logger.debug("Considering alignment types %s", final_alignment_types)

    width_over2 = math.ceil(max(max_sizes) / 2.0) + search_buffer_size

    logger.info(f"Aligning src={src} to tgt={tgt}")

    # build both sides' overlap tensors in fp16 (halved upload; the pyramid
    # upcasts on device). SpeechLASER .embed files are fp16 at the source
    # anyway; for fp32 sources the DP cost precision is dominated by the
    # 1e-5 normalization epsilon, not the mantissa.
    import numpy as _np

    doc_lines, doc_tensors = [], []
    for (txt_path, bin_path), seg_path, is_stopes, is_fp16, ign_path, max_size in zip(
        (src_embed, tgt_embed),
        (src, tgt),
        (src_stopes, tgt_stopes),
        (src_fp16, tgt_fp16),
        (src_ignore_indices, tgt_ignore_indices),
        max_sizes,
    ):
        sent2id, rows = read_in_embeddings(txt_path, bin_path, is_stopes, is_fp16)
        lines = open(seg_path, "rt", encoding="utf-8").readlines()
        doc_lines.append(lines)
        doc_tensors.append(
            make_doc_embedding(
                sent2id,
                rows,
                lines,
                max_size,
                ignore_indices=load_ignore_index_file(ign_path) if ign_path else None,
                overlap_segments=overlap_segments,
                dtype=_np.float16,
            )
        )
    src_lines, tgt_lines = doc_lines

    stack = vecalign(
        vecs0=doc_tensors[0], vecs1=doc_tensors[1],
        final_alignment_types=final_alignment_types,
        del_percentile_frac=del_percentile_frac, width_over2=width_over2,
        max_size_full_dp=max_size_full_dp,
        costs_sample_size=costs_sample_size,
        num_samps_for_norm=num_samps_for_norm,
        seed=seed, dp_backend=dp_backend,
    )

    if print_results:
        detail_fp = open(save_aligned_text_to_file, mode="w") if save_aligned_text_to_file else sys.stdout
        print_alignments(
            stack[0]["final_alignments"],
            scores=stack[0]["alignment_scores"],
            src_lines=src_lines if print_aligned_text else None,
            tgt_lines=tgt_lines if print_aligned_text else None,
            ofile=detail_fp,
        )
        if save_aligned_text_to_file:
            detail_fp.close()

    if debug_save_stack:
        # strip device arrays for pickling
        import numpy as np

        pickle.dump(
            {
                d: {k: (np.asarray(v) if hasattr(v, "device") else v) for k, v in entry.items()}
                for d, entry in stack.items()
            },
            open(debug_save_stack, mode="wb"),
        )

    if gold_alignment is not None:
        gold_list = read_alignments(gold_alignment)
        res = score_multiple(gold_list=[gold_list], test_list=[stack[0]["final_alignments"]])
        log_final_scores(res)

    return stack


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--src", type=str, dest="src", required=True, help="Source file.")
    parser.add_argument("-t", "--tgt", type=str, dest="tgt", required=True, help="Target file.")
    parser.add_argument(
        "--src_embed", type=str, nargs=2, required=True,
        help="Source embeddings. Requires two arguments: first is a text file, second is a binary embeddings file.",
    )
    parser.add_argument("--src_stopes", action="store_true", default=False,
                        help="Whether the source embedding should be loaded as stopes (.npy) format.")
    parser.add_argument("--src_fp16", action="store_true", default=False,
                        help="whether the source embedding is stored with fp16 (raw numpy flavor).")
    parser.add_argument(
        "--tgt_embed", type=str, nargs=2, required=True,
        help="Target embeddings. Requires two arguments: first is a text file, second is a binary embeddings file.",
    )
    parser.add_argument("--tgt_stopes", action="store_true", default=False,
                        help="Whether the target embedding should be loaded as stopes (.npy) format.")
    parser.add_argument("--tgt_fp16", action="store_true", default=False,
                        help="whether the target embedding is stored with fp16 (raw numpy flavor).")
    parser.add_argument(
        "-a", "--alignment_max_size", dest="alignment_max_size", type=int, default=10,
        help="Searches for alignments up to size N-M, where N+M <= this value.",
    )
    parser.add_argument(
        "--many_to_one", type=int, nargs="?", default=None, const=50,
        help="Perform many to one (e.g. 1:1, 2:1, ... M:1) alignment. Overrides -a.",
    )
    parser.add_argument(
        "-d", "--del_percentile_frac", type=float, default=0.2,
        help="Deletion penalty is set to this percentile (as a fraction) of the cost matrix distribution.",
    )
    parser.add_argument("--search_buffer_size", type=int, default=5,
                        help="Width (one side) of search buffer.")
    parser.add_argument("--max_size_full_dp", type=int, default=300,
                        help="Maximum size N for which it is acceptable to run full N^2 DP.")
    parser.add_argument("--costs_sample_size", type=int, default=20000,
                        help="Sample size to estimate costs distribution for the deletion penalty.")
    parser.add_argument("--num_samps_for_norm", type=int, default=100,
                        help="Number of samples used for normalizing embeddings.")
    parser.add_argument("--overlap_segments", default=False, action="store_true",
                        help="If True (speech), treat each line as starting and end frames.")
    parser.add_argument("--src_ignore_indices", default=None, type=str)
    parser.add_argument("--tgt_ignore_indices", default=None, type=str)
    parser.add_argument("-g", "--gold_alignment", dest="gold_alignment", type=str, default=None)
    parser.add_argument("--print_aligned_text", action="store_true")
    parser.add_argument("--save_to_file", type=str, default=None,
                        help="If not None, write to the provided file.")
    parser.add_argument("-v", "--verbose", dest="verbose", action="store_true")
    parser.add_argument("--debug_save_stack", type=str, default=None)
    parser.add_argument("--print_results", default=False, action="store_true")
    parser.add_argument("--seed", type=int, default=42,
                        help="RNG seed for penalty/normalizer sampling (new; the reference is unseeded).")
    return parser.parse_args()


if __name__ == "__main__":
    _args = vars(parse_args())
    _args["save_aligned_text_to_file"] = _args.pop("save_to_file")
    align(**_args)
