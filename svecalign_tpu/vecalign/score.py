"""Strict/lax precision-recall-F1 evaluation of alignments vs gold.

Semantics match reference svecalign/vecalign/score.py:35-134 (itself the
Sennrich-style metric of https://aclanthology.org/W11-4624/): strict = exact
span-set match; lax = any source overlap whose gold targets intersect the
test targets. Recall is precision with arguments swapped and deletions
removed. Pure host code — this is the parity oracle for the whole pipeline.

CLI: ``python -m svecalign_tpu.vecalign.score -t TEST... -g GOLD...``
"""

import argparse
import sys
from collections import defaultdict

import numpy as np

from svecalign_tpu.utils.file_utils import read_alignments


def _precision(goldalign, testalign) -> np.ndarray:
    """Counts [tp_strict, fp_strict, tp_lax, fp_lax] for one file pair."""
    tpstrict = tplax = fpstrict = fplax = 0

    testalign = set((tuple(x), tuple(y)) for x, y in testalign if len(x) or len(y))
    goldalign = set((tuple(x), tuple(y)) for x, y in goldalign if len(x) or len(y))

    src_id_to_gold_tgt_ids = defaultdict(set)
    for gold_src, gold_tgt in goldalign:
        for gold_src_id in gold_src:
            for gold_tgt_id in gold_tgt:
                src_id_to_gold_tgt_ids[gold_src_id].add(gold_tgt_id)

    for test_src, test_target in testalign:
        if (test_src, test_target) == ((), ()):
            continue
        if (test_src, test_target) in goldalign:
            tpstrict += 1
            tplax += 1
        else:
            target_ids = set()
            for src_test_id in test_src:
                target_ids.update(src_id_to_gold_tgt_ids[src_test_id])
            if set(test_target).intersection(target_ids):
                fpstrict += 1
                tplax += 1
            else:
                fpstrict += 1
                fplax += 1

    return np.array([tpstrict, fpstrict, tplax, fplax], dtype=np.int32)


def score_multiple(gold_list, test_list, value_for_div_by_0: float = 0.0) -> dict:
    pcounts = np.zeros(4, dtype=np.int32)
    rcounts = np.zeros(4, dtype=np.int32)
    for goldalign, testalign in zip(gold_list, test_list):
        pcounts += _precision(goldalign=goldalign, testalign=testalign)
        # recall = precision with swapped args and no deletions
        test_no_del = [(x, y) for x, y in testalign if len(x) and len(y)]
        gold_no_del = [(x, y) for x, y in goldalign if len(x) and len(y)]
        rcounts += _precision(goldalign=test_no_del, testalign=gold_no_del)

    def ratio(tp, fp):
        return tp / float(tp + fp) if tp + fp else value_for_div_by_0

    pstrict = ratio(pcounts[0], pcounts[1])
    plax = ratio(pcounts[2], pcounts[3])
    rstrict = ratio(rcounts[0], rcounts[1])
    rlax = ratio(rcounts[2], rcounts[3])

    def f1(p, r):
        return 2 * p * r / (p + r) if p + r else value_for_div_by_0

    return dict(
        recall_strict=rstrict,
        recall_lax=rlax,
        precision_strict=pstrict,
        precision_lax=plax,
        f1_strict=f1(pstrict, rstrict),
        f1_lax=f1(plax, rlax),
    )


def log_final_scores(res: dict) -> None:
    print(" ---------------------------------", file=sys.stderr)
    print("|             |  Strict |    Lax  |", file=sys.stderr)
    print("| Precision   |   {precision_strict:.3f} |   {precision_lax:.3f} |".format(**res), file=sys.stderr)
    print("| Recall      |   {recall_strict:.3f} |   {recall_lax:.3f} |".format(**res), file=sys.stderr)
    print("| F1          |   {f1_strict:.3f} |   {f1_lax:.3f} |".format(**res), file=sys.stderr)
    print(" ---------------------------------", file=sys.stderr)


def main():
    parser = argparse.ArgumentParser(
        "Compute strict/lax precision and recall for one or more pairs of "
        "gold/test alignments",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("-t", "--test", type=str, nargs="+", required=True,
                        help="one or more test alignment files")
    parser.add_argument("-g", "--gold", type=str, nargs="+", required=True,
                        help="one or more gold alignment files")
    args = parser.parse_args()

    if len(args.test) != len(args.gold):
        raise Exception("number of gold/test files must be the same")

    gold_list = [read_alignments(x) for x in args.gold]
    test_list = [read_alignments(x) for x in args.test]
    log_final_scores(score_multiple(gold_list=gold_list, test_list=test_list))


if __name__ == "__main__":
    main()
