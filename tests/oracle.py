"""Slow, obviously-correct numpy implementations of the DP recurrences,
written directly from the algorithm spec (SURVEY.md section 2.1/2.2) as an
independent test oracle for the XLA kernels. Not used by the library."""

from typing import List, Tuple

import numpy as np


def dense_costs_oracle(v0, v1, n0, n1):
    out = np.empty((v0.shape[0], v1.shape[0]), dtype=np.float32)
    for i in range(v0.shape[0]):
        for j in range(v1.shape[0]):
            s = float(np.dot(v0[i], v1[j]))
            out[i, j] = 2.0 * (1.0 - s) / (1e-6 + n0[i] + n1[j])
    return out


def dense_dp_oracle(cost: np.ndarray, pen: float):
    n, m = cost.shape
    csum = np.empty((n + 1, m + 1), dtype=np.float64)
    bp = np.empty((n + 1, m + 1), dtype=np.int32)
    for c in range(m + 1):
        csum[0, c] = c * pen
        bp[0, c] = 1
    for r in range(n + 1):
        csum[r, 0] = r * pen
        bp[r, 0] = 2
    csum[0, 0] = 0.0
    bp[0, 0] = 4
    for c in range(1, m + 1):
        for r in range(1, n + 1):
            c0 = csum[r - 1, c - 1] + cost[r - 1, c - 1]
            c1 = csum[r, c - 1] + pen
            c2 = csum[r - 1, c] + pen
            csum[r, c] = c0
            bp[r, c] = 0
            if c1 < csum[r, c]:
                csum[r, c] = c1
                bp[r, c] = 1
            if c2 < csum[r, c]:
                csum[r, c] = c2
                bp[r, c] = 2
    return csum, bp


def banded_costs_oracle(
    vecs0, vecs1, norms0, norms1, path, alignment_types, width_over2
):
    path = np.asarray(path, dtype=np.int32)
    xsize = vecs0.shape[1]
    ysize = vecs1.shape[1]
    a_len = path.shape[0]
    b_len = 2 * width_over2
    feats = np.empty((len(alignment_types), a_len, b_len), dtype=np.float32)
    b_offset = np.empty(a_len, dtype=np.int32)

    for x, y in path:
        aa = x + y
        bb = y
        b_offset[aa] = bb - width_over2
        for b_idx, bb2 in enumerate(range(bb - width_over2, bb + width_over2)):
            xx = aa - bb2
            yy = bb2
            for ti, (xo, yo) in enumerate(alignment_types):
                if 0 <= xx < xsize and 0 <= yy < ysize:
                    s = float(np.dot(vecs0[xo - 1, xx], vecs1[yo - 1, yy]))
                    feat = (
                        2.0
                        * xo
                        * yo
                        * (1.0 - s)
                        / (1e-6 + norms0[xo - 1, xx] + norms1[yo - 1, yy])
                    )
                else:
                    feat = np.inf
                feats[ti, aa, b_idx] = feat
    return feats, b_offset


def banded_dp_oracle(
    a_b_costs: np.ndarray,
    b_offset_in: np.ndarray,
    alignment_types: List[Tuple[int, int]],
    del_penalty: float,
    x_in_size: int,
    y_in_size: int,
):
    x_offsets = [x for x, _ in alignment_types] + [0, 1]
    y_offsets = [y for _, y in alignment_types] + [1, 0]

    a_in = a_b_costs.shape[1]
    b_in = a_b_costs.shape[2]
    a_out = a_in + 2
    x_out = x_in_size + 1
    y_out = y_in_size + 1

    b_offset_out = np.concatenate(
        [[b_offset_in[0], b_offset_in[0]], np.asarray(b_offset_in) + 1]
    ).astype(np.int32)

    csum = np.zeros((a_out, b_in), dtype=np.float64) + np.inf
    xp = np.zeros((a_out, b_in), dtype=np.int32) - 2
    yp = np.zeros((a_out, b_in), dtype=np.int32) - 2

    for aa in range(a_out):
        for bb in range(b_in):
            yy = bb + b_offset_out[aa]
            xx = aa - yy

            if xx == 0 and 0 <= yy < y_out:
                csum[aa, bb] = del_penalty * yy
                xp[aa, bb] = 0
                yp[aa, bb] = 1
            elif yy == 0 and 0 <= xx < x_out:
                csum[aa, bb] = del_penalty * xx
                xp[aa, bb] = 1
                yp[aa, bb] = 0
            else:
                csum[aa, bb] = np.inf
                xp[aa, bb] = -42
                yp[aa, bb] = -42
                for xo, yo in zip(x_offsets, y_offsets):
                    xx_in = xx - 1
                    yy_in = yy - 1
                    xx_prev = xx - xo
                    yy_prev = yy - yo
                    if not (
                        0 <= xx_in < x_in_size
                        and 0 <= yy_in < y_in_size
                        and 0 <= xx_prev < x_out
                        and 0 <= yy_prev < y_out
                    ):
                        continue
                    aa_in = xx_in + yy_in
                    bb_in_c = yy_in - b_offset_in[aa_in]
                    aa_prev = xx_prev + yy_prev
                    bb_prev = yy_prev - b_offset_out[aa_prev]
                    if not (
                        0 <= aa_in < a_in
                        and 0 <= bb_in_c < b_in
                        and 0 <= aa_prev < a_out
                        and 0 <= bb_prev < b_in
                    ):
                        continue
                    if xo == 0 or yo == 0:
                        cost = del_penalty
                    else:
                        cost = a_b_costs[
                            alignment_types.index((xo, yo)), aa_in, bb_in_c
                        ]
                    total = csum[aa_prev, bb_prev] + cost
                    if total < csum[aa, bb]:
                        csum[aa, bb] = total
                        xp[aa, bb] = xo
                        yp[aa, bb] = yo

    return csum, xp, yp, b_offset_out
