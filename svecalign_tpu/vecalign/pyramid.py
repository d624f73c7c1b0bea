"""The coarse-to-fine aligner driver.

Equivalent to reference svecalign/vecalign/dp_utils.py:381-537
(``vecalign``): build a pyramid by repeatedly halving both documents until a
full dense DP fits (<= max_size_full_dp^2 cells), align at the coarsest
level with a dense DP, then refine level by level with a banded DP along the
upsampled path.

Device/host split (TPU-first):
- pyramid construction, margin normalizers, dense & banded cost matrices,
  and both DPs run on the device as XLA programs (ops.costs / ops.dp);
- path bookkeeping (upsample / extend / slant) and traceback are tiny,
  irregular host code.
"""

from collections import OrderedDict
from time import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svecalign_tpu.utils.jax_setup import setup_jax

setup_jax()

from svecalign_tpu.ops import costs as costs_ops
from svecalign_tpu.ops import dp as dp_ops
from svecalign_tpu.vecalign.deletion import make_del_knob
from svecalign_tpu.vecalign.traceback import (
    dense_alignments_from_steps,
    dense_traceback,
    sparse_alignments_from_steps,
    sparse_traceback,
)
from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger("vecalign")

Alignment = Tuple[List[int], List[int]]


@jax.jit
def _dense_steps_single(costs, pen, x_size, y_size):
    """Single-pair dense DP + device traceback in one program."""
    _, bd = dp_ops.dense_dp_scan(costs, pen)
    return dp_ops.dense_traceback_scan(bd, x_size, y_size)


_banded_tb_single = jax.jit(dp_ops.banded_traceback_scan)


# ---------------------------------------------------------------------------
# Search-path bookkeeping (host; reference dp_utils.py:177-275)
# ---------------------------------------------------------------------------


def append_slant(path: List[Tuple[int, int]], xwidth: int, ywidth: int) -> None:
    """Append a quantized straight line from path[-1] by (xwidth, ywidth),
    stepping exactly one position in x XOR y each time. (dp_utils.py:177-196)."""
    nn = xwidth + ywidth
    xstart, ystart = path[-1]
    for ii in range(1, nn + 1):
        x = xstart + round(xwidth * ii / nn)
        y = ystart + round(ywidth * ii / nn)
        lastx, lasty = path[-1]
        delta = x + y - lastx - lasty
        if delta == 1:
            path.append((x, y))
        elif delta == 2:
            path.append((x - 1, y))
        elif delta == 0:
            path.append((x + 1, y))


def alignment_to_search_path(algn: List[Alignment]) -> List[Tuple[int, int]]:
    """Convert an alignment into a monotone unit-step search path, slanting
    straight lines through deletion blocks. (dp_utils.py:199-225)."""
    path = [(0, 0)]
    xdel, ydel = 0, 0
    for x, y in algn:
        if len(x) and len(y):
            append_slant(path, xdel, ydel)
            xdel, ydel = 0, 0
            append_slant(path, len(x), len(y))
        elif len(x):
            xdel += len(x)
        elif len(y):
            ydel += len(y)
    append_slant(path, xdel, ydel)
    return path


def extend_alignments(course_alignments: List[Alignment], size0: int, size1: int) -> None:
    """Extend alignments (in place) to reach new endpoints (size0, size1);
    needed because downsampling truncates odd tails. (dp_utils.py:228-258)."""
    xmax = 0
    ymax = 0
    for x, y in course_alignments:
        for xval in x:
            xmax = max(xmax, xval)
        for yval in y:
            ymax = max(ymax, yval)

    if xmax > size0 or ymax > size1:
        raise Exception("asked to extend alignments but already bigger than requested")

    extra_x = list(range(xmax + 1, size0 + 1))
    extra_y = list(range(ymax + 1, size1 + 1))

    logger.debug("extending alignments in x by %d and y by %d", len(extra_x), len(extra_y))

    if len(extra_x) == 0:
        for yval in extra_y:
            course_alignments.append(([], [yval]))
    elif len(extra_y) == 0:
        for xval in extra_x:
            course_alignments.append(([xval], []))
    else:
        course_alignments.append((extra_x, extra_y))


def upsample_alignment(algn: List[Alignment]) -> List[Alignment]:
    """Map alignment indices to the next-finer pyramid level (x2).
    (dp_utils.py:261-275)."""

    def up_one(xx):
        return list(range(min(xx) * 2, (max(xx) + 1) * 2))

    new_algn: List[Alignment] = []
    for xx, yy in algn:
        if len(xx) == 0:
            for yyy in up_one(yy):
                new_algn.append(([], [yyy]))
        elif len(yy) == 0:
            for xxx in up_one(xx):
                new_algn.append(([xxx], []))
        else:
            new_algn.append((up_one(xx), up_one(yy)))
    return new_algn


# ---------------------------------------------------------------------------
# The driver
# ---------------------------------------------------------------------------


def _pick_banded_dp(dp_backend: str, costs_shape, alignment_types):
    """Resolve the banded-DP implementation for this level.

    - 'pallas': the VMEM wavefront kernel (TPU only)
    - 'xla'   : the lax.scan kernel (any backend)
    - 'native': the C++ float64 host kernel (no accelerator needed)
    - 'auto'  : pallas on TPU when the band/type geometry fits, else xla on
                an accelerator, else native on CPU-only hosts
    """
    import jax

    if dp_backend == "auto":
        platform = jax.default_backend()
        if platform in ("tpu", "axon"):
            from svecalign_tpu.ops.dp_pallas import pallas_supported

            if pallas_supported(costs_shape, alignment_types):
                dp_backend = "pallas"
            else:
                dp_backend = "xla"
        elif platform == "cpu":
            dp_backend = "native"
        else:
            dp_backend = "xla"

    if dp_backend == "pallas":
        from svecalign_tpu.ops.dp_pallas import run_banded_dp_pallas

        return run_banded_dp_pallas, "pallas"
    if dp_backend == "native":
        from svecalign_tpu.ops.dp_native import run_banded_dp_native

        def _native(costs, *a, device_planes=False):
            if device_planes:
                raise ValueError(
                    "the native (host float64) backend has no device planes "
                    "to walk — guard with the backend name before asking"
                )
            return run_banded_dp_native(np.asarray(costs), *a)

        return _native, "native"
    return dp_ops.run_banded_dp, "xla"


def vecalign(
    vecs0: np.ndarray,
    vecs1: np.ndarray,
    final_alignment_types: List[Tuple[int, int]],
    del_percentile_frac: float,
    width_over2: int,
    max_size_full_dp: int,
    costs_sample_size: int,
    num_samps_for_norm: int,
    norms0: Optional[np.ndarray] = None,
    norms1: Optional[np.ndarray] = None,
    seed: int = 42,
    dp_backend: str = "auto",
) -> dict:
    """Coarse-to-fine alignment of two overlap tensors.

    vecs0/vecs1: (num_overlaps, num_segments, dim) float32 overlap tensors.
    Returns the DP stack: stack[0]['final_alignments'] is the result,
    stack[0]['alignment_scores'] the per-alignment costs.
    Matches reference dp_utils.py:381-537 semantics; RNG is seeded.
    ``dp_backend``: auto | pallas | xla | native (see _pick_banded_dp).
    """
    if width_over2 < 3:
        logger.warning(
            "width_over2 was set to %d, which does not make sense. increasing to 3.",
            width_over2,
        )
        width_over2 = 3

    rng = np.random.default_rng(seed)
    runtimes = OrderedDict()

    # normalize inputs on device; fp16 inputs upload at half size and
    # upcast to fp32 on device
    v0 = costs_ops.upcast_norm1(jnp.asarray(vecs0))
    v1 = costs_ops.upcast_norm1(jnp.asarray(vecs1))

    # pyramid depth: halve until the dense DP fits
    s0, s1 = v0.shape[1], v1.shape[1]
    max_depth = 0
    while s0 * s1 > max_size_full_dp**2:
        max_depth += 1
        s0 = s0 // 2
        s1 = s1 // 2

    stack = {0: {"v0": v0, "v1": v1}}

    t0 = time()
    for depth in range(1, max_depth + 1):
        stack[depth] = {
            "v0": costs_ops.downsample_vectors(stack[depth - 1]["v0"]),
            "v1": costs_ops.downsample_vectors(stack[depth - 1]["v1"]),
        }
    runtimes["Downsample embeddings"] = time() - t0

    # margin normalizers + alignment types per depth
    t0 = time()
    for depth in stack:
        stack[depth]["size0"] = stack[depth]["v0"].shape[1]
        stack[depth]["size1"] = stack[depth]["v1"].shape[1]
        stack[depth]["alignment_types"] = (
            final_alignment_types if depth == 0 else [(1, 1)]
        )

        if depth == 0 and norms0 is not None:
            if norms0.shape != vecs0.shape[:2]:
                raise Exception("norms0 wrong shape")
            stack[depth]["n0"] = jnp.asarray(norms0)
        else:
            stack[depth]["n0"] = costs_ops.compute_norms(
                stack[depth]["v0"], stack[depth]["v1"], num_samps_for_norm, rng
            )

        if depth == 0 and norms1 is not None:
            if norms1.shape != vecs1.shape[:2]:
                raise Exception("norms1 wrong shape")
            stack[depth]["n1"] = jnp.asarray(norms1)
        else:
            stack[depth]["n1"] = costs_ops.compute_norms(
                stack[depth]["v1"], stack[depth]["v0"], num_samps_for_norm, rng
            )
    runtimes["Normalize embeddings"] = time() - t0

    # deletion penalty per depth (host: sampled percentile)
    t0 = time()
    for depth in stack:
        # device arrays pass straight through; only sampled scores return
        knob = make_del_knob(
            e_laser=stack[depth]["v0"][0],
            f_laser=stack[depth]["v1"][0],
            e_laser_norms=stack[depth]["n0"][0],
            f_laser_norms=stack[depth]["n1"][0],
            sample_size=costs_sample_size,
            rng=rng,
        )
        stack[depth]["del_knob"] = knob
        stack[depth]["del_penalty"] = knob.percentile_frac_to_del_penalty(
            del_percentile_frac
        )
        logger.debug("del_penalty at depth %d: %f", depth, stack[depth]["del_penalty"])
    runtimes["Compute deletion penalties"] = time() - t0

    # dense DP at the coarsest level (1-1 alignments only)
    t0 = time()
    stack[max_depth]["costs_1to1"] = costs_ops.dense_costs(
        stack[max_depth]["v0"][0],
        stack[max_depth]["v1"][0],
        stack[max_depth]["n0"][0],
        stack[max_depth]["n1"][0],
    )
    runtimes["Full DP make features"] = time() - t0

    t0 = time()
    if dp_ops.device_traceback_enabled(per_pair=True):
        # walk the dense pointers on device; pull only the visited path
        # (the bp planes never cross the tunnel — BASELINE.md round 5)
        n_top, m_top = stack[max_depth]["costs_1to1"].shape
        steps = _dense_steps_single(
            stack[max_depth]["costs_1to1"],
            jnp.float32(stack[max_depth]["del_penalty"]),
            jnp.int32(n_top),
            jnp.int32(m_top),
        )
        # ONE pull for all three step arrays (roundtrip latency dominates)
        stack[max_depth]["alignments"] = dense_alignments_from_steps(
            *jax.device_get(steps)
        )
    else:
        stack[max_depth]["x_y_tb"] = dp_ops.dense_dp_bp(
            stack[max_depth]["costs_1to1"],
            jnp.float32(stack[max_depth]["del_penalty"]),
        )
        stack[max_depth]["alignments"] = dense_traceback(stack[max_depth]["x_y_tb"])
    runtimes["Full DP"] = time() - t0

    # refine level by level
    compute_costs_times = []
    dp_times = []
    upsample_depths = [0] if max_depth == 0 else list(reversed(range(0, max_depth)))
    for depth in upsample_depths:
        if max_depth > 0:
            course_alignments = upsample_alignment(stack[depth + 1]["alignments"])
            extend_alignments(
                course_alignments, stack[depth]["size0"], stack[depth]["size1"]
            )
        else:
            course_alignments = stack[0]["alignments"]

        stack[depth]["searchpath"] = alignment_to_search_path(course_alignments)

        types = stack[depth]["alignment_types"]
        x_offsets = tuple(x for x, _ in types)
        y_offsets = tuple(y for _, y in types)

        t0 = time()
        b_offset = costs_ops.path_to_band_offsets(
            stack[depth]["searchpath"], width_over2
        )
        a_b_costs = costs_ops.banded_costs(
            stack[depth]["v0"],
            stack[depth]["v1"],
            stack[depth]["n0"],
            stack[depth]["n1"],
            jnp.asarray(b_offset),
            x_offsets,
            y_offsets,
            width_over2,
        )
        stack[depth]["a_b_costs"] = a_b_costs
        stack[depth]["b_offset"] = b_offset
        compute_costs_times.append(time() - t0)

        t0 = time()
        banded_dp_fn, banded_backend = _pick_banded_dp(
            dp_backend, a_b_costs.shape, types
        )
        akey = "final_alignments" if depth == 0 else "alignments"
        # the native (C++ float64) backend computes on host, so there are
        # no device planes to walk; device/XLA backends walk on device and
        # pull only the path when the gate is on
        if banded_backend != "native" and dp_ops.device_traceback_enabled(per_pair=True):
            csum, xp, yp, b_off_out, d_boff_out = banded_dp_fn(
                a_b_costs,
                b_offset,
                types,
                stack[depth]["del_penalty"],
                stack[depth]["size0"],
                stack[depth]["size1"],
                device_planes=True,
            )
            steps = _banded_tb_single(
                csum, xp, yp,
                d_boff_out,  # already on device — no re-upload
                jnp.int32(stack[depth]["size0"]),
                jnp.int32(stack[depth]["size1"]),
            )
            sx, sy, sxp, syp, cs = jax.device_get(steps)
            stack[depth][akey], stack[depth]["alignment_scores"] = (
                sparse_alignments_from_steps(sx, sy, sxp, syp, cs)
            )
            stack[depth]["new_b_offset"] = b_off_out
        else:
            csum, xp, yp, b_off_out = banded_dp_fn(
                a_b_costs,
                b_offset,
                types,
                stack[depth]["del_penalty"],
                stack[depth]["size0"],
                stack[depth]["size1"],
            )
            stack[depth]["a_b_csum"] = csum
            stack[depth]["a_b_xp"] = xp
            stack[depth]["a_b_yp"] = yp
            stack[depth]["new_b_offset"] = b_off_out

            stack[depth][akey], stack[depth]["alignment_scores"] = sparse_traceback(
                csum, xp, yp, b_off_out, stack[depth]["size0"], stack[depth]["size1"]
            )
        dp_times.append(time() - t0)

    runtimes["Upsample DP compute costs"] = sum(compute_costs_times[:-1])
    runtimes["Upsample DP"] = sum(dp_times[:-1])
    runtimes["Final DP compute costs"] = compute_costs_times[-1]
    runtimes["Final DP"] = dp_times[-1]

    max_key_len = max(len(key) for key in runtimes)
    for key, val in runtimes.items():
        if val > 5e-5:
            logger.info(
                key + " took " + "." * (max_key_len + 5 - len(key)) + f"{val:.4f}s".rjust(7)
            )

    return stack
