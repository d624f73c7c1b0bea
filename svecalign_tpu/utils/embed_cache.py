"""Device-resident embedding handoff for the fused pipeline mode.

The reference pipeline's only IPC is the filesystem (SURVEY.md L0): the
embed stage writes .embed files that the align stage re-reads and re-uploads
to the device. On a tunneled TPU the re-upload is the align stage's
steady-state bottleneck (~45 MB/s once any D2H has happened, CLAUDE.md), and
it is pure waste when both stages run in one process — the embeddings were
just computed ON the device.

This module is a process-global cache of per-document embedding rows that
stay on device between the stages. The .embed files are still written
(resume, inspection, embed_align reuse and the CLI contract all keep
working); the cache only short-circuits the align stage's read+upload.

TPU shape discipline: every cached entry is padded to ONE global row count
(``max_rows``) so the align stage's device staging (stack + gather) compiles
exactly once — per-document shapes would mean one 20-300 s axon compile per
document. Documents with more rows than ``max_rows`` are simply not cached
(the align stage falls back to the file+upload path), and ``put`` stops
accepting entries once ``max_bytes`` of HBM is referenced.

Enabled by ``python -m svecalign_tpu.pipeline ... --fused`` (or calling
:func:`enable` before running the stage mains in-process).
"""

import os
from typing import Dict, Optional, Sequence, Tuple

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

enabled: bool = False
max_rows: int = 4096
max_bytes: int = 4 << 30

_cache: Dict[str, Tuple[int, object]] = {}
_bytes: int = 0
# (path -> slot map, (n_files, max_rows, dim) device stack); built lazily by
# gather_rows_device, invalidated on put/clear. The stack duplicates the
# cached bytes on device (both are bounded by max_bytes).
_stack = None
# live index objects handed from prep_index to score_align in a fused run
# (the .populate.idx file is still written; this skips the re-read+re-upload)
_index_registry: Dict[str, object] = {}
stats = {"put": 0, "rejected": 0, "hit": 0, "miss": 0, "gather": 0,
         "gather_miss": 0}


def _key(path) -> str:
    return os.path.abspath(str(path))


def enable(rows: int = 4096, byte_cap: int = 4 << 30) -> None:
    """Turn the fused handoff on for this process."""
    global enabled, max_rows, max_bytes
    enabled = True
    max_rows = rows
    max_bytes = byte_cap


def disable() -> None:
    global enabled
    enabled = False
    clear()


def clear() -> None:
    """Drop every cached device buffer (frees HBM once consumers release)."""
    global _bytes, _stack
    _cache.clear()
    _index_registry.clear()
    _bytes = 0
    _stack = None


def put(path, n_rows: int, device_rows) -> None:
    """Cache ``device_rows`` — an (max_rows, dim) fp16 device array whose
    first ``n_rows`` rows are the document's embeddings — under the final
    .embed path."""
    global _bytes
    if not enabled or device_rows is None:
        return
    key = _key(path)
    nbytes = device_rows.size * device_rows.dtype.itemsize
    # re-put of the same path (in-process re-run, embed_align overwrite)
    # replaces the entry, so its bytes leave the budget first
    old = _cache.get(key)
    old_bytes = old[1].size * old[1].dtype.itemsize if old is not None else 0
    if _bytes - old_bytes + nbytes > max_bytes:
        if stats["rejected"] == 0:
            logger.warning(
                f"embed_cache: HBM cap {max_bytes >> 20} MiB reached — "
                "further documents fall back to the file+upload path"
            )
        stats["rejected"] += 1
        return
    global _stack
    _cache[key] = (n_rows, device_rows)
    _bytes += nbytes - old_bytes
    _stack = None
    stats["put"] += 1


def get(path) -> Optional[Tuple[int, object]]:
    """(n_rows, device (max_rows, dim) fp16) for a cached .embed path."""
    if not enabled:
        return None
    entry = _cache.get(_key(path))
    stats["hit" if entry is not None else "miss"] += 1
    return entry


def _ensure_stack():
    """(path -> (slot, n_rows), (n_files, max_rows, dim) fp16 device stack)
    or None.

    One device-side stack of every cached document; built once, reused by
    every gather until the cache changes. None when the cache is empty or
    the entries disagree on shape/dtype (different encoders in one run)."""
    global _stack
    if _stack is not None:
        return _stack
    if not _cache:
        return None
    import jax.numpy as jnp

    paths = sorted(_cache)
    arrays = [_cache[p][1] for p in paths]
    shape, dtype = arrays[0].shape, arrays[0].dtype
    if any(a.shape != shape or a.dtype != dtype for a in arrays):
        logger.warning("embed_cache: mixed entry shapes; device gather off")
        return None
    slots = {p: (i, _cache[p][0]) for i, p in enumerate(paths)}
    _stack = (slots, jnp.stack(arrays))
    return _stack


def gather_rows_device(
    entries: Sequence[Tuple[object, int]], pad_multiple: int = 1024
):
    """Assemble embedding rows ON DEVICE from the cached documents.

    ``entries`` is an ordered [(embed_path, row_id), ...] — exactly the
    content of an embed-pointer tsv (reference score_align.py /
    prep_index.py read these from disk and re-upload; here only one int32
    index array crosses the tunnel). Returns ``(rows, n)`` where ``rows``
    is an (n_padded, dim) fp16 device array whose first ``n`` rows are the
    requested embeddings (padding rows are zero), or None when any
    referenced document is not cached (callers fall back to the file
    path). ``n_padded`` is ``n`` rounded up to ``pad_multiple`` so the
    downstream programs compile once per bucket, not per call.
    """
    if not enabled or not entries:
        return None
    stack = _ensure_stack()
    if stack is None:
        stats["gather_miss"] += 1
        return None
    slot_of, dev_stack = stack
    n_files, rows_per, _ = dev_stack.shape
    flat = []
    for path, row_id in entries:
        slot = slot_of.get(_key(path))
        # bound against the document's REAL row count, not the padded
        # buffer: a stale pointer tsv must fall back to the file path
        # (which raises) rather than silently gather a zero padding row
        if slot is None or not 0 <= row_id < slot[1]:
            stats["gather_miss"] += 1
            return None
        flat.append(slot[0] * rows_per + row_id)
    import numpy as np

    n = len(flat)
    n_pad = -(-n // pad_multiple) * pad_multiple
    # padding points at row 0 of file 0; padded outputs are zeroed on device
    idx = np.zeros((n_pad,), dtype=np.int32)
    idx[:n] = flat
    import jax.numpy as jnp

    # n rides as a traced scalar: programs compile once per n_pad bucket,
    # not once per exact chunk size (axon compiles cost 20-300 s)
    rows = _gather_fn()(dev_stack, jnp.asarray(idx), jnp.int32(n))
    stats["gather"] += 1
    return rows, n


_gather_cached = None


def _gather_fn():
    """The jitted row gather, created once (keeps jax import lazy)."""
    global _gather_cached
    if _gather_cached is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def gather(stack, idx, n):
            flat = stack.reshape(-1, stack.shape[-1])
            rows = flat[idx]
            valid = jnp.arange(idx.shape[0]) < n
            return jnp.where(valid[:, None], rows, jnp.zeros((), rows.dtype))

        _gather_cached = gather
    return _gather_cached


def register_index(path, index) -> None:
    """Hand a live, device-resident index from prep_index to score_align
    (same process; the on-disk .populate.idx remains the durable copy)."""
    if enabled:
        _index_registry[_key(path)] = index


def get_index(path):
    return _index_registry.get(_key(path)) if enabled else None


def put_from_file(path) -> None:
    """Load a written stopes-flavor (.npy) .embed file and cache it
    exactly as the embed stage's device handoff would have: fp16 rows
    zero-padded to (max_rows, dim) on device, keyed by the final path.

    Tools-only (profilers/bisectors pre-filling the fused handoff without
    re-running the embed stage — tools/profile_align.py,
    tools/bisect_grid_fault.py); call :func:`enable` first and size
    ``max_rows`` via ``pipeline._auto_size_fused_cache`` so the shapes
    match a production run. SONAR's headerless raw flavor is not
    supported here (np.load would reject it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rows = np.load(path).astype(np.float16)
    padded = np.zeros((max_rows, rows.shape[1]), np.float16)
    padded[: rows.shape[0]] = rows
    put(path, rows.shape[0], jax.device_put(jnp.asarray(padded)))
