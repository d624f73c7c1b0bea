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
from typing import Dict, Optional, Tuple

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)

enabled: bool = False
max_rows: int = 4096
max_bytes: int = 4 << 30

_cache: Dict[str, Tuple[int, object]] = {}
_bytes: int = 0
stats = {"put": 0, "rejected": 0, "hit": 0, "miss": 0}


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
    global _bytes
    _cache.clear()
    _bytes = 0


def put(path, n_rows: int, device_rows) -> None:
    """Cache ``device_rows`` — an (max_rows, dim) fp16 device array whose
    first ``n_rows`` rows are the document's embeddings — under the final
    .embed path."""
    global _bytes
    if not enabled or device_rows is None:
        return
    nbytes = device_rows.size * device_rows.dtype.itemsize
    if _bytes + nbytes > max_bytes:
        stats["rejected"] += 1
        return
    _cache[_key(path)] = (n_rows, device_rows)
    _bytes += nbytes
    stats["put"] += 1


def get(path) -> Optional[Tuple[int, object]]:
    """(n_rows, device (max_rows, dim) fp16) for a cached .embed path."""
    if not enabled:
        return None
    entry = _cache.get(_key(path))
    stats["hit" if entry is not None else "miss"] += 1
    return entry
