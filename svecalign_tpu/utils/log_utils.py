"""Logging setup shared by every stage CLI.

Mirrors the reference contract (svecalign/utils/log_utils.py:1-13): a single
``basicConfig`` whose level comes from the ``LOGLEVEL`` env var, plus a tqdm
wrapper with slow refresh intervals suitable for batch jobs.
"""

import logging
import os
from functools import partial

try:
    import tqdm as _tqdm

    my_tqdm = partial(_tqdm.tqdm, mininterval=20, maxinterval=60)
except ImportError:  # tqdm is optional; fall back to identity
    def my_tqdm(iterable, **_kwargs):
        return iterable

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
    level=os.environ.get("LOGLEVEL", "INFO").upper(),
)

__all__ = ["logging", "my_tqdm"]
