"""Host-level sharding and multiprocessing.

The pipeline's inter-job parallelism contract (reference svecalign/utils/
mp_utils.py:7-66): ``--rank/--n_shard`` slices the (sorted) input file list
contiguously; ``--n_proc`` forks worker processes over contiguous data
slices with no IPC. Device-level parallelism lives in
:mod:`svecalign_tpu.parallel` instead.
"""

from typing import Callable, List, Tuple

from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)


def get_shard_range(tot: int, nshard: int, rank: int) -> Tuple[int, int]:
    """Contiguous, rounded split of ``tot`` items into ``nshard`` shards."""
    assert 0 <= rank < nshard, f"invalid rank/nshard {rank}/{nshard}"
    start = round(tot / nshard * rank)
    end = round(tot / nshard * (rank + 1))
    assert start < end, f"start={start}, end={end}"
    logger.info(
        f"rank {rank} of {nshard}, process {end - start} ({start}-{end}) out of {tot}"
    )
    return start, end


def start_multi_processes(
    data: List,
    n_proc: int,
    func: Callable,
    use_torch_mp: bool = False,
    *args,
    **kwargs,
):
    """Fork ``n_proc`` workers, each handling a contiguous slice of ``data``.

    ``func`` must accept ``(pid, data_slice, *args, **kwargs)``.
    """
    assert n_proc > 0, f"{n_proc} should be larger than 0."

    n_proc = min(n_proc, len(data)) or 1

    if n_proc == 1:
        logger.info("Single process")
        func(0, data, *args, **kwargs)
        return

    if use_torch_mp:
        import torch.multiprocessing as mp

        proc_cls = mp.Process
    else:
        from multiprocessing import Process as proc_cls  # type: ignore

    procs = []
    for pid in range(n_proc):
        start, end = get_shard_range(len(data), nshard=n_proc, rank=pid)
        procs.append(
            proc_cls(target=func, args=(pid, data[start:end], *args), kwargs=kwargs)
        )
    for p in procs:
        p.start()
    for p in procs:
        p.join()
