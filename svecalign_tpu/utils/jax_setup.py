"""Process-wide JAX configuration for the pipeline stages.

Enables the persistent XLA compilation cache (under
``~/.cache/svecalign_tpu`` or ``$SVECALIGN_CACHE_DIR``) so resumed /
re-sharded stage jobs skip the 20-40 s per-shape TPU compiles — the stage
model's skip-existing resume contract makes restarts common.
"""

import os
from pathlib import Path

_done = False


def setup_jax() -> None:
    global _done
    if _done:
        return
    _done = True

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS; honor the user's explicit
    # env choice (e.g. JAX_PLATFORMS=cpu for host-only stages) via config
    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if env_platforms and "axon" not in env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    # multi-host (DCN) initialization: set SVECALIGN_COORDINATOR to
    # "host:port" (plus SVECALIGN_NUM_PROCESSES / SVECALIGN_PROCESS_ID) to
    # join a jax.distributed pod; the file-level --rank/--n_shard contract
    # is unchanged and remains the cross-job sharding mechanism.
    coord = os.environ.get("SVECALIGN_COORDINATOR")
    if coord:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ.get("SVECALIGN_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("SVECALIGN_PROCESS_ID", "0")),
            )
        except Exception as e:  # never fatal for single-host runs
            import logging

            logging.getLogger(__name__).warning(f"jax.distributed init failed: {e}")

    if os.environ.get("SVECALIGN_NO_COMPILE_CACHE"):
        return

    cache_dir = os.environ.get(
        "SVECALIGN_CACHE_DIR", str(Path.home() / ".cache" / "svecalign_tpu")
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass
