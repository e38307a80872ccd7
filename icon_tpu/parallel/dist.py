"""Multi-host initialization over DCN (SURVEY §2.4 "dist backend").

The reference's only multi-process story is Lightning spawning one rank per
GPU with NCCL underneath (apps/train.py:117-121). The TPU-native equivalent
is ``jax.distributed.initialize``: every host process connects to a
coordinator, after which ``jax.devices()`` spans the full pod slice and the
data-parallel mesh in ``parallel.mesh`` shards over all hosts' chips —
collectives ride ICI within a slice and DCN across slices, with no further
code changes (the trainer's shardings are global).

Configuration mirrors the conventions of TPU pod launchers: explicit
arguments win, then the standard env vars, then single-process defaults.

  COORDINATOR_ADDRESS   host:port of process 0 (e.g. "10.0.0.2:8476")
  NUM_PROCESSES         world size
  PROCESS_ID            this host's rank

Usage (trainer wires this behind ``-dist``):
    from icon_tpu.parallel.dist import initialize_distributed
    initialize_distributed()        # no-op when single-process
"""

from __future__ import annotations

import os
from typing import Optional


def distributed_env(environ=None):
    """Read the coordinator config from the environment. Returns a dict
    with coordinator_address/num_processes/process_id or None when the env
    does not describe a multi-process run."""
    env = environ if environ is not None else os.environ
    addr = env.get("COORDINATOR_ADDRESS")
    n = env.get("NUM_PROCESSES")
    pid = env.get("PROCESS_ID")
    if not addr and not n:
        return None
    return {
        "coordinator_address": addr,
        "num_processes": int(n) if n else 1,
        "process_id": int(pid) if pid else 0,
    }


_initialized = False


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           environ=None) -> bool:
    """Guarded ``jax.distributed.initialize``.

    Returns True when a multi-process runtime was initialized, False for
    the single-process fallback (no env, num_processes == 1, or already
    initialized). Safe to call unconditionally from the trainer.
    """
    global _initialized
    if _initialized:
        return True
    cfg = {
        "coordinator_address": coordinator_address,
        "num_processes": num_processes,
        "process_id": process_id,
    }
    if cfg["num_processes"] is None:
        envcfg = distributed_env(environ)
        if envcfg is None:
            return False
        for k, v in envcfg.items():
            if cfg[k] is None:
                cfg[k] = v
    if (cfg["num_processes"] or 1) <= 1:
        return False            # single host: nothing to coordinate
    import jax
    jax.distributed.initialize(
        coordinator_address=cfg["coordinator_address"],
        num_processes=cfg["num_processes"],
        process_id=cfg["process_id"] or 0)
    _initialized = True
    return True


def is_main_process() -> bool:
    """Rank-0 check for checkpoint/log writes (reference rank-zero-only
    checkpointing, apps/train.py:47-61)."""
    import jax
    return jax.process_index() == 0
