"""Multi-host distributed runtime: jax.distributed init + (hosts, chips)
meshes (SURVEY §5.8; reference has no distributed story — single core).

Multi-host hardware is not present in this build environment, so this module
is exercised two ways: single-process (init is a no-op, DCN axis length 1) in
the regular test suite, and the virtual-device scaling measurement in
benchmarks/scaling.py. On a real pod slice the same entry points apply:

    from vamp_tpu.parallel.distributed import init_distributed, make_host_mesh
    init_distributed()                      # env-driven (TPU pods: automatic)
    mesh = make_host_mesh(sp=1)             # ("dcn", "dp", "sp")

Sharding rule: the problem (lane) axis shards over dcn x dp — planning
problems are independent, so the only cross-host traffic is the best-cost
all-gather and solve-stat reductions, which ride DCN exactly once per solve
call; everything else stays on ICI.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    On TPU pods jax.distributed.initialize() autodetects everything; on CPU
    or GPU clusters pass coordinator/num_processes/process_id (or set the
    standard JAX_* env vars). Single-process runs are a no-op. Returns True
    if a multi-process runtime is active afterwards. Idempotent.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    multi = (
        num_processes is not None
        or coordinator_address is not None
        or os.environ.get("JAX_NUM_PROCESSES")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("COORDINATOR_ADDRESS"),
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None,
            process_id=process_id
            if process_id is not None
            else (int(os.environ["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in os.environ else None),
        )
    _INITIALIZED = True
    return jax.process_count() > 1


def make_host_mesh(sp: int = 1) -> Mesh:
    """A ("dcn", "dp", "sp") mesh: hosts on the slow axis, per-host chips
    split (dp, sp). Works single-host (dcn axis length 1)."""
    n_hosts = jax.process_count()
    devs = jax.devices()
    per_host = len(devs) // n_hosts
    assert per_host % sp == 0, f"{per_host} local devices not divisible by sp={sp}"
    arr = np.asarray(devs).reshape(n_hosts, per_host // sp, sp)
    return Mesh(arr, ("dcn", "dp", "sp"))
