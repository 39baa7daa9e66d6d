"""Multi-chip scale-out: problem sharding + state-axis sharding.

The reference is a single-core library; its only parallel axis is 8 SIMD
lanes (SURVEY §2.12). The TPU-native scaling story replaces that with a 2D
device mesh:

- axis "dp" (data parallel): independent planning problems shard across
  devices — the primary throughput axis (BASELINE north star: "sharding
  thousands of planning problems over the mesh"). Collectives: all_gather of
  per-problem costs for best-cost argmin + solution broadcast.
- axis "sp" (state parallel): the interpolated-state axis of edge validation
  shards across devices with an AND-reduction — the ring-attention-shaped
  component of the build (SURVEY §5.7): a motion of length L needs L*resolution
  collision checks, and those checks are embarrassingly parallel.

Everything is shard_map over a `jax.sharding.Mesh`; XLA inserts the
collectives and lays them onto ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..env import PackedEnvironment
from ..ops.validate import RAKE, interpolate_edges
from ..robots.spec import RobotSpec


def make_mesh(n_devices: Optional[int] = None, sp: int = 1) -> Mesh:
    """Build a (dp, sp) mesh over the first n_devices devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    assert n % sp == 0, f"{n} devices not divisible by sp={sp}"
    arr = np.asarray(devs).reshape(n // sp, sp)
    return Mesh(arr, ("dp", "sp"))


def make_sharded_batch_solver(solve_batch_fn, mesh: Mesh):
    """Shard a batch of problems over the mesh's problem axes (dp x sp).

    `solve_batch_fn(starts (l,dim), goals, goal_masks, envs, samplers) ->
    RRTCResult` is the natively-batched solver (planners.rrtc.make_rrtc_batch);
    each device runs its own problem shard in one lane-minor program. The
    sampler pytree is batch-MINOR (HaltonState arrays (dim, L)), so its spec
    shards the last axis.

    Returns `solve_batch(starts, goals, goal_masks, envs, samplers) ->
    (results, best)` where `best` is the globally-best (cost, problem index)
    reduced with an all_gather — the "best-cost argmin + solution broadcast"
    collective of SURVEY §5.8, replicated on every device.
    """
    both = ("dp", "sp")
    sampler_specs = dict(b=P(None, both), n=P(None, both), d=P(None, both), iterations=P(both))

    from ..planners.rrtc import RRTCResult
    from ..samplers.halton import HaltonState

    sam_spec = HaltonState(**sampler_specs)
    res_spec = RRTCResult(
        path=P(both),
        path_length=P(both),
        cost=P(both),
        iterations=P(both),
        solved=P(both),
        tree_sizes=P(both),
        sampler=sam_spec,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(both), P(both), P(both), P(both), sam_spec),
        out_specs=(res_spec, P()),
        check_vma=False,
    )
    def solve_batch(starts, goals, goal_masks, envs, samplers):
        res = solve_batch_fn(starts, goals, goal_masks, envs, samplers)
        # global best-cost argmin over all shards (solved problems only)
        cost = jnp.where(res.solved, res.cost, jnp.float32(np.inf))
        all_costs = jax.lax.all_gather(cost, both).reshape(-1)
        best_idx = jnp.argmin(all_costs).astype(jnp.int32)
        best = jnp.stack([all_costs[best_idx], best_idx.astype(jnp.float32)])
        return res, best

    return solve_batch


def make_sharded_validator(fkcc, resolution: int, n_states: int, mesh: Mesh):
    """Edge validation with the interpolated-state axis sharded over "sp".

    Each sp shard checks its slice of the n_states interpolation tile; the
    verdict is an all-reduce AND (psum of failure counts) over sp. Edges
    themselves shard over dp. This is the sequence-parallel analogue named in
    SURVEY §2.12 / §5.7.
    """
    sp = mesh.shape["sp"]
    assert n_states % sp == 0, f"n_states={n_states} not divisible by sp={sp}"
    chunk = n_states // sp

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P()),
        out_specs=P("dp"),
        check_vma=False,
    )
    def validate(starts, vectors, dists, env):
        E, d = starts.shape
        configs = interpolate_edges(starts, vectors, dists, resolution, n_states)
        k = jax.lax.axis_index("sp")
        local = jax.lax.dynamic_slice_in_dim(configs, k * chunk, chunk, axis=1)
        valid = fkcc(local.reshape(E * chunk, d), env, None, None).reshape(E, chunk)
        failures = jnp.sum(~valid, axis=1).astype(jnp.float32)
        total_failures = jax.lax.psum(failures, "sp")
        return total_failures == 0

    return validate
