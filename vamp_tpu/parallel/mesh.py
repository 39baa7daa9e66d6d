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


def _lane_axis_specs(tree_shapes, lane: int, axes):
    """PartitionSpec pytree sharding, per leaf, the axis whose extent equals
    `lane` (the per-shard lane count); leaves without one replicate.

    Lane-axis inference is what lets one wrapper serve every batched result
    type (RRTCResult, FCITResult, raw tuples, ...): each leaf's problem axis
    is recognized by its size, wherever it sits (paths put lanes first,
    batch-minor sampler states put them last).

    A leaf with MORE than one axis of extent `lane` is ambiguous — sharding
    the wrong one silently drops data (e.g. splitting an env's obstacle axis
    makes each shard check a fraction of the obstacles and report invalid
    paths as solved) — so ambiguity raises; pass an explicit spec for that
    argument via `arg_specs` instead. A leaf whose single matching axis is
    coincidentally NOT the lane axis cannot be detected here — callers with
    unbatched env pytrees (or any leaf whose non-lane axis can equal the lane
    count) must pass explicit `arg_specs`."""

    def spec_of(path, shape):
        hits = [i for i, s in enumerate(shape.shape) if s == lane]
        if len(hits) > 1:
            raise ValueError(
                f"ambiguous lane axis for leaf {jax.tree_util.keystr(path)} "
                f"shape {shape.shape}: axes {hits} all have extent {lane}; "
                "pass an explicit PartitionSpec (arg_specs / out_specs), or "
                "give the result type a lane_partition_spec classmethod"
            )
        if hits:
            return P(*((None,) * hits[0] + (axes,)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_of, tree_shapes)


def make_sharded_batch_solver(solve_batch_fn, mesh: Mesh, example_args=None,
                              axes=("dp", "sp"), arg_specs=None,
                              out_specs=None):
    """Shard a batch of problems over the mesh's problem axes (dp x sp).

    `arg_specs`: optional sequence aligned with `example_args`; each entry is
    None (infer the lane axis by extent) or an explicit PartitionSpec /
    pytree of PartitionSpecs used verbatim for that argument. Pass explicit
    specs for any argument whose leaves could have a non-lane axis equal to
    the lane count (e.g. a shared unbatched environment: `P()`).

    `out_specs`: optional explicit PartitionSpec pytree for the result.
    When omitted, a result type that declares `lane_partition_spec(axes)`
    (RRTCResult / FCITResult / SimplifyResult / HaltonState) supplies its
    specs; otherwise the lane axis is inferred per leaf by extent, which
    RAISES on ambiguity (a leaf with two axes of lane extent) instead of
    guessing — guessing mis-sharded e.g. tree_sizes (L, 2) at L == 2.

    `solve_batch_fn(starts (l,dim), goals, goal_masks, envs, samplers) ->
    result pytree` is any natively-batched solver
    (planners.rrtc.make_rrtc_batch, planners.rrtc_turbo.make_rrtc_turbo_batch,
    planners.fcit.make_fcit_batch, ...); each device runs its own problem
    shard in one lane-minor program. Output shardings are inferred per leaf
    from the per-shard lane count via jax.eval_shape on `example_args`
    (shard-sized; defaults to tiny synthetic RRTC-shaped args are NOT
    assumed — pass the real ones).

    Returns `solve_batch(starts, goals, goal_masks, envs, samplers) ->
    (results, best)` where `best` is the globally-best (cost, problem index)
    reduced with an all_gather — the "best-cost argmin + solution broadcast"
    collective of SURVEY §5.8, replicated on every device.
    """
    both = axes
    ndev = int(np.prod([mesh.shape[a] for a in axes]))

    if example_args is None:
        raise ValueError(
            "pass example_args (full-batch shapes) so output shardings can "
            "be inferred"
        )

    # Build shard-sized abstract args and infer the output tree's lane axes.
    lane_full = jax.tree.leaves(example_args[0])[0].shape[0]
    assert lane_full % ndev == 0, f"L={lane_full} not divisible by {ndev} devices"
    lane = lane_full // ndev

    def shrink(x):
        shape = list(x.shape)
        for i, s in enumerate(shape):
            if s == lane_full:
                shape[i] = lane
                break
        return jax.ShapeDtypeStruct(tuple(shape), x.dtype)

    abs_args = jax.tree.map(shrink, example_args)
    out_shapes = jax.eval_shape(solve_batch_fn, *abs_args)
    if out_specs is not None:
        res_spec = out_specs
    elif hasattr(type(out_shapes), "lane_partition_spec"):
        res_spec = type(out_shapes).lane_partition_spec(both)
    else:
        res_spec = _lane_axis_specs(out_shapes, lane, both)
    in_spec = tuple(
        (
            arg_specs[i]
            if arg_specs is not None and arg_specs[i] is not None
            else _lane_axis_specs(
                jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), arg),
                lane_full,
                both,
            )
        )
        for i, arg in enumerate(example_args)
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_spec,
        out_specs=(res_spec, P()),
        check_vma=False,
    )
    def solve_batch(*args):
        res = solve_batch_fn(*args)
        if hasattr(res, "solved") and hasattr(res, "cost"):
            # global best-cost argmin over all shards (solved problems only)
            cost = jnp.where(res.solved, res.cost, jnp.float32(np.inf))
            all_costs = jax.lax.all_gather(cost, both).reshape(-1)
            best_idx = jnp.argmin(all_costs).astype(jnp.int32)
            best = jnp.stack([all_costs[best_idx], best_idx.astype(jnp.float32)])
        else:  # result without the solved/cost surface: no collective
            best = jnp.asarray([np.inf, -1.0], jnp.float32)
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
