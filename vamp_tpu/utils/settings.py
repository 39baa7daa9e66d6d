"""Planner settings dataclasses, mirroring the reference's settings structs
1:1 (reference: planning/rrtc_settings.hh, simplify_settings.hh,
roadmap.hh:149-196, aorrtc_settings.hh) so harness code ports directly.

All fields are static under jit (they select compiled programs); capacities
(max_samples etc.) set array sizes.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class RRTCSettings:
    # reference defaults: planning/rrtc_settings.hh:5-20
    range: float = 2.0
    dynamic_domain: bool = True
    radius: float = 4.0
    alpha: float = 1e-4
    min_radius: float = 1.0
    balance: bool = True
    tree_ratio: float = 1.0
    max_iterations: int = 100_000
    max_samples: int = 100_000
    start_tree_first: bool = True
    # TPU-build field (no reference equivalent): validate edges with native
    # jnp.sin/cos (one XLA op each, more accurate) instead of the reference's
    # 16-op polynomial approximation (interface.hh:442-469). Documented
    # deviation: validity can flip for sub-resolution grazing contacts
    # (crosscheck artifact: 4/188 simplified paths, all within the
    # resolution-32 contract). Set False for polynomial-trig parity with
    # simplify/validate and the reference.
    native_trig: bool = True


@dataclass(frozen=True)
class BSplineSettings:
    # reference defaults: simplify_settings.hh:15-20
    max_steps: int = 1
    min_change: float = 0.1
    midpoint_interpolation: float = 0.5


@dataclass(frozen=True)
class ReduceSettings:
    # reference defaults: simplify_settings.hh:22-27
    max_steps: int = 10
    max_empty_steps: int = 5
    range_ratio: float = 0.5


@dataclass(frozen=True)
class ShortcutSettings:
    pass


@dataclass(frozen=True)
class PerturbSettings:
    # reference defaults: simplify_settings.hh:33-39
    max_steps: int = 10
    max_empty_steps: int = 5
    perturbation_attempts: int = 5
    range: float = 0.1


# Simplification routine tags (reference: simplify_settings.hh enum).
BSPLINE, REDUCE, SHORTCUT, PERTURB = "bspline", "reduce", "shortcut", "perturb"


@dataclass(frozen=True)
class SimplifySettings:
    max_iterations: int = 5
    interpolate: int = 0
    operations: Tuple[str, ...] = (SHORTCUT, BSPLINE)  # reference default order
    bspline: BSplineSettings = field(default_factory=BSplineSettings)
    reduce: ReduceSettings = field(default_factory=ReduceSettings)
    shortcut: ShortcutSettings = field(default_factory=ShortcutSettings)
    perturb: PerturbSettings = field(default_factory=PerturbSettings)


@dataclass(frozen=True)
class RoadmapSettings:
    # reference: roadmap.hh:149-172
    max_iterations: int = 100_000
    max_samples: int = 100_000
    batch_size: int = 1000
    # neighbor params: "prm_star" | "fcit_star" | ("constant", k, r)
    neighbor_params: str = "prm_star"
    max_neighbors: int = 32  # static cap for the TPU neighbor lists
    neighbor_radius: float = float("inf")
    # Keep refining after the first solution (reference roadmap.hh:170;
    # FCIT* anytime mode, fcit.hh:311-344).
    optimize: bool = False


@dataclass(frozen=True)
class AORRTCSettings:
    # reference: aorrtc_settings.hh:8-18
    max_iterations: int = 100_000
    max_samples: int = 100_000
    optimize: bool = True
    cost_bound_resample: bool = True
    # Batched stand-in for the reference's unbounded parent-resampling loop
    # (aorrtc.hh:238-305): at most this many re-parent rounds per insertion
    # (the reference loop typically stops within a couple of rounds via its
    # same-parent / no-improvement / invalid-edge exits).
    cost_bound_resample_rounds: int = 2
    use_phs: bool = True
    rrtc: RRTCSettings = field(default_factory=RRTCSettings)
    simplify: SimplifySettings = field(default_factory=SimplifySettings)
