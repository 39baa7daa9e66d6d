"""vamp_tpu: TPU-native motion planning with the reference VAMP surface.

    import vamp_tpu as vamp
    e = vamp.Environment(); e.add_sphere(vamp.Sphere([0.5, 0, 0.25], 0.2))
    module, planner, plan_s, simp_s = \
        vamp.configure_robot_and_planner_with_kwargs("panda", "rrtc")
    result = planner(a, b, e, plan_s, module.halton())

Per-robot modules (`vamp.panda`, `vamp.ur5`, `vamp.fetch`, `vamp.baxter`)
materialize lazily on first access.
"""

from .env import (
    Attachment,
    Capsule,
    Cuboid,
    Cylinder,
    Environment,
    HeightField,
    Sphere,
)
from .api import (
    HaltonSampler,
    PHSSampler,
    PlanningResult,
    ProlateHyperspheroid,
    RobotModule,
    XORShiftSampler,
    configure_robot_and_planner_with_kwargs,
    png_to_heightfield,
    problem_dict_to_vamp,
    results_to_dict,
    robot_module,
)
from .robots.descriptions import (
    DEFAULT_ITERATIONS,
    POINT_RADIUS,
    ROBOT_JOINTS,
    ROBOT_NAMES,
    ROBOT_RRT_RANGES,
)
from .multi_robot import (
    MultiRobotPlanningResult,
    MultiRobotSystem,
    Robot,
    RobotFactory,
)
from .robots.composite import bake_base, make_composite_spec
from . import factory
from .utils.settings import (
    AORRTCSettings,
    BSplineSettings,
    PerturbSettings,
    ReduceSettings,
    RoadmapSettings,
    RRTCSettings,
    ShortcutSettings,
    SimplifySettings,
)

# reference naming aliases
PRMSettings = RoadmapSettings

_ROBOT_MODULES = ("panda", "ur5", "fetch", "baxter", "sphere")


def __getattr__(name: str):
    if name in _ROBOT_MODULES:
        mod = robot_module(name)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'vamp_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals().keys()) | set(_ROBOT_MODULES))
