"""Offline robot-spec compile step: spherized URDF -> committed JSON spec.

This is our analogue of the reference's offline FK codegen (which committed
generated fk.hh files). Run from the repo root with the reference resources
available (override with VAMP_TPU_RESOURCES):

    python tools/compile_robot_specs.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vamp_tpu.robots import _selfcc_data as selfcc
from vamp_tpu.robots.descriptions import DATA_DIR, ROBOT_EE_LINKS, ROBOT_JOINTS
from vamp_tpu.robots.serialize import save_spec
from vamp_tpu.robots.spec import build_spec

RESOURCES = Path(os.environ.get("VAMP_TPU_RESOURCES", "/root/reference/resources"))

# Reference's baked space-measure constants (robots/<r>/fk.hh space_measure);
# carried as data for PRM*/FCIT* connection-radius parity.
SPACE_MEASURE = {
    "panda": 878819.1112640093,
    "ur5": 700852.7173113511,
    "fetch": 269832.2635954135,
    "baxter": 89641415145.821,
}


def main():
    DATA_DIR.mkdir(exist_ok=True)
    for name in ["panda", "ur5", "fetch", "baxter"]:
        urdf = RESOURCES / name / f"{name}_spherized.urdf"
        spec = build_spec(
            str(urdf),
            actuated_joints=ROBOT_JOINTS[name],
            name=name,
            ee_link=ROBOT_EE_LINKS[name],
            self_pairs_links=getattr(selfcc, f"SELF_PAIRS_{name.upper()}"),
            self_pairs_links_attach=getattr(selfcc, f"SELF_PAIRS_ATTACH_{name.upper()}"),
            attach_check_links=getattr(selfcc, f"ATTACH_LINKS_{name.upper()}"),
        )
        spec = spec.__class__(**{**spec.__dict__, "space_measure_const": SPACE_MEASURE[name]})
        save_spec(spec, DATA_DIR / f"{name}.json")
        print(
            f"{name}: dim={spec.dimension} spheres={spec.n_spheres} "
            f"self_pairs={spec.self_pairs.shape[0]} frames={len(spec.ops)} "
            f"measure={spec.space_measure():.1f}"
        )


if __name__ == "__main__":
    main()
