import sys; sys.path.insert(0,"/root/repo")
import gzip, pickle, numpy as np
from collections import Counter
from pathlib import Path
with gzip.open("benchmarks/data/panda_problems.pkl.gz") as f: data = pickle.load(f)
import vamp_tpu as vamp
for name, pset in data["problems"].items():
    ns, nc, nb, naa, nzc = [], [], [], [], []
    for p in pset:
        e = vamp.problem_dict_to_vamp(p)
        ns.append(len(e.spheres)); nc.append(len(e.capsules)); nb.append(len(e.cuboids))
        aa = 0
        for c in e.cuboids:
            R = np.asarray(c.axes if hasattr(c,'axes') else c.orientation if hasattr(c,'orientation') else None)
        naa.append(aa)
    print(f"{name}: n={len(pset)} spheres {min(ns)}-{max(ns)} capsules {min(nc)}-{max(nc)} cuboids {min(nb)}-{max(nb)}")
p = data["problems"][list(data["problems"])[0]][0]
e = vamp.problem_dict_to_vamp(p)
c = e.cuboids[0]
print("cuboid attrs:", [a for a in dir(c) if not a.startswith('_')])
