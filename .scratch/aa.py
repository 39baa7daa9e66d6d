import sys; sys.path.insert(0,"/root/repo")
import gzip, pickle, numpy as np
with gzip.open("benchmarks/data/panda_problems.pkl.gz") as f: data = pickle.load(f)
import vamp_tpu as vamp
naa = ncub = 0; nz = ncap = 0
for name, pset in data["problems"].items():
    for p in pset[:20]:
        e = vamp.problem_dict_to_vamp(p)
        for c in e.cuboids:
            ncub += 1
            R = np.asarray(c.axes)
            if np.allclose(np.abs(R), np.eye(3), atol=0): naa += 1
        for c in e.capsules:
            ncap += 1
print(f"axis-aligned cuboids: {naa}/{ncub}; capsules {ncap}")
