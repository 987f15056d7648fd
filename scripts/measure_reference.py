#!/usr/bin/env python
"""Measure the numpy reference's wall-clock on this host.

Copies /root/reference/sightpy to a scratch dir, applies the minimal numpy-2
compatibility patches documented in BASELINE.md (the stock code crashes on
numpy >= 2), runs the example workloads, and writes BASELINE_MEASURED.json.
"""
import importlib
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REF = Path(os.environ.get("SIGHTPY_REF", "/root/reference"))
SCRATCH = Path("/tmp/refbench_measure")


def setup():
    if SCRATCH.exists():
        shutil.rmtree(SCRATCH)
    SCRATCH.mkdir(parents=True)
    shutil.copytree(REF / "sightpy", SCRATCH / "sightpy")
    for ex in REF.glob("example*.py"):
        text = ex.read_text()
        text = text.replace("img.show()", "").replace("img.save", "#img.save")
        (SCRATCH / ex.name).write_text(text)
    # numpy-2 compat (see BASELINE.md)
    v = SCRATCH / "sightpy/utils/vector3.py"
    v.write_text(v.read_text().replace("axes=([1, 0])", "axes=([1], [0])"))
    g = SCRATCH / "sightpy/materials/glossy.py"
    g.write_text(g.read_text().replace(
        "np.abs((ray.n - self.n) / (ray.n + self.n))",
        "abs((ray.n - self.n) / (ray.n + self.n))").replace(
        "np.abs((scene.n - self.n) / (scene.n + self.n))",
        "abs((scene.n - self.n) / (scene.n + self.n))"))
    c = SCRATCH / "sightpy/geometry/cuboid.py"
    c.write_text(c.read_text().replace("* np.abs(P)", "* abs(P)"))


def main():
    setup()
    os.chdir(SCRATCH)
    sys.path.insert(0, str(SCRATCH))
    results = {}
    for name, (W, H, spp) in {
        "example1": (400, 300, 6), "example2": (400, 300, 7),
        "example3": (400, 300, 4), "example4": (400, 300, 10),
    }.items():
        t0 = time.time()
        try:
            importlib.import_module(name)
            dt = time.time() - t0
            results[name] = {"wall_s": dt,
                             "primary_mrays_s": W * H * spp / dt / 1e6}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": repr(e)[:200]}
        print(name, results[name], flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
