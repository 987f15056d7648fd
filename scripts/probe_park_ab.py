#!/usr/bin/env python
"""Interleaved A/B of RenderSettings.park_dead on the mesh bench scene.
One process, both variants compiled, alternating timed reps — immune to the
machine-level drift that makes back-to-back bench_mesh runs spread ~30%.

HISTORICAL: the experiment measured park_dead neutral-to-worse (median
7.53s parked vs 7.19s not, 20k tris), so the knob was REMOVED from
RenderSettings and this script no longer runs.  Kept as the record of the
negative result (see the comment in core/integrator.py's bounce_body)."""

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_mesh import build_scene  # noqa: E402


def main(subdiv=4, spp=4, reps=4):
    sc = build_scene(subdiv)
    base = sc.settings
    walls = {True: [], False: []}
    for park in (True, False):        # warm both compiles
        sc.settings = dataclasses.replace(base, park_dead=park)
        sc.render(samples_per_pixel=spp, seed=0)
    for rep in range(reps):
        for park in (True, False):
            sc.settings = dataclasses.replace(base, park_dead=park)
            t0 = time.time()
            img = sc.render(samples_per_pixel=spp, seed=rep + 1)
            np.asarray(img)
            walls[park].append(time.time() - t0)
    for park, ws in walls.items():
        ws = sorted(ws)
        print(f"park_dead={park}: median {ws[len(ws)//2]:.2f}s  all "
              f"{[round(w, 2) for w in ws]}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
