#!/usr/bin/env python
"""Where does the instanced-mesh wall go? (R5 feature-path follow-up)

bench.py's first instancing number — 2.47 s for 48 x 1,280-tri instances
at 400x300 @ 4 spp — is ~4x slower per virtual triangle than the plain
clustered sweep (20k baked tris: 0.58 s).  This probe renders the SAME
field of icospheres two ways in ONE process, interleaved:

  a) MeshInstances (shared object-space tables, per-record ray transform)
  b) host-baked copies (48x the table memory, plain clustered sweep)

plus the per-instance decomposition (instances at 12 / 24 / 48).  The
outcome seeds the round-6 candidate list: if baked is much faster at
equal virtual-tri count, the per-record instance transform (pulling every
ray tile into instance space per cluster record) is the cost, and a
per-instance ray-cache or instance-grouped sweep is the lever.

Usage: python scripts/probe_instances_cost.py [reps]
"""

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def build(n_inst, baked):
    from example_mesh import write_icosphere_obj

    from raytracer_tpu import (Diffuse, Emissive, MeshInstances, Plane,
                               Scene, Sphere, TriangleMesh, rgb, vec3)

    obj_path = os.path.join(tempfile.gettempdir(), "probe_inst_ico.obj")
    if not os.path.exists(obj_path):
        write_icosphere_obj(obj_path, subdiv=3)

    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 6.0, 14), look_at=vec3(0, 0, 0),
                  screen_width=400, screen_height=300, field_of_view=40)
    sc.add_DirectionalLight(Ldir=vec3(0.4, 0.8, 0.5),
                            color=rgb(0.5, 0.5, 0.48))
    rng = np.random.default_rng(3)
    side = int(np.ceil(np.sqrt(n_inst)))
    mats = [Diffuse(diff_color=rgb(*rng.uniform(0.3, 0.9, 3)),
                    diffuse_rays=1) for _ in range(4)]
    placements = []
    for i in range(n_inst):
        gx, gz = i % side, i // side
        placements.append(dict(
            pos=((gx - (side - 1) / 2) * 1.6, 0.0,
                 (gz - (side - 1) / 2) * 1.6),
            scale=0.65, material=mats[i % 4]))
    if baked:
        for p in placements:
            m = TriangleMesh(obj_path, center=vec3(*p["pos"]),
                             material=p["material"], scale=p["scale"],
                             max_ray_depth=2)
            sc.add(m)
    else:
        base = TriangleMesh(obj_path, center=vec3(0, 0, 0),
                            material=mats[0], max_ray_depth=2)
        grp = MeshInstances(base)
        for p in placements:
            grp.add(translate=p["pos"], scale=p["scale"],
                    material=p["material"])
        sc.add(grp)
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.55, 0.55, 0.6),
                                  diffuse_rays=1),
                 center=vec3(0, -0.8, 0), width=80.0, height=80.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Sphere(material=Emissive(color=rgb(1.0, 1.0, 1.05)),
                  center=vec3(0, 0, 0), radius=60.0, shadow=False))
    return sc


def timed(sc, reps, spp=4):
    np.asarray(sc.render(samples_per_pixel=spp, seed=0, output="linear"))
    walls = []
    for r in range(reps):
        t0 = time.time()
        np.asarray(sc.render(samples_per_pixel=spp, seed=1 + r,
                             output="linear"))
        walls.append(time.time() - t0)
    return sorted(walls)[len(walls) // 2]


def main(reps=3):
    scenes = {}
    for n in (12, 24, 48):
        scenes[("inst", n)] = build(n, baked=False)
        scenes[("baked", n)] = build(n, baked=True)
    # compile+warm everything first, then interleave timed passes
    walls = {}
    for key, sc in scenes.items():
        t0 = time.time()
        np.asarray(sc.render(samples_per_pixel=4, seed=0, output="linear"))
        print(f"warm {key}: {time.time() - t0:.1f}s", flush=True)
    for key, sc in scenes.items():
        walls[key] = timed(sc, reps)
    for n in (12, 24, 48):
        wi = walls[("inst", n)]
        wb = walls[("baked", n)]
        print(f"n={n:3d}: instanced {wi:6.2f}s  baked {wb:6.2f}s  "
              f"(inst/baked {wi / wb:4.2f}x)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
