#!/usr/bin/env python
"""Hardware probe for the POST-MERGE Pallas group gate (VERDICT r4 #1).

Since R4.11 the solid mega-kernel compiles ONE unrolled shading block per
merged group (material KIND x depth-cap x mc [x dispersion]) with per-lane
parameter selection over member slots, but until R5 the compile gate
(core/compile.py) counted PRE-merge (kind, slot, depth, mc) tuples — so a
48-object scene with 40 distinct materials of 4 kinds compiled ~4 blocks
yet fell to the jnp wavefront.  This probe validates the widened gate on
hardware, two axes:

1. SLOT sweep: 46 spheres + plane + emissive sky, M in {4, 24, 46} distinct
   diffuse materials (merged groups stay ~3; per-lane where-chains grow
   with M).  Watch: compile wall, then interleaved render A/B vs the
   forced jnp wavefront.
2. MERGED-GROUP sweep: one kind, max_ray_depth varied per object so the
   merged-group count itself is G in {24, 36, 48}.  Watch: the compiler
   subprocess wall (the r2 probe_obj_cap.py found ~46 per-slot BLOCKS kill
   it; merged blocks should hit the same wall at the same BLOCK count).

Usage: probe_group_gate.py [slots|groups|both]  (default both)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_slots(n_spheres, n_materials):
    """Many distinct materials, few kinds (the gate-widening target)."""
    from raytracer_tpu import (Diffuse, Emissive, Glossy, Plane, Refractive,
                               Scene, Sphere, rgb, vec3)

    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 3.0, 9), look_at=vec3(0, 0, 0),
                  screen_width=400, screen_height=300, field_of_view=35)
    sc.add_PointLight(pos=vec3(0, 6, 4), color=rgb(120, 120, 130))
    rng = np.random.default_rng(7)
    mats = []
    for i in range(n_materials):
        c = rng.uniform(0.2, 0.9, 3)
        kind = i % 4
        if kind == 0:
            mats.append(Diffuse(diff_color=rgb(*c), diffuse_rays=1))
        elif kind == 1:
            mats.append(Glossy(diff_color=rgb(*c),
                               n=vec3(1.2 + 0.2j, 1.3 + 0.2j, 1.4 + 0.2j),
                               roughness=0.3 + 0.3 * float(c[0]),
                               spec_coeff=0.25, diff_coeff=0.75))
        elif kind == 2:
            mats.append(Refractive(n=vec3(1.3 + 0.3 * float(c[0]) + 0j,
                                          1.35 + 0j, 1.4 + 0j)))
        else:
            mats.append(Emissive(color=rgb(*(c * 1.5))))
    side = int(np.ceil(np.sqrt(n_spheres)))
    for i in range(n_spheres):
        gx, gz = i % side, i // side
        x = (gx - (side - 1) / 2) * 1.2
        z = (gz - (side - 1) / 2) * 1.2
        sc.add(Sphere(material=mats[i % n_materials],
                      center=vec3(x, 0.0, z), radius=0.45, max_ray_depth=3))
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.6, 0.6, 0.65),
                                  diffuse_rays=1),
                 center=vec3(0, -0.5, 0), width=60.0, height=60.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Sphere(material=Emissive(color=rgb(1.1, 1.1, 1.2)),
                  center=vec3(0, 0, 0), radius=50.0, shadow=False))
    return sc


def build_groups(n_groups):
    """One material kind, n_groups distinct max_ray_depth values — the
    merged-group count IS n_groups (+2 for floor/sky)."""
    from raytracer_tpu import Diffuse, Emissive, Plane, Scene, Sphere, rgb, vec3

    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 3.0, 9), look_at=vec3(0, 0, 0),
                  screen_width=400, screen_height=300, field_of_view=35)
    rng = np.random.default_rng(7)
    n_spheres = max(n_groups, 46)
    side = int(np.ceil(np.sqrt(n_spheres)))
    for i in range(n_spheres):
        gx, gz = i % side, i // side
        x = (gx - (side - 1) / 2) * 1.2
        z = (gz - (side - 1) / 2) * 1.2
        sc.add(Sphere(material=Diffuse(diff_color=rgb(*rng.uniform(0.2, 0.9, 3)),
                                       diffuse_rays=1),
                      center=vec3(x, 0.0, z), radius=0.45,
                      max_ray_depth=2 + (i % n_groups)))
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.6, 0.6, 0.65),
                                  diffuse_rays=1),
                 center=vec3(0, -0.5, 0), width=60.0, height=60.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Sphere(material=Emissive(color=rgb(1.1, 1.1, 1.2)),
                  center=vec3(0, 0, 0), radius=50.0, shadow=False))
    return sc


def timed_render(sc, spp, reps=3, **kw):
    t0 = time.time()
    img = sc.render(samples_per_pixel=spp, seed=0, **kw)   # compile + warm
    np.asarray(img)
    compile_warm = time.time() - t0
    walls = []
    for r in range(reps):
        t0 = time.time()
        np.asarray(sc.render(samples_per_pixel=spp, seed=1 + r, **kw))
        walls.append(time.time() - t0)
    return float(np.median(walls)), compile_warm


def main(mode):
    import raytracer_tpu.core.compile as C
    from raytracer_tpu.core.compile import compile_scene

    spp = 16
    if mode in ("slots", "both"):
        print("== slot sweep (48 objects, merged groups ~4-6) ==", flush=True)
        for m in (4, 24, 46):
            sc = build_slots(46, m)
            static, _ = compile_scene(sc)
            print(f"M={m:3d}: pallas_ok={static.pallas_ok}", flush=True)
            if not static.pallas_ok:
                continue
            w_pal, cw = timed_render(sc, spp)
            # forced wavefront, same process (interleaved)
            sc2 = build_slots(46, m)
            C.PALLAS_MAX_OBJECTS = 0
            w_jnp, cw2 = timed_render(sc2, spp)
            C.PALLAS_MAX_OBJECTS = 48
            # second pallas pass to bracket drift
            w_pal2, _ = timed_render(sc, spp)
            print(f"M={m:3d}: pallas {w_pal:6.2f}/{w_pal2:6.2f}s "
                  f"(compile+warm {cw:6.1f}s)  jnp {w_jnp:6.2f}s "
                  f"(compile+warm {cw2:6.1f}s)  "
                  f"speedup {w_jnp / min(w_pal, w_pal2):.2f}x", flush=True)
    if mode in ("groups", "both"):
        print("== merged-group sweep (one kind, depth-varied) ==", flush=True)
        C.PALLAS_MAX_GROUPS = 10 ** 6      # let the sweep pass the gate
        for gcount in (24, 36, 48):
            sc = build_groups(gcount)
            static, _ = compile_scene(sc)
            print(f"G={gcount:3d}: pallas_ok={static.pallas_ok}", flush=True)
            try:
                w_pal, cw = timed_render(sc, spp, reps=1)
                print(f"G={gcount:3d}: render {w_pal:6.2f}s "
                      f"(compile+warm {cw:6.1f}s)", flush=True)
            except Exception as e:
                print(f"G={gcount:3d}: FAILED {type(e).__name__}: "
                      f"{e}"[:200], flush=True)
        C.PALLAS_MAX_GROUPS = 36


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
