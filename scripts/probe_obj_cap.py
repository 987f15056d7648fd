#!/usr/bin/env python
"""Probe: how far past 48 objects can the Pallas mega-kernel go, and is it
still worth it vs the jnp wavefront?

The kernel unrolls every object (intersect + normal select + shading group),
so the cap bounds Mosaic program size / compile time.  This renders a grid
of N solid diffuse spheres + ground plane + emissive sky at several N,
through BOTH paths, interleaved in one process.

Usage: probe_obj_cap.py [N ...]    (default: 48 96 160)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def build(n_spheres, n_materials=None):
    from raytracer_tpu import Diffuse, Emissive, Plane, Scene, Sphere, rgb, vec3

    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 3.0, 9), look_at=vec3(0, 0, 0),
                  screen_width=400, screen_height=300, field_of_view=35)
    side = int(np.ceil(np.sqrt(n_spheres)))
    rng = np.random.default_rng(1)
    n_materials = n_materials or n_spheres
    mats = [Diffuse(diff_color=rgb(*rng.uniform(0.2, 0.9, 3)), diffuse_rays=1)
            for _ in range(n_materials)]
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


def timed_render(sc, spp, reps=3):
    img = sc.render(samples_per_pixel=spp, seed=0)      # compile + warm
    np.asarray(img)
    walls = []
    for r in range(reps):
        t0 = time.time()
        np.asarray(sc.render(samples_per_pixel=spp, seed=1 + r))
        walls.append(time.time() - t0)
    return float(np.median(walls))


def main(sizes, n_materials=None):
    import raytracer_tpu.core.compile as C
    from raytracer_tpu.core.compile import compile_scene

    spp = 16
    for n in sizes:
        sc = build(n, n_materials)
        C.PALLAS_MAX_OBJECTS = 10 ** 6
        C.PALLAS_MAX_GROUPS = 10 ** 6
        static, _ = compile_scene(sc)
        route = "pallas" if static.pallas_ok else "jnp"
        t0 = time.time()
        try:
            w_pal = timed_render(sc, spp)
            compile_s = time.time() - t0 - 3 * w_pal
        except Exception as e:                      # Mosaic blow-up etc.
            print(f"N={n:4d} pallas FAILED: {type(e).__name__}: {e}"[:200],
                  flush=True)
            w_pal, compile_s = None, None
        C.PALLAS_MAX_OBJECTS = 0                    # force the jnp path
        sc2 = build(n, n_materials)
        w_jnp = timed_render(sc2, spp)
        C.PALLAS_MAX_OBJECTS = 48
        C.PALLAS_MAX_GROUPS = 36
        pal = (f"{w_pal:6.2f}s (compile+warm {compile_s:5.1f}s)"
               if w_pal else "   --")
        print(f"N={n:4d} objects  route={route:6s} pallas {pal}   "
              f"jnp {w_jnp:6.2f}s", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_mats = None
    for a in sys.argv[1:]:
        if a.startswith("--materials="):
            n_mats = int(a.split("=")[1])
    sizes = [int(a) for a in args if not a.startswith("--")] or [48, 96, 160]
    main(sizes, n_mats)
