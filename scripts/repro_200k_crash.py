#!/usr/bin/env python
"""Minimal repro harness for the >=200k-triangle TPU-worker crash.

DO NOT run this near a bench deadline: each crash takes the TPU worker
down for ~10 minutes (STATUS.md "known gaps").  Observed in round 2:
327k-triangle renders crashed the worker on ALL THREE mesh paths (default
BVH traversal, forced clustered sweep, forced flat blocked sweep), while
82k triangles renders fine — suggesting a Mosaic/relay or program-size
issue rather than a path-specific bug.

This script isolates variables one at a time, smallest hammer first:

  stage 1  nearest_hit only (no shading, no render loop) at T triangles
  stage 2  bisect T upward from the known-good 82k in factor-of-1.3 steps
  stage 3  full render at the first failing T

Run each stage in a SEPARATE process (a crash kills the process); the
driver loop below just prints the planned commands.

Usage:
  python scripts/repro_200k_crash.py plan            # print the bisection plan
  python scripts/repro_200k_crash.py probe T [path] [rays] [op]
                                                     # path: bvh|clustered|flat
                                                     # rays: ray count (default
                                                     #   16384 = 64x64x4)
                                                     # op: nearest|occl
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

KNOWN_GOOD = 81_920
KNOWN_BAD = 327_680


def plan():
    t = KNOWN_GOOD
    print("# run each line in its own process; stop at the first crash:")
    while t < KNOWN_BAD:
        t = int(t * 1.3)
        for path in ("clustered", "flat"):
            print(f"timeout 900 python scripts/repro_200k_crash.py probe {t} {path}")


def probe(T, path="clustered", rays=16384, op="nearest"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench_mesh import icosphere
    from raytracer_tpu import Emissive, Scene, Triangle, rgb, vec3
    from raytracer_tpu.core.camera import generate_rays
    from raytracer_tpu.core.compile import compile_scene
    import raytracer_tpu.core.compile as C
    from raytracer_tpu.geometry import intersect as I

    # tile one icosphere until we reach T triangles (varied geometry, no
    # degenerate repeats)
    base = icosphere(5)                      # 20,480 tris
    reps = -(-T // len(base))
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 6), look_at=vec3(0, 0, 0),
                  screen_width=64, screen_height=64)
    rng = np.random.default_rng(0)
    mat = Emissive(color=rgb(1, 1, 1))
    n_added = 0
    for r in range(reps):
        off = rng.uniform(-3, 3, size=3)
        for (p1, p2, p3) in base:
            if n_added >= T:
                break
            sc.add(Triangle(material=mat, center=vec3(*off),
                            p1=vec3(*(p1 + off)), p2=vec3(*(p2 + off)),
                            p3=vec3(*(p3 + off))))
            n_added += 1
    # "bvh" is retired: the per-ray-stack traversal was deleted after the
    # crash was root-caused to its while_loop/scatter pattern with a
    # geometry-free repro (scripts/repro_bvh_minimal.py).
    if path == "clustered":
        C_thresh = 32                  # force clusters on
    else:
        C_thresh = 10 ** 9             # flat blocked sweep
    old = C.TRI_CLUSTER_THRESHOLD
    C.TRI_CLUSTER_THRESHOLD = C_thresh
    try:
        static, data = compile_scene(sc)
    finally:
        C.TRI_CLUSTER_THRESHOLD = old
    spp = max(1, rays // (64 * 64))
    O, D = generate_rays(jax.random.PRNGKey(0), sc.camera.params(),
                         64, 64, spp)[:2]
    print(f"T={n_added} path={path} rays={O.shape[0]} op={op} "
          f"clusters={data.geom.tri_cl_lo.shape[0]}", flush=True)
    import time

    if op == "occl":
        mask = jnp.ones((len(sc.scene_primitives),), bool)
        fn = jax.jit(lambda O, D: I.occluded(
            O, D, data.geom, mask,
            jnp.full(O.shape[0], 1e3, jnp.float32)))
        hit = fn(O, D)
        print("occluded frac:", float(np.asarray(hit).mean()), flush=True)
        t0 = time.time()
        np.asarray(fn(O, D))
        print(f"second-run wall {time.time() - t0:.3f}s OK", flush=True)
    else:
        fn = jax.jit(lambda O, D: I.nearest_hit(O, D, data.geom))
        t, o, i = fn(O, D)
        print("min t:", float(np.asarray(t).min()), flush=True)
        t0 = time.time()
        np.asarray(fn(O, D)[0])
        print(f"second-run wall {time.time() - t0:.3f}s OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "probe":
        probe(int(sys.argv[2]),
              sys.argv[3] if len(sys.argv) > 3 else "clustered",
              int(sys.argv[4]) if len(sys.argv) > 4 else 16384,
              sys.argv[5] if len(sys.argv) > 5 else "nearest")
    else:
        plan()
