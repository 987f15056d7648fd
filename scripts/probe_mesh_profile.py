#!/usr/bin/env python
"""Decompose the mesh-scene wall: nearest vs occlusion vs everything else,
flat sweep vs clustered sweep, on the REAL bench scene and REAL camera rays.

Usage: probe_mesh_profile.py [subdiv] [spp]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_mesh import build_scene  # noqa: E402


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.time() - t0)
    return best


def main(subdiv=4, spp=4, spread=False):
    import dataclasses

    from bench_mesh import build_spread_scene
    from raytracer_tpu.core.camera import generate_rays
    from raytracer_tpu.core.compile import compile_scene
    from raytracer_tpu.geometry import intersect as I

    sc = build_spread_scene(subdiv) if spread else build_scene(subdiv)
    static, data = compile_scene(sc)
    g = data.geom
    T = int(g.tri_p1.shape[0])
    C = int(g.tri_cl_lo.shape[0])
    W, H = sc.camera.screen_width, sc.camera.screen_height
    key = jax.random.PRNGKey(0)
    O, D = generate_rays(key, sc.camera.params(), W, H, spp)[:2]
    N = O.shape[0]
    print(f"T={T} C={C} rays={N}", flush=True)

    g_flat = dataclasses.replace(
        g, tri_cl_lo=jnp.zeros((0, 3), jnp.float32),
        tri_cl_hi=jnp.zeros((0, 3), jnp.float32),
        tri_cl_start=jnp.zeros((0,), jnp.int32))

    for name, gg in (("flat", g_flat), ("clustered", g)):
        w = timeit(jax.jit(lambda O, D, gg=gg: I.nearest_hit(O, D, gg)), O, D)
        print(f"nearest {name:9s}: {w*1e3:8.1f} ms "
              f"({T*N/w/1e9:6.1f} G tests/s equiv)", flush=True)

    if "--no-render" in sys.argv:
        return

    # shadow rays: from the primary hit points toward the directional light
    t, _, _ = jax.jit(lambda O, D: I.nearest_hit(O, D, g))(O, D)
    P = O + D * jnp.minimum(t, 100.0)[:, None]
    L = jnp.asarray(np.tile([0.5, 0.8, 0.3] / np.linalg.norm([0.5, 0.8, 0.3]),
                            (N, 1)), jnp.float32)
    md = jnp.full((N,), 1e30, jnp.float32)
    mask = jnp.asarray(np.ones((static.n_objects,), bool))
    for name, gg in (("flat", g_flat), ("clustered", g)):
        w = timeit(jax.jit(
            lambda P, L, gg=gg: I.occluded(P, L, gg, mask, md)), P, L)
        print(f"occluded {name:8s}: {w*1e3:8.1f} ms "
              f"({T*N/w/1e9:6.1f} G tests/s equiv)", flush=True)

    img, st = sc.render(samples_per_pixel=spp, return_stats=True)
    t0 = time.time()
    img, st = sc.render(samples_per_pixel=spp, seed=1, return_stats=True)
    np.asarray(img)
    print(f"full render: {time.time()-t0:7.2f} s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4,
         spread="--spread" in sys.argv)
