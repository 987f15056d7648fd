#!/usr/bin/env python
"""Isolate the jnp mesh-sweep cost on TPU: where do the cycles go?

Times, for N rays x T triangles:
  raw     one intersect_triangles block call (no reduce)   -> pure test rate
  minonly blocked scan, min-reduce only (no argmin/orient)
  nearest full nearest_hit (argmin + orient select + id)
  occl    full occluded
Each timed as the best of 3 identical jitted calls (D2H-forced).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from raytracer_tpu.geometry import intersect as I


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


class Geom:
    pass


def main(N=480_000, T=5120):
    rng = np.random.default_rng(0)
    # random tris in a box; random rays from a shell
    v0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.1, 0.1, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (T, 3)).astype(np.float32)
    p1, p2, p3 = v0, v0 + e1, v0 + e2
    n = np.cross(p2 - p1, p3 - p1)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    c = (p1 + p2 + p3) / 3

    def edge_normal(pa, pb, pc):
        e = pb - pa
        nn = np.cross(n, e)
        inward = np.einsum("ij,ij->i", nn, pc - pa)
        return (nn * np.sign(inward)[:, None]).astype(np.float32)

    g = Geom()
    g.tri_p1, g.tri_p2, g.tri_p3 = map(jnp.asarray, (p1, p2, p3))
    g.tri_normal = jnp.asarray(n.astype(np.float32))
    g.tri_centroid = jnp.asarray(c.astype(np.float32))
    g.tri_n31 = jnp.asarray(edge_normal(p3, p1, p2))
    g.tri_n12 = jnp.asarray(edge_normal(p1, p2, p3))
    g.tri_n23 = jnp.asarray(edge_normal(p2, p3, p1))
    g.sphere_center = jnp.zeros((0, 3), jnp.float32)
    g.sphere_radius = jnp.zeros((0,), jnp.float32)
    g.plane_center = jnp.zeros((0, 3), jnp.float32)
    g.plane_normal = g.plane_u_axis = g.plane_v_axis = g.plane_center
    g.plane_half_w = g.plane_half_h = jnp.zeros((0,), jnp.float32)
    g.box_basis = jnp.zeros((0, 3, 3), jnp.float32)
    g.box_lb_local = g.box_rt_local = jnp.zeros((0, 3), jnp.float32)
    g.tri_cl_lo = g.tri_cl_hi = jnp.zeros((0, 3), jnp.float32)
    g.tri_cl_start = jnp.zeros((0,), jnp.int32)

    O = jnp.asarray(rng.uniform(-3, 3, (N, 3)).astype(np.float32))
    D = rng.normal(size=(N, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    D = jnp.asarray(D)

    B = I._tri_block_size(N)
    print(f"N={N} T={T} block={B}", flush=True)

    tabs = I._tri_tables(g)
    blk = [x[:B] for x in tabs]

    @jax.jit
    def raw(O, D):
        t, o = I.intersect_triangles(O, D, *blk)
        return t.min(axis=0), o.min(axis=0)   # forces both planes

    w = timeit(raw, O, D)
    print(f"raw 1-block ({B} tris): {w*1e3:8.2f} ms  "
          f"{B*N/w/1e9:7.1f} G tests/s", flush=True)

    @jax.jit
    def minonly(O, D):
        def red(t, o, base, s):
            return jnp.minimum(s, t.min(axis=0))
        return I._blocked_tri_scan(O, D, g, red, jnp.full((N,), 1e30))

    w = timeit(minonly, O, D)
    print(f"minonly scan: {w*1e3:8.2f} ms  {T*N/w/1e9:7.1f} G tests/s",
          flush=True)

    @jax.jit
    def nearest(O, D):
        return I.nearest_hit(O, D, g)

    w = timeit(nearest, O, D)
    print(f"nearest_hit : {w*1e3:8.2f} ms  {T*N/w/1e9:7.1f} G tests/s",
          flush=True)

    mask = jnp.ones((T,), bool)
    md = jnp.full((N,), 1e30, jnp.float32)

    @jax.jit
    def occl(O, D):
        return I.occluded(O, D, g, mask, md)

    w = timeit(occl, O, D)
    print(f"occluded    : {w*1e3:8.2f} ms  {T*N/w/1e9:7.1f} G tests/s",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 480_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5120)
