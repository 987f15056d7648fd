#!/usr/bin/env python
"""Probe: does a second cluster level (super-clusters of S consecutive
leaf-order clusters, one lax.cond per super gating S per-cluster conds)
beat the flat per-cluster cond scan on large meshes?

Motivation: the clustered sweep (geometry/intersect.py _clustered_nearest)
scans ALL C clusters per 32k-ray tile; a skipped (tile, cluster) pair still
pays its cond iteration (dynamic_index of the entry row + any() + branch).
At 327k tris C=1280, at 1.31M C=5120 — if the per-skipped-cond cost is a
real fraction of the wall, grouping S clusters under one super-AABB cond
cuts the skipped-cond count ~S x for tiles that miss whole regions.

Measures, interleaved in ONE process (CLAUDE.md A/B rule):
  1. pure-skip cost: rays that miss every cluster — bounds the win.
  2. real camera rays, nearest sweep: flat-cond vs super(S) for S in SWEEP.
  3. real bounce-ish shadow rays (hit points -> directional light), occlusion
     analogue is skipped here: nearest is the expensive half (20 vs 52 G/s).

Usage: probe_supercluster.py [subdiv] [reps]   (subdiv 6 = 81,920 tris)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from bench_mesh import build_scene  # noqa: E402
from raytracer_tpu.core.camera import generate_rays  # noqa: E402
from raytracer_tpu.core.compile import compile_scene  # noqa: E402
from raytracer_tpu.geometry import intersect as I  # noqa: E402
from raytracer_tpu.utils.constants import FARAWAY  # noqa: E402


def super_nearest(O, D, geom, S):
    """Two-level variant of _clustered_nearest: supers of S consecutive
    leaf-order clusters, ordered front-to-back; a fired super runs its S
    per-cluster conds (same bodies as the flat scan)."""
    padded, B, C, T = I._clustered_tri_tables(geom)
    Cs = -(-C // S)
    # super AABBs over each S-run of cluster boxes (host-side, tiny)
    lo = np.asarray(geom.tri_cl_lo, np.float32)
    hi = np.asarray(geom.tri_cl_hi, np.float32)
    pad = Cs * S - C
    lo_p = np.pad(lo, ((0, pad), (0, 0)), constant_values=np.inf)
    hi_p = np.pad(hi, ((0, pad), (0, 0)), constant_values=-np.inf)
    sup_lo = jnp.asarray(lo_p.reshape(Cs, S, 3).min(axis=1))
    sup_hi = jnp.asarray(hi_p.reshape(Cs, S, 3).max(axis=1))
    # padded per-cluster tables: starts -> T (degenerate rows, never hit)
    cl_lo = jnp.asarray(lo_p)
    cl_hi = jnp.asarray(hi_p)
    cl_start = jnp.concatenate(
        [geom.tri_cl_start, jnp.full((pad,), T, jnp.int32)])
    cl_virt = jnp.concatenate(
        [geom.tri_cl_virt, jnp.full((pad,), T, jnp.int32)])
    row2 = (jnp.arange(B, dtype=jnp.int32) * 2)[:, None]
    (Ot, Dt), n, R = I._ray_tiles(O, D)

    def tile_body(_, tile):
        O_t, D_t = tile
        ox, oy, oz = O_t[:, 0], O_t[:, 1], O_t[:, 2]
        ix, iy, iz = (I._safe_inv(D_t[:, 0]), I._safe_inv(D_t[:, 1]),
                      I._safe_inv(D_t[:, 2]))
        entry = I._cluster_entry(cl_lo, cl_hi, ox, oy, oz, ix, iy, iz)
        sup_entry = I._cluster_entry(sup_lo, sup_hi, ox, oy, oz, ix, iy, iz)
        order = jnp.argsort(jnp.min(sup_entry, axis=1))  # (Cs,)

        def cl_body(state, c):
            bt, _ = state
            ent = jax.lax.dynamic_index_in_dim(entry, c, 0, keepdims=False)
            live = ent < bt

            def run(s):
                bt, bcode = s
                start = cl_start[c]
                blk = tuple(jax.lax.dynamic_slice(x, (start, 0), (B, 3))
                            for x in padded)
                O_c, D_c = I._inst_ray_tile(geom, jnp.minimum(c, C - 1),
                                            O_t, D_t)
                t, o = I.intersect_triangles(O_c, D_c, *blk)
                tm = jnp.min(t, axis=0)
                code = (cl_virt[c] * 2 + row2) + (o < 0)
                cm = jnp.max(jnp.where(t == tm[None, :], code, -1), axis=0)
                better = tm < bt
                return (jnp.where(better, tm, bt),
                        jnp.where(better, cm, bcode))

            return jax.lax.cond(jnp.any(live), run, lambda s: s, state), None

        def sup_body(state, si):
            s = order[si]
            bt, _ = state
            ent = jax.lax.dynamic_index_in_dim(sup_entry, s, 0,
                                               keepdims=False)
            live = ent < bt

            def run(st):
                st, _ = jax.lax.scan(
                    cl_body, st, s * S + jnp.arange(S, dtype=jnp.int32))
                return st

            return jax.lax.cond(jnp.any(live), run, lambda st: st,
                                state), None

        init = (jnp.full((R,), FARAWAY, O.dtype),
                jnp.full((R,), -1, jnp.int32))
        state, _ = jax.lax.scan(sup_body, init,
                                jnp.arange(Cs, dtype=jnp.int32))
        return None, state

    _, (ts, codes) = jax.lax.scan(tile_body, None, (Ot, Dt))
    return ts.reshape(-1)[:n], codes.reshape(-1)[:n]


def timeit(fn, *args, reps=5):
    out = fn(*args)  # warm (compile)
    jax.tree_util.tree_map(np.asarray, out)
    walls = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        walls.append(time.time() - t0)
    return sorted(walls)[len(walls) // 2]


def main(subdiv=6, reps=5):
    sc = build_scene(subdiv)
    static, data = compile_scene(sc)
    g = data.geom
    T = int(g.tri_p1.shape[0])
    C = int(g.tri_cl_lo.shape[0])
    W, H = sc.camera.screen_width, sc.camera.screen_height
    spp = 4
    key = jax.random.PRNGKey(0)
    O, D = generate_rays(key, sc.camera.params(), W, H, spp)[:2]
    N = O.shape[0]
    print(f"T={T} C={C} rays={N}", flush=True)

    flat = jax.jit(lambda O, D: I._clustered_nearest(O, D, g))
    sweeps = {f"super{S}": jax.jit(
        lambda O, D, S=S: super_nearest(O, D, g, S)) for S in (4, 8, 16)}

    # 1. pure-skip: rays far away pointing AWAY from everything
    Om = jnp.full((N, 3), 1e4, jnp.float32)
    Dm = jnp.tile(jnp.asarray([[0.577, 0.577, 0.577]], jnp.float32), (N, 1))
    w = timeit(flat, Om, Dm, reps=reps)
    print(f"pure-skip flat    : {w*1e3:8.1f} ms "
          f"({w/ (C * -(-N // I.RAY_TILE)) * 1e6:6.2f} us/cond)", flush=True)
    for name, fn in sweeps.items():
        w = timeit(fn, Om, Dm, reps=reps)
        print(f"pure-skip {name:8s}: {w*1e3:8.1f} ms", flush=True)

    # 2. camera rays, interleaved A/B (3 passes)
    results = {k: [] for k in ["flat"] + list(sweeps)}
    ref = None
    for _ in range(3):
        results["flat"].append(timeit(flat, O, D, reps=reps))
        for name, fn in sweeps.items():
            results[name].append(timeit(fn, O, D, reps=reps))
    tref, cref = jax.tree_util.tree_map(np.asarray, flat(O, D))
    for name, fn in list(sweeps.items()):
        tv, cv = jax.tree_util.tree_map(np.asarray, fn(O, D))
        same_t = np.allclose(tv, tref, rtol=1e-6, atol=1e-6)
        print(f"{name}: t match={same_t} code match="
              f"{(cv == cref).mean():.4f}", flush=True)
    for name, ws in results.items():
        w = min(ws)
        print(f"camera {name:9s}: {w*1e3:8.1f} ms "
              f"({T*N/w/1e9:6.1f} G tests/s equiv)", flush=True)

    # 3. shadow-ish secondary rays from primary hit points
    P = O + D * jnp.minimum(tref, 100.0)[:, None]
    L = jnp.asarray(np.tile([0.5, 0.8, 0.3] / np.linalg.norm([0.5, 0.8, 0.3]),
                            (N, 1)), jnp.float32)
    flat2 = jax.jit(lambda O, D: I._clustered_nearest(O, D, g))
    for _ in range(2):
        w = timeit(flat2, P, L, reps=reps)
        print(f"shadow flat      : {w*1e3:8.1f} ms", flush=True)
        for name, fn in sweeps.items():
            w = timeit(fn, P, L, reps=reps)
            print(f"shadow {name:9s}: {w*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5)
