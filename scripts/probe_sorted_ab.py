#!/usr/bin/env python
"""A/B probe: does Morton-origin ray reordering speed up the clustered
triangle sweep on INCOHERENT bounce rays?

The clustered sweep's win comes from tiles skipping (tile, cluster) pairs;
primary rays are pixel-major so tiles are spatially tight, but bounce >= 1
rays arrive in pixel order with scattered origins/directions, so every tile
touches most clusters (STATUS.md round-3 candidate).  This probe builds
REAL bounce rays (cosine-sampled continuations from the primary hits of the
mesh bench scene) and interleaves, in ONE process:

  A: nearest/occluded clustered sweep as-is
  B: same, with rays pre-sorted by (morton9(origin) << 3 | dir octant)
     and results scattered back

Reports medians of interleaved reps plus the standalone sort overhead.

Usage: probe_sorted_ab.py [subdiv] [spp] [--spread]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_mesh import build_scene, build_spread_scene  # noqa: E402


def _spread9(x):
    """Spread the low 9 bits of x so there are 2 zero bits between each."""
    x = x.astype(jnp.uint32)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def coherence_key(O, D, lo, hi):
    """(N,) uint32 sort key: 27-bit Morton code of the quantized origin in
    the mesh bounding box, direction octant in the low 3 bits."""
    scale = 511.0 / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((O - lo) * scale, 0.0, 511.0).astype(jnp.uint32)
    morton = ((_spread9(q[:, 0]) << 2) | (_spread9(q[:, 1]) << 1)
              | _spread9(q[:, 2]))
    octant = ((D[:, 0] < 0).astype(jnp.uint32)
              | ((D[:, 1] < 0).astype(jnp.uint32) << 1)
              | ((D[:, 2] < 0).astype(jnp.uint32) << 2))
    return (morton << 3) | octant


def timeit_interleaved(fns, args, reps=7):
    """Interleave variants within one process; per-variant median wall."""
    outs = [fn(*args) for fn in fns]          # compile + warm
    for o in outs:
        jax.tree_util.tree_map(np.asarray, o)
    walls = [[] for _ in fns]
    for _ in range(reps):
        for i, fn in enumerate(fns):
            t0 = time.time()
            jax.tree_util.tree_map(np.asarray, fn(*args))
            walls[i].append(time.time() - t0)
    return [float(np.median(w)) for w in walls]


def main(subdiv=4, spp=4, spread=False):
    from raytracer_tpu.core.camera import generate_rays
    from raytracer_tpu.core.compile import compile_scene
    from raytracer_tpu.geometry import intersect as I
    from raytracer_tpu.geometry.attrs import hit_attributes

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

    # --- build real bounce-1 rays: cosine continuations off the primary hits
    @jax.jit
    def bounce_rays(O, D):
        t, orient, obj = I.nearest_hit(O, D, g)
        miss = t >= 1e30
        P = O + D * t[..., None]
        Ngeo, _ = hit_attributes(P, obj, g, static)
        Nsh = Ngeo * orient[..., None]
        k = jax.random.PRNGKey(7)
        u = jax.random.normal(k, (N, 3))
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        d = Nsh + u                                     # ~cosine lobe
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
        eps = 1e-4 * jnp.maximum(1.0, jnp.max(jnp.abs(P), axis=-1))
        Ob = jnp.where(miss[:, None], O, P + Nsh * eps[:, None])
        Db = jnp.where(miss[:, None], D, d)
        return Ob, Db

    Ob, Db = bounce_rays(O, D)
    Ob, Db = np.asarray(Ob), np.asarray(Db)
    Ob, Db = jnp.asarray(Ob), jnp.asarray(Db)

    lo = jnp.min(g.tri_cl_lo, axis=0)
    hi = jnp.max(g.tri_cl_hi, axis=0)

    def nearest_plain(O, D):
        return I.nearest_hit(O, D, g)

    def nearest_sorted(O, D):
        k = coherence_key(O, D, lo, hi)
        perm = jnp.argsort(k)
        t, o, oid = I.nearest_hit(O[perm], D[perm], g)
        ar = jnp.arange(N, dtype=jnp.int32)
        inv = jnp.zeros((N,), jnp.int32).at[perm].set(ar)
        return t[inv], o[inv], oid[inv]

    def sort_only(O, D):
        k = coherence_key(O, D, lo, hi)
        perm = jnp.argsort(k)
        return O[perm], D[perm]

    fns = [jax.jit(nearest_plain), jax.jit(nearest_sorted),
           jax.jit(sort_only)]   # one jit wrapper each, reused across labels
    for label, (Oq, Dq) in (("primary", (O, D)), ("bounce1", (Ob, Db))):
        wa, wb, ws = timeit_interleaved(fns, (Oq, Dq))
        print(f"nearest  {label}: plain {wa*1e3:7.1f} ms   "
              f"sorted {wb*1e3:7.1f} ms ({wa/wb:4.2f}x)   "
              f"[sort overhead {ws*1e3:6.1f} ms]", flush=True)

    # --- occlusion: shadow rays from the bounce-hit points toward the light
    Ldir = np.array([0.5, 0.8, 0.3])
    Ldir /= np.linalg.norm(Ldir)
    Lt = jnp.asarray(np.tile(Ldir, (N, 1)), jnp.float32)
    md = jnp.full((N,), 1e30, jnp.float32)
    mask = jnp.asarray(np.ones((static.n_objects,), bool))

    def occ_plain(O):
        return I.occluded(O, Lt, g, mask, md)

    def occ_sorted(O):
        k = coherence_key(O, Lt, lo, hi)
        perm = jnp.argsort(k)
        h = I.occluded(O[perm], Lt[perm], g, mask, md)
        ar = jnp.arange(N, dtype=jnp.int32)
        inv = jnp.zeros((N,), jnp.int32).at[perm].set(ar)
        return h[inv]

    wa, wb = timeit_interleaved([jax.jit(occ_plain), jax.jit(occ_sorted)],
                                (Ob,))
    print(f"occluded bounce1: plain {wa*1e3:7.1f} ms   "
          f"sorted {wb*1e3:7.1f} ms ({wa/wb:4.2f}x)", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 4,
         int(args[1]) if len(args) > 1 else 4,
         spread="--spread" in sys.argv)
