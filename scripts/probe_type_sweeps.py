#!/usr/bin/env python
"""Old (vec3 broadcast) vs new (2D plane) sphere/plane intersection on TPU.

The triangle rewrite was a clear win; this measures whether the same
restructuring helps or hurts at the small object counts (M=1..48) the
sphere/plane/box sweeps actually run at.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from raytracer_tpu.geometry import intersect as I
from raytracer_tpu.utils.constants import FARAWAY, UPDOWN, UPWARDS


def old_spheres(O, D, center, radius):
    oc = O[None, :, :] - center[:, None, :]
    tca = -jnp.sum(D[None, :, :] * oc, axis=-1)
    perp = oc + tca[..., None] * D[None, :, :]
    d2 = jnp.sum(perp * perp, axis=-1)
    r2 = (radius * radius)[:, None]
    disc = r2 - d2
    sq = jnp.sqrt(jnp.maximum(0.0, disc))
    h0 = tca - sq
    h1 = tca + sq
    h = jnp.where((h0 > 0) & (h0 < h1), h0, h1)
    M_point = O[None, :, :] + D[None, :, :] * h[..., None]
    NdotD = jnp.sum((M_point - center[:, None, :]) * D[None, :, :], axis=-1)
    valid = (disc > 0) & (h > 0) & (NdotD != 0)
    t = jnp.where(valid, h, FARAWAY)
    orient = jnp.where(NdotD < 0, UPWARDS, UPDOWN).astype(jnp.float32)
    return t, orient


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.time() - t0)
    return best


def main(N=1_000_000):
    rng = np.random.default_rng(0)
    O = jnp.asarray(rng.uniform(-3, 3, (N, 3)).astype(np.float32))
    D = rng.normal(size=(N, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    D = jnp.asarray(D)

    for M in (1, 8, 48):
        C = jnp.asarray(rng.uniform(-3, 3, (M, 3)).astype(np.float32))
        R = jnp.asarray(rng.uniform(0.5, 2.0, (M,)).astype(np.float32))

        # reduce to (N,) so output D2H is shape-independent of M
        new = jax.jit(lambda O, D: tuple(
            x.min(0) for x in I.intersect_spheres(O, D, C, R)))
        old = jax.jit(lambda O, D: tuple(
            x.min(0) for x in old_spheres(O, D, C, R)))
        # numeric agreement first
        tn, _ = I.intersect_spheres(O[:1000], D[:1000], C, R)
        to, _ = old_spheres(O[:1000], D[:1000], C, R)
        agree = np.allclose(np.asarray(tn), np.asarray(to), rtol=1e-4,
                            atol=1e-2)
        wn = timeit(new, O, D)
        wo = timeit(old, O, D)
        print(f"spheres M={M:3d}: old {wo*1e3:7.2f} ms  new {wn*1e3:7.2f} ms"
              f"  agree={agree}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
