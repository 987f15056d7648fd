#!/usr/bin/env python
"""Does a sweep over rays parked at 1e32 run slower than over normal rays?
(Suspected perf hazard of parking dead rays at huge coordinates.)"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from raytracer_tpu.geometry import intersect as I


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


def main(N=480_000, T=512):
    rng = np.random.default_rng(0)
    v0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    p1 = v0
    p2 = (v0 + rng.uniform(-0.1, 0.1, (T, 3))).astype(np.float32)
    p3 = (v0 + rng.uniform(-0.1, 0.1, (T, 3))).astype(np.float32)
    n = np.cross(p2 - p1, p3 - p1)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    c = (p1 + p2 + p3) / 3
    f = jnp.asarray
    args = (f(p1), f(n.astype(np.float32)), f(c.astype(np.float32)),
            f(np.cross(p3 - p1, n).astype(np.float32)),
            f(np.cross(p1 - p2, n).astype(np.float32)),
            f(np.cross(p2 - p3, n).astype(np.float32)), f(p2), f(p3))

    O = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    D = rng.normal(size=(N, 3)).astype(np.float32)
    D /= np.linalg.norm(D, axis=1, keepdims=True)

    @jax.jit
    def sweep(O, D):
        t, o = I.intersect_triangles(O, D, *args)
        return t.min(axis=0), o.min(axis=0)

    for name, Ov in (("normal", O),
                     ("half parked", np.where((np.arange(N) % 2 == 0)[:, None],
                                              np.float32(1e32), O)),
                     ("all parked", np.full_like(O, 1e32))):
        w = timeit(sweep, jnp.asarray(Ov), jnp.asarray(D))
        print(f"{name:12s}: {w*1e3:7.2f} ms  {T*N/w/1e9:6.1f} G tests/s",
              flush=True)


if __name__ == "__main__":
    main()
