#!/usr/bin/env python
"""Hardware probe: can Mosaic legalize a fori_loop triangle sweep?

Tests the construct the in-kernel mesh path needs: a lax.fori_loop over
triangle rows stored in SMEM, dynamic scalar indexing mesh_ref[i, j], and a
6-tile (t, orient, id, nx, ny, nz) carry. CLAUDE.md records that the BOUNCE
loop's ~20-tile carry fails to legalize; this measures whether the small
carry survives, and its speed vs a python-unrolled sweep.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
TILE = (int(os.environ.get('PROBE_ROWS','128')), 128)
FARAWAY = 1.0e30


def make_kernel(T, unrolled):
    def kernel(mesh_ref, o_ref, d_ref, out_ref):
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

        def isect(g):
            p1 = g[0:3]
            n = g[9:12]
            cx, cy, cz = g[12], g[13], g[14]
            ndd = n[0] * dx + n[1] * dy + n[2] * dz
            ndd = jnp.where(ndd == 0.0, ndd + 1e-4, ndd)
            ndco = n[0] * (cx - ox) + n[1] * (cy - oy) + n[2] * (cz - oz)
            tt = ndco / ndd
            t = jnp.where((ndco * ndd > 0), jnp.abs(tt), FARAWAY)
            return t, jnp.where(ndd < 0, 1.0, -1.0)

        bt = jnp.full(TILE, FARAWAY)
        bo = jnp.ones(TILE, jnp.float32)
        bid = jnp.full(TILE, -1, jnp.int32)
        nx = jnp.zeros(TILE, jnp.float32)
        ny = jnp.zeros(TILE, jnp.float32)
        nz = jnp.zeros(TILE, jnp.float32)

        if unrolled:
            for i in range(T):
                g = [mesh_ref[i, j] for j in range(15)]
                t_i, o_i = isect(g)
                m = t_i < bt
                bt = jnp.where(m, t_i, bt)
                bo = jnp.where(m, o_i, bo)
                bid = jnp.where(m, i, bid)
                nx = jnp.where(m, g[9], nx)
                ny = jnp.where(m, g[10], ny)
                nz = jnp.where(m, g[11], nz)
        else:
            def body(i, carry):
                bt, bo, bid, nx, ny, nz = carry
                g = [mesh_ref[i, j] for j in range(15)]
                t_i, o_i = isect(g)
                m = t_i < bt
                return (jnp.where(m, t_i, bt), jnp.where(m, o_i, bo),
                        jnp.where(m, i, bid), jnp.where(m, g[9], nx),
                        jnp.where(m, g[10], ny), jnp.where(m, g[11], nz))
            bt, bo, bid, nx, ny, nz = jax.lax.fori_loop(
                0, T, body, (bt, bo, bid, nx, ny, nz))

        out_ref[0, 0] = bt + bo
        out_ref[0, 1] = nx + ny + nz
        out_ref[0, 2] = bid.astype(jnp.float32)

    return kernel


def run(T, unrolled, reps=3):
    mesh = np.random.default_rng(0).random((T, 15)).astype(np.float32)
    o = np.zeros((3,) + TILE, np.float32)
    d = np.ones((3,) + TILE, np.float32)
    call = pl.pallas_call(
        make_kernel(T, unrolled),
        grid=(int(os.environ.get('PROBE_GRID','8')),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3,) + TILE, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3,) + TILE, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3) + TILE, lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((int(os.environ.get("PROBE_GRID","8")), 3) + TILE, jnp.float32),
    )
    f = jax.jit(lambda m, o, d: call(m, o, d))
    t0 = time.time()
    out = f(mesh, jnp.asarray(o), jnp.asarray(d))
    np.asarray(out.ravel()[:1])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = f(mesh, jnp.asarray(o), jnp.asarray(d))
        np.asarray(out.ravel()[:1])
        best = min(best, time.time() - t0)
    rays = int(os.environ.get('PROBE_GRID','8')) * TILE[0] * TILE[1]
    print(f"T={T} unrolled={unrolled}: compile {compile_s:.1f}s, "
          f"run {best * 1e3:.2f}ms, {rays * T / best / 1e9:.2f} Gtri-tests/s",
          flush=True)
    return np.asarray(out)


if __name__ == "__main__":
    a = run(int(sys.argv[1]) if len(sys.argv) > 1 else 512, unrolled=False)
    if len(sys.argv) > 2 and sys.argv[2] == "both":
        b = run(int(sys.argv[1]) if len(sys.argv) > 1 else 512, unrolled=True)
        print("match:", np.allclose(a, b))
