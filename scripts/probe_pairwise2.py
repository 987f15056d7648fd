#!/usr/bin/env python
"""Hardware probe #3: pairwise sweep, rays-in-sublanes x tris-in-lanes.

All-static addressing: the ray tile's columns are extracted with STATIC lane
slices (python-unrolled loop over 128 lanes), triangle params are static
sublane rows of the (24, 128) block, and the per-ray best accumulators are
updated with lane-iota masks — no dynamic VMEM indexing anywhere.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FARAWAY = 1.0e30
ROWS = 128


def make_kernel(n_blocks, lanes_per_iter=128):
    def kernel(mesh_ref, o_ref, d_ref, t_ref, id_ref, n_ref):
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]     # (ROWS, 128)
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)

        best_t = jnp.full((ROWS, 128), FARAWAY)
        best_i = jnp.full((ROWS, 128), -1.0)
        bnx = jnp.zeros((ROWS, 128), jnp.float32)
        bny = jnp.zeros((ROWS, 128), jnp.float32)
        bnz = jnp.zeros((ROWS, 128), jnp.float32)

        def tri_block(b, carry):
            best_t, best_i, bnx, bny, bnz = carry
            blk = mesh_ref[b]                         # (24, 128) params x tris
            row = lambda j: blk[j:j + 1, :]           # (1, 128) static
            tid = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                   .astype(jnp.float32) + b.astype(jnp.float32) * 128.0)

            for l in range(128):                      # static lane column
                rox = ox[:, l:l + 1]
                roy = oy[:, l:l + 1]
                roz = oz[:, l:l + 1]
                rdx = dx[:, l:l + 1]
                rdy = dy[:, l:l + 1]
                rdz = dz[:, l:l + 1]
                # pairwise (ROWS rays, 128 tris)
                ndd = row(9) * rdx + row(10) * rdy + row(11) * rdz
                ndd = jnp.where(ndd == 0.0, ndd + 1e-4, ndd)
                ndco = (row(9) * (row(12) - rox) + row(10) * (row(13) - roy)
                        + row(11) * (row(14) - roz))
                tt = ndco / ndd
                mx = rox + rdx * tt
                my = roy + rdy * tt
                mz = roz + rdz * tt
                inside = (
                    (row(15) * (mx - row(0)) + row(16) * (my - row(1))
                     + row(17) * (mz - row(2)) >= 0)
                    & (row(18) * (mx - row(3)) + row(19) * (my - row(4))
                       + row(20) * (mz - row(5)) >= 0)
                    & (row(21) * (mx - row(6)) + row(22) * (my - row(7))
                       + row(23) * (mz - row(8)) >= 0)
                    & (ndco * ndd > 0))
                t = jnp.where(inside, jnp.abs(tt), FARAWAY)   # (ROWS, 128)
                tmin = jnp.min(t, axis=1, keepdims=True)      # (ROWS, 1)
                wid = jnp.min(jnp.where(t == tmin, tid, FARAWAY), axis=1,
                              keepdims=True)
                m = (tid == wid) & (t == tmin)
                nxw = jnp.sum(jnp.where(m, row(9), 0.0), axis=1, keepdims=True)
                nyw = jnp.sum(jnp.where(m, row(10), 0.0), axis=1, keepdims=True)
                nzw = jnp.sum(jnp.where(m, row(11), 0.0), axis=1, keepdims=True)
                upd = (lane == l) & (tmin < best_t)
                best_t = jnp.where(upd, tmin, best_t)
                best_i = jnp.where(upd, wid, best_i)
                bnx = jnp.where(upd, nxw, bnx)
                bny = jnp.where(upd, nyw, bny)
                bnz = jnp.where(upd, nzw, bnz)
            return best_t, best_i, bnx, bny, bnz

        best_t, best_i, bnx, bny, bnz = jax.lax.fori_loop(
            0, n_blocks, tri_block, (best_t, best_i, bnx, bny, bnz))
        t_ref[...] = best_t
        id_ref[...] = best_i
        n_ref[0] = bnx
        n_ref[1] = bny
        n_ref[2] = bnz

    return kernel


def run(T=5120, reps=3):
    rng = np.random.default_rng(0)
    Tpad = -(-T // 128) * 128
    p1 = rng.random((Tpad, 3), np.float32) * 2 - 1 + [0, 0, -4]
    p2 = p1 + rng.random((Tpad, 3), np.float32) * 0.4
    p3 = p1 + rng.random((Tpad, 3), np.float32) * 0.4
    n = np.cross(p2 - p1, p3 - p1)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    cen = (p1 + p2 + p3) / 3
    n31 = np.cross(p3 - p1, n)
    n12 = np.cross(p1 - p2, n)
    n23 = np.cross(p2 - p3, n)
    params = np.concatenate([p1, p2, p3, n, cen, n31, n12, n23], axis=1)
    mesh = np.ascontiguousarray(
        params.reshape(Tpad // 128, 128, 24).transpose(0, 2, 1))

    N = ROWS * 128
    o = np.zeros((3, ROWS, 128), np.float32)
    d = rng.standard_normal((3, N)).astype(np.float32)
    d[2] -= 2.0
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = d.reshape(3, ROWS, 128)

    call = pl.pallas_call(
        make_kernel(Tpad // 128),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
                   jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
                   jax.ShapeDtypeStruct((3, ROWS, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    f = jax.jit(lambda m, o, d: call(m, o, d))
    t0 = time.time()
    t, tid, nrm = f(jnp.asarray(mesh), jnp.asarray(o), jnp.asarray(d))
    np.asarray(t.ravel()[:1])
    print(f"compile {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        t, tid, nrm = f(jnp.asarray(mesh), jnp.asarray(o), jnp.asarray(d))
        np.asarray(t.ravel()[:1])
        best = min(best, time.time() - t0)
    print(f"T={Tpad} run {best * 1e3:.2f}ms "
          f"{N * Tpad / best / 1e9:.1f} Gtri-tests/s", flush=True)

    # numpy spot check: ray (r, l) maps to flat index r*128 + l
    t_np = np.asarray(t).reshape(-1)
    id_np = np.asarray(tid).reshape(-1)
    O = o.reshape(3, -1).T
    Dd = np.asarray(d).reshape(3, -1).T
    for i in rng.integers(0, N, 48):
        ndd = (n * Dd[i]).sum(1)
        ndd = np.where(ndd == 0, ndd + 1e-4, ndd)
        ndco = (n * (cen - O[i])).sum(1)
        tt = ndco / ndd
        M = O[i] + Dd[i] * tt[:, None]
        inside = (((n31 * (M - p1)).sum(1) >= 0)
                  & ((n12 * (M - p2)).sum(1) >= 0)
                  & ((n23 * (M - p3)).sum(1) >= 0) & (ndco * ndd > 0))
        tv = np.where(inside, np.abs(tt), FARAWAY)
        assert abs(tv.min() - t_np[i]) < 1e-3 * max(1, abs(tv.min())), (
            i, tv.min(), t_np[i])
        if tv.min() < FARAWAY:
            assert tv[int(id_np[i])] <= tv.min() * (1 + 1e-5), i
    print("numpy check OK", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 5120)
