#!/usr/bin/env python
"""Hardware probe #2: blocked PAIRWISE mesh sweep building blocks.

Validates on real TPU:
  - nested fori_loop (tri-blocks x ray-rows)
  - dynamic sublane load/store on VMEM scratch
  - (128,1) x (1,128) broadcast pairwise tiles
  - sublane reductions (min + exact-winner select)
  - in-kernel (24,128) -> (128,24) transpose of the tri-param block

Computes nearest-hit of 16384 rays against T triangles and compares with a
numpy reference; reports Gtri-tests/s (target: >> the 1.8 G/s scalar sweep).
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
ROWS = 128      # ray rows per program; rays per program = ROWS * 128


def make_kernel(n_blocks):
    def kernel(mesh_ref, o_ref, d_ref, t_ref, id_ref, n_ref, scratch):
        # scratch: (2, ROWS, 128) f32 — best_t rows + best_id rows
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

        scratch[0] = jnp.full((ROWS, 128), FARAWAY)
        scratch[1] = jnp.full((ROWS, 128), -1.0)
        for k in range(3):
            n_ref[k] = jnp.zeros((ROWS, 128), jnp.float32)
        # ray state to scratch-like refs? rays already in VMEM refs (o_ref).

        def tri_block(b, _):
            blk = mesh_ref[b]                       # (24, 128): params x tris
            p = jnp.transpose(blk)                  # (128, 24): tris x params
            col = lambda j: p[:, j:j + 1]           # (128, 1)
            tid = (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
                   .astype(jnp.float32) + b.astype(jnp.float32) * 128.0)

            def ray_row(r, _):
                rox = o_ref[0, pl.ds(r, 1), :]                      # (1,128)
                roy = o_ref[1, pl.ds(r, 1), :]
                roz = o_ref[2, pl.ds(r, 1), :]
                rdx = d_ref[0, pl.ds(r, 1), :]
                rdy = d_ref[1, pl.ds(r, 1), :]
                rdz = d_ref[2, pl.ds(r, 1), :]
                # pairwise (128 tris, 128 rays)
                ndd = col(9) * rdx + col(10) * rdy + col(11) * rdz
                ndd = jnp.where(ndd == 0.0, ndd + 1e-4, ndd)
                ndco = (col(9) * (col(12) - rox) + col(10) * (col(13) - roy)
                        + col(11) * (col(14) - roz))
                tt = ndco / ndd
                mx = rox + rdx * tt
                my = roy + rdy * tt
                mz = roz + rdz * tt
                inside = (
                    (col(15) * (mx - col(0)) + col(16) * (my - col(1))
                     + col(17) * (mz - col(2)) >= 0)
                    & (col(18) * (mx - col(3)) + col(19) * (my - col(4))
                       + col(20) * (mz - col(5)) >= 0)
                    & (col(21) * (mx - col(6)) + col(22) * (my - col(7))
                       + col(23) * (mz - col(8)) >= 0)
                    & (ndco * ndd > 0))
                t = jnp.where(inside, jnp.abs(tt), FARAWAY)   # (128,128)
                tmin = jnp.min(t, axis=0, keepdims=True)      # (1,128)
                # exact winner id: first tri achieving tmin
                winners = jnp.where(t == tmin, tid, FARAWAY)
                wid = jnp.min(winners, axis=0, keepdims=True)  # (1,128)
                prev_t = scratch[0, pl.ds(r, 1), :]
                prev_i = scratch[1, pl.ds(r, 1), :]
                better = tmin < prev_t
                scratch[0, pl.ds(r, 1), :] = jnp.where(better, tmin, prev_t)
                scratch[1, pl.ds(r, 1), :] = jnp.where(better, wid, prev_i)
                # winner normal via exact-id match + sublane sum
                m = (tid == wid) & (t == tmin)
                for k in range(3):
                    nk = jnp.sum(jnp.where(m, col(9 + k), 0.0), axis=0,
                                 keepdims=True)
                    old = n_ref[k, pl.ds(r, 1), :]
                    n_ref[k, pl.ds(r, 1), :] = jnp.where(better, nk, old)
                return 0

            jax.lax.fori_loop(0, ROWS, ray_row, 0)
            return 0

        jax.lax.fori_loop(0, n_blocks, tri_block, 0)
        t_ref[...] = scratch[0]
        id_ref[...] = scratch[1]

    return kernel


def run(T=5120, reps=3):
    rng = np.random.default_rng(0)
    Tpad = -(-T // 128) * 128
    # triangles in a box in front of the rays
    p1 = rng.random((Tpad, 3), np.float32) * 2 - 1 + [0, 0, -4]
    p2 = p1 + rng.random((Tpad, 3), np.float32) * 0.4
    p3 = p1 + rng.random((Tpad, 3), np.float32) * 0.4
    n = np.cross(p2 - p1, p3 - p1)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    cen = (p1 + p2 + p3) / 3
    n31 = np.cross(p3 - p1, n)
    n12 = np.cross(p1 - p2, n)
    n23 = np.cross(p2 - p3, n)
    # param layout: [p1(0:3) p2(3:6) p3(6:9) n(9:12) cen(12:15)
    #                n31(15:18) n12(18:21) n23(21:24)]
    params = np.concatenate([p1, p2, p3, n, cen, n31, n12, n23], axis=1)
    mesh = np.ascontiguousarray(
        params.reshape(Tpad // 128, 128, 24).transpose(0, 2, 1))  # (B,24,128)

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
        scratch_shapes=[pltpu.VMEM((2, ROWS, 128), jnp.float32)],
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

    # numpy reference check on a subset of rays
    t_np = np.asarray(t).reshape(-1)
    id_np = np.asarray(tid).reshape(-1)
    O = o.reshape(3, -1).T
    Dd = np.asarray(d).reshape(3, -1).T
    sel = rng.integers(0, N, 64)
    for i in sel:
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
