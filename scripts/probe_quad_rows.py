#!/usr/bin/env python
"""Hardware A/B of the R5 quad-row bilinear fetch (VERDICT r4 #6).

The replay gather wall is per-ROW (~13 ns/row at any width <= 16 words,
scripts/probe_gather.py), and the bilinear replay spends FOUR rows per
fetch.  The quad atlas (core/compile.py _texture_atlas_quad) packs each
texel's 2x2 tap neighborhood into one 4-word row so a bilinear fetch is
ONE row — the only row-reduction mechanism the R4 matrix did not touch.

Two measurements, both interleaved in ONE process:
  1. raw gather microbenchmark: 4 gathers of N single-word rows vs 1
     gather of N 4-word rows (same decode+weight math after both).
  2. engine-level: pallas_record_chunk on a bilinear-textured scene
     (quad_fetch=None vs False are different jit statics), pipelined
     chunks, production-style.

Usage: python scripts/probe_quad_rows.py [reps]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def micro(reps=5, N=5_760_000, T=200_000):
    """Raw shape comparison at example4-like row counts."""
    key = jax.random.PRNGKey(0)
    tab1 = jax.random.randint(key, (T,), 0, 2 ** 30, jnp.int32)
    tab4 = jax.random.randint(key, (T, 4), 0, 2 ** 30, jnp.int32)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    w = jax.random.uniform(key, (4, N))

    @jax.jit
    def four_tap(idx, w):
        out = jnp.zeros((N,), jnp.float32)
        for k in range(4):
            ii = jnp.remainder(idx + k * 7, T)       # 4 distinct gathers
            out = out + w[k] * jnp.take(tab1, ii, mode="clip").astype(
                jnp.float32)
        return out.sum()

    @jax.jit
    def quad(idx, w):
        q = jnp.take(tab4, idx, axis=0, mode="clip")  # (N, 4)
        out = jnp.zeros((N,), jnp.float32)
        for k in range(4):
            out = out + w[k] * q[:, k].astype(jnp.float32)
        return out.sum()

    for f in (four_tap, quad):
        np.asarray(f(idx, w))                        # compile + warm
    walls = {"four": [], "quad": []}
    for _ in range(reps):
        for name, f in (("four", four_tap), ("quad", quad)):
            t0 = time.perf_counter()
            np.asarray(f(idx, w))
            walls[name].append(time.perf_counter() - t0)
    for name, ws in walls.items():
        med = sorted(ws)[len(ws) // 2]
        rows = 4 * N if name == "four" else N
        print(f"micro {name}: {med * 1e3:7.2f} ms  "
              f"({med / rows * 1e9:.2f} ns/row, {rows / 1e6:.1f} M rows)",
              flush=True)
    return (sorted(walls["four"])[reps // 2],
            sorted(walls["quad"])[reps // 2])


def engine(reps=5, chunks=4):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_pallas_record import _bilinear_scene

    from raytracer_tpu.core.compile import compile_scene, derive_max_bounces
    from raytracer_tpu.ops.pallas_record import pallas_record_chunk

    W, H, SPP = 400, 300, 16
    sc = _bilinear_scene()
    sc.add_Camera(look_from=sc.camera.look_from, look_at=sc.camera.look_at,
                  screen_width=W, screen_height=H)
    static, data = compile_scene(sc)
    assert static.pallas_tex_ok and data.tex_atlas_quad is not None
    B = derive_max_bounces(static)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])

    def run(qf, seed0, n):
        outs = []
        for i in range(n):
            seed = jnp.array([seed0 + i, seed0 + 1000 + i, 0], jnp.int32)
            L, _ = pallas_record_chunk(seed, data, cam_vec, static, W, H,
                                       SPP, B, sampler="r2", quad_fetch=qf)
            outs.append(jnp.sum(L))
        return np.asarray(jnp.stack(outs))

    a = run(None, 1, 1)
    b = run(False, 1, 1)
    print(f"engine image-sum quad {a[0]:.6e} vs four {b[0]:.6e} "
          f"(must be bit-identical)", flush=True)
    assert a[0] == b[0]

    walls = {None: [], False: []}
    for rep in range(reps):
        for qf in (None, False):
            t0 = time.perf_counter()
            run(qf, 10 + rep, chunks)
            walls[qf].append((time.perf_counter() - t0) / chunks)
    for qf, ws in walls.items():
        med = sorted(ws)[len(ws) // 2]
        name = "quad" if qf is None else "four"
        print(f"engine {name}: {med * 1e3:7.2f} ms/chunk  "
              f"all {[round(x * 1e3, 1) for x in sorted(ws)]}", flush=True)
    print(f"engine speedup (four/quad): "
          f"{sorted(walls[False])[reps // 2] / sorted(walls[None])[reps // 2]:.3f}x",
          flush=True)


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    f, q = micro(reps)
    print(f"micro speedup (four/quad): {f / q:.2f}x", flush=True)
    engine(reps)
