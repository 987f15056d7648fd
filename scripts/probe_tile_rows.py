#!/usr/bin/env python
"""Interleaved A/B/C: mega-kernel TILE_ROWS sweep on the bench Cornell chunk.

TILE_ROWS fixes the rays-per-program tile (TILE_ROWS x 128).  Bigger tiles
amortize per-program overhead but raise VMEM pressure (the kernel carries
~30 f32 tile planes live); smaller tiles give the pipeliner more programs.
Each variant gets its OWN jit instance (the module constant is read at trace
time, so reusing the cached pallas_trace_chunk would silently time the first
variant three times).

Usage: probe_tile_rows.py [spp]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax
import jax.numpy as jnp


def main(spp=128):
    from example_cornellbox import build_cornell
    from raytracer_tpu.core.compile import compile_scene, derive_max_bounces
    from raytracer_tpu.ops import pallas_trace as pt

    W = H = 400
    sc = build_cornell(W, H)
    static, data = compile_scene(sc)
    assert static.pallas_ok
    max_b = derive_max_bounces(static)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    seed = jnp.asarray(3, jnp.int32)
    n = spp * W * H
    print(f"Cornell {W}x{H} spp={spp} max_bounces={max_b} rays/chunk={n}",
          flush=True)

    variants = []
    for rows in (64, 128, 256):
        pt.TILE_ROWS = rows
        fn = jax.jit(pt.pallas_trace_chunk.__wrapped__,
                     static_argnames=("static", "width", "height", "spp",
                                      "max_bounces", "interpret", "split_k"))

        def run(fn=fn, rows=rows):
            pt.TILE_ROWS = rows      # traced once; harmless after compile
            L, cnt = fn(seed, data, cam_vec, static, W, H, spp, max_b)
            np.asarray(L[:1])        # force D2H (relay returns early)
            return cnt
        variants.append((rows, run))
    pt.TILE_ROWS = 128

    for rows, run in variants:       # compile + warm
        t0 = time.time()
        run()
        print(f"rows={rows}: compile+warm {time.time()-t0:.1f}s", flush=True)

    walls = {rows: [] for rows, _ in variants}
    for _ in range(7):
        for rows, run in variants:
            t0 = time.time()
            run()
            walls[rows].append(time.time() - t0)
    for rows, _ in variants:
        med = float(np.median(walls[rows]))
        print(f"TILE_ROWS={rows:4d}: {med*1e3:7.1f} ms/chunk "
              f"({n * max_b / med / 1e9:5.2f} G ray-bounces/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
