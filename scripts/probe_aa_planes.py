#!/usr/bin/env python
"""Interleaved A/B of the axis-aligned plane fast path (R5).

Cornell's six walls (and every reference scene's floors) have exact
+-unit-axis frames; ObjRecord.aa lets the kernels select components
statically instead of computing three full dot products per plane test —
~22 tile-ops instead of ~48, bit-identical outputs.  Both variants
(aa_planes static) compiled in ONE process, pipelined, production chunk
shape, as probe_eqn_diet.py.

Usage: python scripts/probe_aa_planes.py [reps] [chunks_per_rep]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(reps=5, chunks=8):
    from example_cornellbox import build_cornell

    from raytracer_tpu.core.compile import compile_scene
    from raytracer_tpu.ops.pallas_trace import pallas_trace_chunk

    W = H = 400
    SPP = 26
    sc = build_cornell(W, H)
    static, data = compile_scene(sc)
    assert static.pallas_ok
    n_aa = sum(1 for r in static.obj_records
               if r.kind == "plane" and r.aa is not None)
    print(f"axis-aligned planes detected: {n_aa}", flush=True)
    assert n_aa == 6
    _, _, settings = sc._settings_for_render(False)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])

    def run(aa, seed0, n):
        outs = []
        for i in range(n):
            seed = jnp.array([seed0 + i, seed0 + 1000 + i, 0], jnp.int32)
            L, _ = pallas_trace_chunk(
                seed, data, cam_vec, static, W, H, SPP,
                settings.max_bounces, False, settings.split_k,
                settings.sampler, settings.projection, aa_planes=aa)
            outs.append(jnp.sum(L))
        return np.asarray(jnp.stack(outs))

    a = run(True, 1, 1)
    b = run(False, 1, 1)
    print(f"image-sum aa {a[0]:.6e} vs generic {b[0]:.6e} "
          f"(bit-identical expected)", flush=True)
    assert a[0] == b[0], (a[0], b[0])

    walls = {True: [], False: []}
    for rep in range(reps):
        for aa in (True, False):
            t0 = time.perf_counter()
            run(aa, 10 + rep, chunks)
            walls[aa].append((time.perf_counter() - t0) / chunks)
    for aa, ws in walls.items():
        ws = sorted(ws)
        med = ws[len(ws) // 2]
        rays = SPP * W * H
        print(f"aa_planes={aa}: {med * 1e3:.2f} ms/chunk "
              f"({rays / med / 1e6:.0f} Mrays/s raw) "
              f"all {[round(w * 1e3, 2) for w in ws]}", flush=True)
    print(f"speedup (generic/aa): "
          f"{sorted(walls[False])[reps // 2] / sorted(walls[True])[reps // 2]:.3f}x",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
