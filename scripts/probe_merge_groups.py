#!/usr/bin/env python
"""Interleaved A/B of merged-group shading in the solid mega-kernel (R4.11).

The roofline pinned the solid kernel as VPU-issue-bound, so equation count
is the wall.  Merging same-material-KIND shading groups into one unrolled
block (per-lane parameter selection instead of one duplicated block per
material slot) removes ~24% of the bench Cornell kernel's equations
(scripts/analyze_kernel_eqns.py: 14,534 -> 11,012 traced eqns; the kernel-
inline share nearly halves).  This probe measures the hardware effect:
both kernel variants compiled in ONE process (merge_groups is a jit static),
timed interleaved and pipelined (enqueue all chunk executions, one D2H
sync) at the production bench chunk shape — Cornell 400x400, 26-spp chunks,
6 bounces, R2 sampler.

Usage: python scripts/probe_merge_groups.py [reps] [chunks_per_rep]
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
    SPP = 26                      # the bench render's production chunk spp
    sc = build_cornell(W, H)
    static, data = compile_scene(sc)
    assert static.pallas_ok
    _, _, settings = sc._settings_for_render(False)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])

    def run(merge, seed0, n):
        """Enqueue n chunk executions, reduce each to one image-sum scalar
        (keeps D2H tiny), sync once."""
        outs = []
        for i in range(n):
            seed = jnp.array([seed0 + i, seed0 + 1000 + i, 0], jnp.int32)
            L, _ = pallas_trace_chunk(
                seed, data, cam_vec, static, W, H, SPP,
                settings.max_bounces, False, settings.split_k,
                settings.sampler, settings.projection, merge_groups=merge)
            outs.append(jnp.sum(L))
        return np.asarray(jnp.stack(outs))

    # warm both compiles (minutes through the relay on first run)
    for m in (True, False):
        t0 = time.time()
        run(m, 1, 1)
        print(f"warm merge={m}: {time.time() - t0:.1f}s", flush=True)

    walls = {True: [], False: []}
    for rep in range(reps):
        for m in (True, False):
            t0 = time.perf_counter()
            run(m, 10 + rep, chunks)
            walls[m].append((time.perf_counter() - t0) / chunks)
    for m, ws in walls.items():
        ws = sorted(ws)
        med = ws[len(ws) // 2]
        rays = SPP * W * H
        print(f"merge={m}: {med * 1e3:.2f} ms/chunk "
              f"({rays / med / 1e6:.0f} Mrays/s raw) "
              f"all {[round(w * 1e3, 2) for w in ws]}", flush=True)
    a = sorted(walls[True])[reps // 2]
    b = sorted(walls[False])[reps // 2]
    print(f"speedup (unmerged/merged): {b / a:.3f}x", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
