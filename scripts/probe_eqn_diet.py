#!/usr/bin/env python
"""Interleaved A/B of the R5 eqn diet in the solid mega-kernel.

The kernel is VPU-issue-bound (BASELINE.md roofline), so traced equations
are the wall.  The R5 diet (pallas_trace.py, `diet` static, default True):

  - Fresnel reflectances as |num|^2/|den|^2 — skips two complex divisions
    per channel-bounce (estimator-exact algebraic identity);
  - Beer-Lambert exponent constant chain folded in python (5 -> 3 tile ops
    per channel);
  - FINAL-bounce dead-continuation skip: the last bounce's sampled
    directions / throughput / ray-state updates never reach L — the
    diffuse and refractive blocks (continuation-only) are skipped
    outright, glossy keeps only its direct lighting, normals are skipped
    when nothing left needs them;
  - unconditional bit-identical trims (trig hoists, plane/tri/disc |tt|).

Eqn effect on bench Cornell (scripts/analyze_kernel_eqns.py): see STATUS
R5.  This probe measures the hardware effect exactly as
probe_merge_groups.py did for R4.11: both variants compiled in ONE process
(diet is a jit static), timed interleaved and pipelined at the production
bench chunk shape — Cornell 400x400, 26-spp chunks, R2 sampler.

Usage: python scripts/probe_eqn_diet.py [reps] [chunks_per_rep]
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

    def run(diet, seed0, n):
        outs = []
        for i in range(n):
            seed = jnp.array([seed0 + i, seed0 + 1000 + i, 0], jnp.int32)
            L, _ = pallas_trace_chunk(
                seed, data, cam_vec, static, W, H, SPP,
                settings.max_bounces, False, settings.split_k,
                settings.sampler, settings.projection, diet=diet)
            outs.append(jnp.sum(L))
        return np.asarray(jnp.stack(outs))

    # estimator sanity: same seed, both variants, matching image sums
    a = run(True, 1, 1)
    b = run(False, 1, 1)
    rel = abs(float(a[0] - b[0])) / max(abs(float(b[0])), 1e-9)
    print(f"image-sum rel diff diet vs legacy: {rel:.2e} "
          f"(rounding-level expected)", flush=True)
    assert rel < 1e-4, rel

    for d in (True, False):
        t0 = time.time()
        run(d, 2, 1)
        print(f"warm diet={d}: {time.time() - t0:.1f}s", flush=True)

    walls = {True: [], False: []}
    for rep in range(reps):
        for d in (True, False):
            t0 = time.perf_counter()
            run(d, 10 + rep, chunks)
            walls[d].append((time.perf_counter() - t0) / chunks)
    for d, ws in walls.items():
        ws = sorted(ws)
        med = ws[len(ws) // 2]
        rays = SPP * W * H
        print(f"diet={d}: {med * 1e3:.2f} ms/chunk "
              f"({rays / med / 1e6:.0f} Mrays/s raw) "
              f"all {[round(w * 1e3, 2) for w in ws]}", flush=True)
    a = sorted(walls[True])[reps // 2]
    b = sorted(walls[False])[reps // 2]
    print(f"speedup (legacy/diet): {b / a:.3f}x", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
