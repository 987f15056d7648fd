"""Interleaved A/B: 2D-tiled record-path pixel order + banded replay.

VERDICT r3 #2's named lever.  Variants per example, measured PIPELINED
(enqueue all chunks, one sync at the end — matching the production loop's
amortized regime, since synchronous per-chunk timing is dominated by relay
dispatch latency; see probe_replay_breakdown.py):

  flat0    — sample-major order, full replay gathers (the r3 baseline,
             recompiled at this source state)
  tiled0   — 2D-tiled pixel order, full gathers (order effect alone)
  tiledG   — tiled order + banded replay with G programs per super-block
             (each (bounce, block) gather wrapped in one lax.cond keyed on
             the kernel's fetch-lane counts)

Reps interleave variants: A B C A B C ... (median per variant).
"""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import raytracer_tpu  # noqa: E402  (persistent compile cache)
from raytracer_tpu.core.compile import (compile_scene_cached,
                                        derive_max_bounces,
                                        derive_split_k)  # noqa: E402
from raytracer_tpu.ops.pallas_record import pallas_record_chunk  # noqa: E402

REPS = 5


def probe(name, mod_name, variants, spp=16):
    import importlib
    mod = importlib.import_module(mod_name)
    Sc = mod.Sc
    static, data = compile_scene_cached(Sc)
    W, H = Sc.camera.screen_width, Sc.camera.screen_height
    B = derive_max_bounces(static)
    sk = derive_split_k(static)
    eff = spp * (1 << sk)
    chunk_spp = max(1, min(eff, (1 << 20) // (W * H)))
    chunk_spp = max(1 << sk, chunk_spp - chunk_spp % (1 << sk))
    n_chunks = -(-eff // chunk_spp)
    cam = Sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    print(f"\n=== {name}: {W}x{H} eff_spp={eff} B={B} chunk={chunk_spp}spp "
          f"x {n_chunks}")

    def run_variant(order_mode, banding):
        outs = []
        for i in range(n_chunks):
            seed = jnp.asarray([1000 + i, 77, i * chunk_spp], jnp.int32)
            L, _ = pallas_record_chunk(
                seed, data, cam_vec, static, W, H, chunk_spp, B,
                split_k=sk, sampler="r2", order_mode=order_mode,
                banding=banding)
            outs.append(L.sum())          # tiny reduce keeps L out of HBM D2H
        return float(np.asarray(sum(outs)))

    # compile + warm each variant
    for (om, bg) in variants:
        t0 = time.perf_counter()
        run_variant(om, bg)
        print(f"    warm {om}/{bg}: {time.perf_counter() - t0:.1f} s "
              f"(incl. compile)", flush=True)
    walls = {v: [] for v in variants}
    for rep in range(REPS):
        for v in variants:
            t0 = time.perf_counter()
            run_variant(*v)
            walls[v].append(time.perf_counter() - t0)
    for v in variants:
        ws = sorted(walls[v])
        med = ws[len(ws) // 2]
        print(f"    {v[0]:6s} band={v[1]:<3d}: {med * 1e3:7.1f} ms total "
              f"({med / n_chunks * 1e3:6.1f} ms/chunk)  "
              f"reps={['%.0f' % (w * 1e3) for w in ws]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    which = sys.argv[1] if len(sys.argv) > 1 else "example4"
    variants = [("flat", 0), ("tiled", 0), ("tiled", 4), ("tiled", 10)]
    probe(which, which, variants)
