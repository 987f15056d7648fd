"""Interleaved A/B: record-path chunk-size cap on SINGLE-round scenes.

The 1M-ray record-chunk cap was tuned on example4 (two dependent gather
rounds, ~120 ms/chunk at 1M rays — the relay stalls past ~100 ms
executions).  Single-round scenes (examples 1-3) run ~85 ms/chunk at the
same cap, and the round-4 roofline shows example3 spending ~21% of its
wall in per-chunk dispatch gaps (15 executions).  Fewer, longer chunks
would amortize the gap IF the ~170 ms executions don't hit the stall.

Variants: chunk_spp derived from ray caps {0.5M, 1M, 2M, 4M}, measured
PIPELINED over the full workload (enqueue every chunk, one sync),
interleaved A/B/C/D x REPS in one process.
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
CAPS = (1 << 19, 1 << 20, 1 << 21, 1 << 22)


def probe(mod_name, spp=16):
    import importlib
    mod = importlib.import_module(mod_name)
    Sc = mod.Sc
    static, data = compile_scene_cached(Sc)
    W, H = Sc.camera.screen_width, Sc.camera.screen_height
    B = derive_max_bounces(static)
    sk = derive_split_k(static)
    eff = spp * (1 << sk)
    cam = Sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])

    variants = []
    for cap in CAPS:
        cs = max(1, min(eff, cap // (W * H)))
        cs = max(1 << sk, cs - cs % (1 << sk))
        if cs not in [v[0] for v in variants]:
            variants.append((cs, -(-eff // cs)))
    print(f"\n=== {mod_name}: {W}x{H} eff_spp={eff} B={B} "
          f"variants={variants} (chunk_spp, n_chunks)")

    def run(chunk_spp, n_chunks):
        outs = []
        for i in range(n_chunks):
            seed = jnp.asarray([1000 + i, 77, i * chunk_spp], jnp.int32)
            L, _ = pallas_record_chunk(seed, data, cam_vec, static, W, H,
                                       chunk_spp, B, split_k=sk, sampler="r2")
            outs.append(L.sum())       # tiny reduce: no frame-size D2H
        return float(np.asarray(sum(outs)))

    for v in variants:
        t0 = time.perf_counter()
        run(*v)
        print(f"    warm chunk_spp={v[0]}: {time.perf_counter() - t0:.1f} s "
              f"(incl. compile)", flush=True)
    walls = {v: [] for v in variants}
    for rep in range(REPS):
        for v in variants:
            t0 = time.perf_counter()
            run(*v)
            walls[v].append(time.perf_counter() - t0)
    for v in variants:
        ws = sorted(walls[v])
        med = ws[len(ws) // 2]
        print(f"    chunk_spp={v[0]:3d} x {v[1]:2d} chunks: "
              f"{med * 1e3:7.1f} ms total ({med / v[1] * 1e3:6.1f} ms/chunk) "
              f"reps={['%.0f' % (w * 1e3) for w in ws]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for which in (sys.argv[1:] or ["example3", "example2"]):
        probe(which)
