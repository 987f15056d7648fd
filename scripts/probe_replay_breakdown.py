"""Where do examples 1-3 (record path) spend their wall?

VERDICT r4 #1's in-kernel fetch is a measured dead end
(scripts/probe_vmem_gather.py), so the 2x lever must come from the
record/replay structure.  This probe decomposes one chunk of each example
into:

  record   — the Pallas record kernel alone (_record_call, own jit)
  chunk    — the production record+replay program (pallas_record_chunk)
  replay   — chunk - record (the jnp gather/decode/product pass)
  e2e      — Sc.render wall at the bench spp (16), warm

plus the scene's static facts (max_bounces, split_k, ray count) so the
gather-element count B*N is explicit.

Timings follow CLAUDE.md: second run in-process, np.asarray to force D2H,
interleaved reps, median of 5.
"""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import raytracer_tpu  # noqa: E402  (enables the persistent compile cache)
from raytracer_tpu.core.compile import (compile_scene_cached,
                                        derive_max_bounces,
                                        derive_split_k)  # noqa: E402
from raytracer_tpu.ops import pallas_record  # noqa: E402


def timed(f, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def probe(name, mod_name, spp=16):
    import importlib
    mod = importlib.import_module(mod_name)
    Sc = mod.Sc
    static, data = compile_scene_cached(Sc)
    W, H = Sc.camera.screen_width, Sc.camera.screen_height
    B = derive_max_bounces(static)
    sk = derive_split_k(static)
    eff = spp * (1 << sk)
    n = eff * W * H
    print(f"\n=== {name}: {W}x{H} spp={spp} split_k={sk} -> eff_spp={eff} "
          f"B={B}  N/chunk<=1M")
    # production chunking caps record chunks at 1M rays; reproduce one chunk
    chunk_spp = max(1, min(eff, (1 << 20) // (W * H)))
    n_chunk = chunk_spp * W * H
    print(f"    chunk: {chunk_spp} spp = {n_chunk} rays, "
          f"record elements B*N = {B * n_chunk / 1e6:.2f} M")

    cam = Sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    seed = jnp.asarray([1234, 77, 0], jnp.int32)

    rec_only = jax.jit(
        lambda s: pallas_record._record_call(
            s, data, cam_vec, static, W, H, chunk_spp, B,
            split_k=sk, sampler="r2"))
    # pallas_record_chunk is itself jitted — call it directly so this hits
    # the SAME persistent-cache entry as the production render path
    full = lambda s: pallas_record.pallas_record_chunk(
        s, data, cam_vec, static, W, H, chunk_spp, B,
        split_k=sk, sampler="r2")

    # warm both (compile), then interleave
    np.asarray(rec_only(seed)[2])
    jax.tree_util.tree_map(np.asarray, full(seed))
    t_rec, _ = timed(lambda: rec_only(seed)[2])
    t_full, _ = timed(lambda: full(seed))
    n_chunks = -(-n // n_chunk)
    print(f"    record kernel : {t_rec * 1e3:8.1f} ms/chunk")
    print(f"    full chunk    : {t_full * 1e3:8.1f} ms/chunk "
          f"(replay+decode ~= {(t_full - t_rec) * 1e3:.1f} ms)")
    print(f"    x {n_chunks} chunks -> {t_full * n_chunks:.3f} s expected")
    t_e2e, ts = timed(lambda: Sc.render(samples_per_pixel=spp), reps=3)
    print(f"    e2e render    : {t_e2e:8.3f} s  (reps {['%.3f' % t for t in ts]})")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for nm, m in [("example1", "example1"), ("example2", "example2"),
                  ("example3", "example3"), ("example4", "example4")]:
        probe(nm, m)
