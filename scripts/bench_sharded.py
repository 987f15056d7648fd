#!/usr/bin/env python
"""Sharded-path bench on a virtual 8-device CPU mesh (VERDICT r3 #5).

Production-shaped workload — Cornell box 256x256 through the FULL
`Scene.render(mesh=...)` chunk loop (4 chunks per device, checkpointable
accumulation, one psum per chunk) — replacing the round-3 64x64 toy block.

Prints ONE JSON line:

* wall_s_single: one device's wall for the sharded run's per-device work
  (same chunking) — the serialization baseline.
* wall_s_sharded: the 8-device mesh's wall via Scene.render(mesh=...).
  The 8 virtual devices SERIALIZE on this host, so perfect scaling is
  sharded == 8 x single; `sharded_vs_8x_single` is the measured ratio and
  the excess over 1.0 is the sharded program's own overhead (psum +
  shard_map plumbing + chunk-loop dispatch).
* psum_s / psum_fraction: measured cost of the per-chunk psum collectives
  alone — a jitted shard_map running JUST the chunk loop's reductions
  (one (H*W, 3) f32 psum over the sample axis per chunk, n_chunks times),
  timed on the same mesh.
* chunk_loop_overhead: wall_s_sharded / (n_chunks x one warm chunk
  execution) — what the python-side loop + accumulator updates add on top
  of the chunk executions themselves.
* spread: IQR / median over the sharded reps — the <= 5% stability gate
  (min/max over-penalizes the serialized 1-core host's scheduler noise;
  spread_minmax reports (max - min) / median alongside).

Runs forced-CPU (the axon sitecustomize would otherwise grab the TPU);
every timing is a warm re-run (compiles excluded), D2H forced.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

W = H = 256
SPP = 8            # x20 diffuse fan -> 160 eff samples = 20/device
BATCH = 5          # per-device chunk spp -> 4 chunks through the loop
REPS = 5


def _timed(f, reps=REPS):
    ws = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f())
        ws.append(time.perf_counter() - t0)
    ws.sort()
    return ws[len(ws) // 2], ws


def scale_curve():
    """Overhead-vs-device-count curve (weak scaling on the serialized host).

    For n in {2, 4, 8} sample shards: render Cornell through the full
    `Scene.render(mesh=...)` chunk loop at spp chosen so per-device work is
    CONSTANT (n * 20/8 eff samples per device nominal -> spp = n).  The 8
    virtual devices serialize on this 1-core host, so ideal weak scaling is
    wall_n == n x wall_single(same per-device work); `overhead_n` is the
    measured ratio — the sharded program's own cost (psum + shard_map
    plumbing + chunk-loop dispatch) as a function of device count.  This is
    the scaling SHAPE a real pod run would inherit (its psum additionally
    rides ICI, measured separately as psum_s in the main block).
    """
    from example_cornellbox import build_cornell

    from raytracer_tpu.parallel.sharded import make_mesh

    sc = build_cornell(W, H)

    # single-device baseline at the matched per-device work (spp=1 x fan 20)
    render_1 = lambda seed: sc.render(samples_per_pixel=1, seed=seed,
                                      batch_size=BATCH, output="linear")
    np.asarray(render_1(0))
    t_single, _ = _timed(lambda: render_1(1))

    curve = []
    for n in (2, 4, 8):
        mesh = make_mesh(n_sample_shards=n, n_pixel_shards=1,
                         devices=jax.devices()[:n])
        render_n = lambda seed: sc.render(samples_per_pixel=n, seed=seed,
                                          mesh=mesh, batch_size=BATCH,
                                          output="linear")
        np.asarray(render_n(0))                                    # warm
        t_n, _ = _timed(lambda: render_n(1), reps=3)
        curve.append({
            "n_devices": n,
            "spp": n,
            "wall_s": round(t_n, 3),
            "overhead_n": round(t_n / (n * t_single), 3),
        })
    print(json.dumps({
        "mode": "scale_curve",
        "frame": f"{W}x{H}",
        "wall_s_single": round(t_single, 3),
        "curve": curve,
    }))


def main():
    from example_cornellbox import build_cornell

    from raytracer_tpu.parallel.sharded import make_mesh

    mesh = make_mesh(n_sample_shards=8, n_pixel_shards=1)
    sc = build_cornell(W, H)

    # ---- sharded: the production chunk loop over the mesh -----------------
    render_sh = lambda seed: sc.render(samples_per_pixel=SPP, seed=seed,
                                       mesh=mesh, batch_size=BATCH,
                                       output="linear")
    np.asarray(render_sh(0))                                       # warm
    t_shard, reps_sh = _timed(lambda: render_sh(1))

    # ---- single device at the same per-device work -------------------------
    # eff/device = SPP*20/8 = 20 samples; drive the same chunking (batch 5
    # -> 4 chunks) through the single-chip loop.  spp=1 x fan 20 = 20 eff.
    render_1 = lambda seed: sc.render(samples_per_pixel=1, seed=seed,
                                      batch_size=BATCH, output="linear")
    np.asarray(render_1(0))                                        # warm
    t_single, _ = _timed(lambda: render_1(1))

    # ---- psum-only cost on the same mesh -----------------------------------
    n_chunks = 4
    band = jnp.ones((H * W, 3), jnp.float32)

    @jax.jit
    def psums_only(x):
        def per_device(x):
            for _ in range(n_chunks):
                x = jax.lax.psum(x, "sample")
            return x
        return jax.shard_map(per_device, mesh=mesh, in_specs=P(),
                             out_specs=P(), check_vma=False)(x)

    np.asarray(psums_only(band))                                   # warm
    t_psum, _ = _timed(lambda: psums_only(band))

    # ---- one warm chunk execution (for the loop-overhead ratio) ------------
    from raytracer_tpu.core.compile import compile_scene_cached
    from raytracer_tpu.parallel.sharded import build_sharded_chunk

    static, data = compile_scene_cached(sc)
    _, _, settings = sc._settings_for_render(False)
    run = build_sharded_chunk(static, settings, mesh, W, H, BATCH, False)
    cam = sc.camera.params()
    key = jax.random.PRNGKey(7)
    args = (key, data, cam, jnp.float32(np.inf), jnp.int32(0), jnp.int32(3))
    np.asarray(run(*args)[0])                                      # warm
    t_chunk, _ = _timed(lambda: run(*args)[0])

    # IQR/median spread (the <= 5% stability gate; min/max over-penalizes
    # the serialized 1-core host's scheduler noise)
    n = len(reps_sh)
    spread = ((reps_sh[min(n - 1, (3 * n) // 4)] - reps_sh[max(0, n // 4)])
              / max(reps_sh[n // 2], 1e-9))
    spread_minmax = (reps_sh[-1] - reps_sh[0]) / max(reps_sh[n // 2], 1e-9)
    print(json.dumps({
        "mesh": "8x1 cpu-virtual",
        "frame": f"{W}x{H}",
        "spp": SPP,
        "eff_samples_per_device": SPP * 20 // 8,
        "n_chunks": n_chunks,
        "wall_s_single": round(t_single, 3),
        "wall_s_sharded": round(t_shard, 3),
        "sharded_vs_8x_single": round(t_shard / (8 * t_single), 3),
        "sharded_reps_s": [round(w, 3) for w in reps_sh],
        "spread": round(spread, 4),
        "spread_minmax": round(spread_minmax, 4),
        "psum_s": round(t_psum, 4),
        "psum_fraction": round(t_psum / t_shard, 4),
        "chunk_exec_s": round(t_chunk, 3),
        "chunk_loop_overhead": round(t_shard / (n_chunks * t_chunk), 3),
    }))


if __name__ == "__main__":
    if "--scale-curve" in sys.argv:
        scale_curve()
    else:
        main()
