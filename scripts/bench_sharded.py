#!/usr/bin/env python
"""Sharded-path bench on a virtual 8-device CPU mesh (VERDICT r2 item 7).

Prints ONE JSON line with the sharded render's throughput shape so the
first real multi-chip run has a baseline to compare against:

* wall_s_single: one chip's wall for S effective samples/pixel (the same
  per-device work the sharded run gives each device)
* wall_s_sharded: the 8-device mesh's wall for 8*S samples/pixel via
  Scene.render(mesh=...) — each device traces S, one psum reduces
* sharded_vs_8x_single: wall_s_sharded / (8 * wall_s_single).  The 8
  virtual devices SERIALIZE on this one-core host, so perfect scaling is
  1.0 here; the excess over 1.0 is the sharded program's own overhead
  (psum + per-device dispatch + shard_map plumbing).  On real multi-chip
  hardware the devices run concurrently and the target is
  wall_s_sharded ~= wall_s_single * (1 + that overhead).

Runs forced-CPU (the axon sitecustomize would otherwise grab the TPU);
both timings are the SECOND identical render in-process.
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

import numpy as np  # noqa: E402


def main():
    from example_cornellbox import build_cornell

    from raytracer_tpu.parallel.sharded import make_mesh

    W = H = 64
    SPP = 1          # Cornell's diffuse fan x20 -> 20 eff samples/device
    mesh = make_mesh(n_sample_shards=8, n_pixel_shards=1)
    sc = build_cornell(W, H)

    # single chip at the sharded run's PER-DEVICE sample count
    sc.render(samples_per_pixel=SPP, seed=0, return_stats=True)     # warm
    t0 = time.time()
    _, st1 = sc.render(samples_per_pixel=SPP, seed=1, return_stats=True)
    t_single = time.time() - t0

    # 8-device mesh at 8x the samples (each device traces SPP's worth)
    sc.render(samples_per_pixel=8 * SPP, seed=0, mesh=mesh,
              return_stats=True)                                    # warm
    t0 = time.time()
    img, st8 = sc.render(samples_per_pixel=8 * SPP, seed=1, mesh=mesh,
                         return_stats=True)
    np.asarray(img)                                                 # D2H
    t_shard = time.time() - t0

    print(json.dumps({
        "mesh": "8x1 cpu-virtual",
        "frame": f"{W}x{H}",
        "samples_per_device": int(st1["samples"]),
        "rays_traced_sharded": int(st8["rays_traced"]),
        "wall_s_single": round(t_single, 3),
        "wall_s_sharded": round(t_shard, 3),
        "sharded_vs_8x_single": round(t_shard / (8 * t_single), 3),
        "mrays_per_s_total": round(st8["rays_traced"] / t_shard / 1e6, 2),
        "mrays_per_s_per_device": round(
            st8["rays_traced"] / t_shard / 8e6, 2),
    }))


if __name__ == "__main__":
    main()
