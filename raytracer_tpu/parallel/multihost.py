"""Multi-host distributed rendering: one render spanning multiple processes.

The reference's outermost scale axis is a single-host multiprocessing.Pool
(sightpy/scene.py:80-116).  parallel/sharded.py replaces it with a shard_map
over all devices of ONE process; this module extends the same program across
PROCESSES — the multi-host TPU topology (one process per host, devices
connected by ICI/DCN), per SURVEY.md §2.3.

The design keeps the pure map-reduce shape:

* `init_distributed` wires the JAX coordination service (the NCCL-rendezvous
  analogue; on TPU pods the arguments auto-detect and can be omitted).
* Scene tables are compiled per-host (deterministic) and then broadcast from
  process 0 (`multihost_utils.broadcast_one_to_all`) so every host traces
  byte-identical inputs — the reference's deepcopy-pickle "broadcast",
  done once, not once per batch.
* The per-device body and the `psum` over the sample axis are EXACTLY
  parallel/sharded.py's — one program, any number of hosts.
* The final frame is assembled on every host with a tiled process gather
  (`multihost_utils.process_allgather`) — the Pool's imap_unordered+sum,
  as one collective.

Works unmodified for num_processes == 1 (the broadcasts/gathers are no-ops),
so the same entry point serves laptop CPU tests and multi-host pods; the
2-process CPU path is exercised end-to-end by tests/test_multihost.py.
"""

from __future__ import annotations

import jax
import numpy as np

from ..core.integrator import RenderSettings
from ..utils.colour import srgb_linear_to_srgb
from .sharded import build_sharded_render, make_mesh, plan_spp_per_device


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_count=None):
    """Join this process to a multi-process JAX cluster.

    Call once per process before any other jax use, then render with
    `render_multihost`.  On TPU pod slices all arguments are auto-detected
    from the environment and may be omitted; for CPU/testing pass them
    explicitly (coordinator "host:port", total process count, this process's
    rank).  local_device_count forces N virtual CPU devices per process
    (testing) — must be set before jax initializes a backend.
    """
    import os

    if local_device_count is not None:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_device_count}")
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def render_multihost(scene, samples_per_pixel, mesh=None, seed=0,
                     n_pixel_shards=1):
    """Render `scene` across every device of every process in the cluster.

    Every process calls this with the SAME scene and arguments (SPMD); each
    returns the full assembled (H, W, 3) sRGB float array.  The mesh defaults
    to (sample = n_devices / n_pixel_shards, pixel = n_pixel_shards) over the
    GLOBAL device list; lay pixel shards so each host's band stays on its own
    devices when frames are large.
    """
    from jax.experimental import multihost_utils

    from ..core.compile import (compile_scene_cached, derive_max_bounces,
                                derive_split_k)

    mesh = mesh or make_mesh(n_pixel_shards=n_pixel_shards)
    n_sample = mesh.shape["sample"]
    W, H = scene.camera.screen_width, scene.camera.screen_height
    static, data = compile_scene_cached(scene)
    split_k = derive_split_k(static)
    settings = RenderSettings(max_bounces=derive_max_bounces(static),
                              split_k=split_k,
                              sampler=scene.settings.sampler,
                              projection=scene.camera.projection)
    spp_per_device = plan_spp_per_device(samples_per_pixel,
                                         scene._diffuse_fan(), split_k,
                                         n_sample)
    run = build_sharded_render(static, settings, mesh, W, H, spp_per_device)
    # one broadcast pins every host to process 0's bytes (scene compilation
    # is deterministic, but float environments need not be bit-identical)
    key, data, cam = multihost_utils.broadcast_one_to_all(
        (jax.random.PRNGKey(seed), data, scene.camera.params()))
    acc = run(key, data, cam)
    linear = acc / (n_sample * spp_per_device)
    img = srgb_linear_to_srgb(linear).reshape(H, W, 3)
    if jax.process_count() > 1:
        return np.asarray(multihost_utils.process_allgather(img, tiled=True))
    return np.asarray(jax.device_get(img))
