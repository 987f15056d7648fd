"""Subprocess entry for test_multihost.py: one rank of a 2-process render.

Each rank provisions 4 virtual CPU devices, joins the coordination service,
renders the same analytic scene over the global 8-device mesh via
render_multihost, and writes its assembled frame to <out>.rank<k>.npy.
Run: python multihost_runner.py <rank> <nproc> <port> <out_prefix>
"""

import os
import sys

rank, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("RAYTRACER_TPU_NO_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from raytracer_tpu.parallel.multihost import (init_distributed,  # noqa: E402
                                              render_multihost)

init_distributed(coordinator_address=f"127.0.0.1:{port}",
                 num_processes=nproc, process_id=rank, local_device_count=4)

import numpy as np  # noqa: E402

from raytracer_tpu import (Diffuse, Emissive, Plane, Scene, Sphere, rgb,  # noqa: E402
                           vec3)

assert len(jax.devices()) == 4 * nproc, jax.devices()

sc = Scene(ambient_color=rgb(0, 0, 0))
sc.add_Camera(look_from=vec3(0, 0, 5), look_at=vec3(0, 0, 0),
              screen_width=16, screen_height=16, field_of_view=30)
sc.add(Sphere(material=Diffuse(diff_color=rgb(0.6, 0.6, 0.6), diffuse_rays=1),
              center=vec3(0, 0, 0), radius=1.0))
sc.add(Plane(material=Emissive(color=rgb(1.0, 0.8, 0.6)),
             center=vec3(0, 0, -4), width=60.0, height=60.0,
             u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))

img = render_multihost(sc, samples_per_pixel=8, seed=0)
np.save(f"{out}.rank{rank}.npy", img)
print(f"rank {rank} done", flush=True)
