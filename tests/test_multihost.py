"""Multi-host distributed rendering (parallel/multihost.py).

Spawns a REAL 2-process JAX cluster (4 virtual CPU devices per process,
gloo collectives over localhost) — the closest single-machine analogue of a
2-host TPU slice — and checks that both ranks assemble the identical full
frame, and that it matches the same mesh shape rendered in one process.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_RUNNER = os.path.join(os.path.dirname(__file__), "multihost_runner.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_agrees(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [sys.executable, _RUNNER, str(rank), "2", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in (0, 1)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    img0 = np.load(out + ".rank0.npy")
    img1 = np.load(out + ".rank1.npy")
    # every rank assembles the same full frame
    assert img0.shape == (16, 16, 3)
    assert np.array_equal(img0, img1)

    # single-process rendering of the same scene on the same 8-device mesh
    # (tests/conftest.py provisions 8 virtual devices in THIS process)
    from raytracer_tpu import (Diffuse, Emissive, Plane, Scene, Sphere, rgb,
                               vec3)
    from raytracer_tpu.parallel.multihost import render_multihost

    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 5), look_at=vec3(0, 0, 0),
                  screen_width=16, screen_height=16, field_of_view=30)
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.6, 0.6, 0.6),
                                   diffuse_rays=1),
                  center=vec3(0, 0, 0), radius=1.0))
    sc.add(Plane(material=Emissive(color=rgb(1.0, 0.8, 0.6)),
                 center=vec3(0, 0, -4), width=60.0, height=60.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    ref = render_multihost(sc, samples_per_pixel=8, seed=0)
    # same global mesh shape, same fold_in(key, axis_index) RNG streams ->
    # the distributed frame must match the single-process one to f32 noise
    assert np.allclose(ref, img0, atol=1e-5)
