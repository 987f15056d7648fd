"""Where does the CPU-path example1 deficit go? (VERDICT r3 #4)

PARITY.json measured ours 246 s vs the patched numpy reference's 22.4 s for
example1 400x300 @ 6 spp on this 1-core host.  This script decomposes OUR
wall into attributable parts, all forced-CPU:

  - raygen alone
  - trace() at max_bounces = 1..B (differences = per-bounce cost as the
    live set decays -- ours stays DENSE, the reference compacts with
    np.extract)
  - the uv/texture-fetch share (needs_uv scenes compute uv per object per
    bounce; the env fetch gathers from the 12.6M-texel skybox atlas)
    estimated by rendering the same geometry with solid colors
  - sampler share (r2 lattice vs iid)

Prints a breakdown table for BASELINE.md.
"""
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raytracer_tpu import RenderSettings  # noqa: E402
from raytracer_tpu.core.compile import compile_scene_cached  # noqa: E402


def timed(f, reps=2):
    f()                                    # warm/compile
    ws = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f())
        ws.append(time.perf_counter() - t0)
    return min(ws)


def timed_cold(f):
    """(cold_s incl. XLA:CPU compile, warm_s) — the PARITY wall is cold."""
    t0 = time.perf_counter()
    np.asarray(f())
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(f())
    return cold, time.perf_counter() - t0


def main():
    import importlib
    mod = importlib.import_module("example1")
    sc = mod.Sc
    SPP = 6

    # full render, reference estimator (the PARITY.json configuration)
    sc.settings = RenderSettings(sampler="iid")
    w_cold, w_full = timed_cold(
        lambda: np.asarray(sc.render(samples_per_pixel=SPP, seed=0)))
    print(f"full render COLD (incl. XLA:CPU compile): {w_cold:8.1f} s"
          f"   (the PARITY.json regime)", flush=True)
    print(f"full render WARM (iid, {SPP} spp):        {w_full:8.1f} s",
          flush=True)

    static, data = compile_scene_cached(sc)
    _, _, settings = sc._settings_for_render(False)
    print(f"  max_bounces={settings.max_bounces} split_k={settings.split_k}"
          f" needs_uv={static.needs_uv}")

    from raytracer_tpu.core.camera import generate_rays
    from raytracer_tpu.core.integrator import trace

    W, H = 400, 300
    cam = sc.camera.params()
    key = jax.random.PRNGKey(0)

    gen = jax.jit(lambda k: generate_rays(k, cam, W, H, SPP, sampler="iid"))
    w_gen = timed(lambda: gen(key)[0])
    print(f"raygen alone:                        {w_gen:8.1f} s")

    O, D = gen(key)
    n_re = jnp.broadcast_to(data.scene_n_re, O.shape)
    n_im = jnp.broadcast_to(data.scene_n_im, O.shape)

    base = dict(sampler="iid")
    prev = 0.0
    for b in range(1, settings.max_bounces + 1):
        st = RenderSettings(max_bounces=b, **base)
        f = jax.jit(lambda k, st=st: trace(k, O, D, n_re, n_im, data,
                                           static, st)[0])
        w = timed(lambda: f(key))
        print(f"trace bounces<={b}:                     {w:8.1f} s "
              f"(+{w - prev:.1f} s for bounce {b})")
        prev = w

    # solid-color twin: same geometry/materials, no image textures/env fetch
    from raytracer_tpu import Glossy, Plane, Scene, Sphere, rgb, vec3
    sc2 = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc2.add_Camera(**{k: getattr(sc.camera, k) for k in
                      ("look_from", "look_at", "screen_width",
                       "screen_height")})
    sc2.add_DirectionalLight(Ldir=vec3(0.52, 0.45, -0.5),
                             color=rgb(0.15, 0.15, 0.15))
    gold = Glossy(diff_color=rgb(1.0, 0.572, 0.184),
                  n=vec3(0.15 + 3.58j, 0.4 + 2.37j, 1.54 + 1.91j),
                  roughness=0.0, spec_coeff=0.2, diff_coeff=0.8)
    blu = Glossy(diff_color=rgb(0.0, 0, 0.1),
                 n=vec3(1.3 + 1.91j, 1.3 + 1.91j, 1.4 + 2.91j),
                 roughness=0.2, spec_coeff=0.5, diff_coeff=0.3)
    flo = Glossy(diff_color=rgb(0.4, 0.4, 0.4),
                 n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j),
                 roughness=0.2, spec_coeff=0.3, diff_coeff=0.9)
    sc2.add(Sphere(material=gold, center=vec3(-0.75, 0.1, -3.0), radius=0.6,
                   max_ray_depth=3))
    sc2.add(Sphere(material=blu, center=vec3(1.25, 0.1, -3.0), radius=0.6,
                   max_ray_depth=3))
    sc2.add(Plane(material=flo, center=vec3(0, -0.5, -3.0), width=120.0,
                  height=120.0, u_axis=vec3(1.0, 0, 0),
                  v_axis=vec3(0, 0, -1.0), max_ray_depth=3))
    sc2.settings = RenderSettings(sampler="iid")
    w_solid = timed(lambda: np.asarray(sc2.render(samples_per_pixel=SPP,
                                                  seed=0)), reps=1)
    print(f"solid-color twin (no tex/env/uv):    {w_solid:8.1f} s"
          f"   -> texture/uv/env share ~ {w_full - w_solid:.1f} s")

    # alive-by-bounce (dense-cost vs live-work accounting)
    from raytracer_tpu.core.ray import first_hit, Ray
    ray = Ray(origin=O, dir=D)
    hit = first_hit(ray, sc)
    print("bounce-0 hit fraction:",
          float(np.mean(np.asarray(hit.obj_id) >= 0)))


if __name__ == "__main__":
    main()
