"""HDR-sun image-based lighting with environment importance sampling.

A small, very bright sun in an equirect sky lights a diffuse-and-glossy
still life.  With plain cosine sampling a first-bounce ray hits the sun with
probability ~1e-4 — the image is a storm of fireflies at any practical spp.
`add_Background(..., importance_sampled=True)` builds alias tables over the
map's luminance at compile time and the Diffuse mixture sends half its
continuation rays straight at the sun, pdf-compensated (core/rng.py
mixed_diffuse_sample) — same estimator mean, orders less variance.

The reference can only importance-sample scene primitives
(sightpy/utils/random.py:76-151); its background is a plain texture fetch.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403


def sun_sky(H=256, W=512, sun_uv=(0.7, 0.72), sun_r=0.012, sun=3000.0):
    """Equirect linear-radiance sky: soft gradient + tiny brutal sun disk.

    Authored in DISPLAY space (u in [0,1) around, v=0 nadir .. v=1 zenith),
    then row-permuted into the renderer's storage convention: the fetch maps
    display row iv = floor(v*H) to storage row (-iv) mod H
    (materials/shade.py fetch_texture).
    """
    img = np.zeros((H, W, 3), np.float32)          # display rows: iv = v*H
    horizon = np.array([0.35, 0.38, 0.45], np.float32)
    zenith = np.array([0.05, 0.10, 0.25], np.float32)
    uu = (np.arange(W) + 0.5) / W
    vv = (np.arange(H) + 0.5) / H                  # display v per row
    up = np.clip((vv - 0.5) * 2.0, 0.0, 1.0)       # 0 at horizon, 1 at zenith
    img[:] = horizon + (zenith - horizon) * up[:, None, None]
    du = np.minimum(np.abs(uu[None, :] - sun_uv[0]),
                    1.0 - np.abs(uu[None, :] - sun_uv[0]))
    dv = np.abs(vv[:, None] - sun_uv[1])
    disk = du ** 2 + dv ** 2 <= sun_r ** 2
    img[disk] = np.array([sun, sun * 0.92, sun * 0.80], np.float32)
    store = np.empty_like(img)
    store[(-np.arange(H)) % H] = img               # display row iv -> storage
    return store


def build_scene(width=400, height=300, importance_sampled=True):
    sc = Scene(ambient_color=rgb(0.0, 0.0, 0.0))
    sc.add_Camera(look_from=vec3(0, 0.8, 3.2), look_at=vec3(0, 0.1, 0),
                  screen_width=width, screen_height=height, field_of_view=35)
    white = Diffuse(diff_color=rgb(0.75, 0.75, 0.75), diffuse_rays=1)
    red = Diffuse(diff_color=rgb(0.75, 0.25, 0.2), diffuse_rays=1)
    chrome = Glossy(diff_color=rgb(0.5, 0.5, 0.55),
                    n=vec3(1.5 + 2.0j, 1.5 + 2.0j, 1.4 + 2.2j),
                    roughness=0.05, spec_coeff=0.6, diff_coeff=0.4)
    sc.add(Plane(material=white, center=vec3(0, -0.5, 0), width=40, height=40,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Sphere(material=red, center=vec3(-0.9, 0.05, 0.2), radius=0.55))
    sc.add(Sphere(material=chrome, center=vec3(0.7, 0.1, -0.4), radius=0.6))
    # linear=True: the array IS unbounded linear radiance — no EOTF, no
    # clip (an sRGB round-trip would crush the 3000x sun to ~1.0)
    sc.add_Background(sun_sky(), spherical=True, linear=True,
                      importance_sampled=importance_sampled)
    return sc


Sc = build_scene()

if __name__ == "__main__":
    img = Sc.render(samples_per_pixel=64, progress_bar=True)
    img.save("EXAMPLE_ENV_IS.png")
