"""Motion blur: a glossy ball streaking over a checkered floor.

`render_motion_blur` integrates the image over an open shutter: the shutter
interval is stratified into slices, each slice renders the scene as mutated
by the same `update_scene(scene, t)` callback the animation API uses
(reference sightpy/animation.py:6-31 — the reference itself can only render
instants).  Motion is DATA on the TPU (traced tables): all slices reuse ONE
compiled executable, slices render device-parallel over the frame mesh, and
the R2 lattice continues across slices so time is one extra stratified
dimension of the sampler.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403
from raytracer_tpu import render_motion_blur  # noqa: E402


def checker(n=512, sq=64):
    yy, xx = np.mgrid[0:n, 0:n]
    c = ((yy // sq + xx // sq) % 2).astype(np.float32)
    img = np.stack([0.25 + 0.55 * c] * 3, -1)
    img[..., 2] *= 0.9
    return img


def build_scene(width=400, height=300):
    sc = Scene(ambient_color=rgb(0.12, 0.12, 0.14))
    sc.add_Camera(look_from=vec3(0, 0.6, 2.6), look_at=vec3(0, 0.0, -0.5),
                  screen_width=width, screen_height=height, field_of_view=32)
    sc.add_DirectionalLight(Ldir=vec3(0.4, 0.7, 0.6), color=rgb(1.0, 0.95, 0.9))
    floor = Glossy(diff_color=image(checker(), repeat=2.0),
                   n=vec3(1.2 + 0.1j, 1.2 + 0.1j, 1.2 + 0.1j),
                   roughness=0.4, spec_coeff=0.2, diff_coeff=0.9)
    sc.add(Plane(material=floor, center=vec3(0, -0.4, -1), width=12, height=12,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    ball = Glossy(diff_color=rgb(0.85, 0.25, 0.2),
                  n=vec3(1.4 + 0.3j, 1.4 + 0.3j, 1.3 + 0.3j),
                  roughness=0.15, spec_coeff=0.5, diff_coeff=0.7)
    sc.add(Sphere(material=ball, center=vec3(-0.9, 0.05, -0.8), radius=0.45))
    # a static reference ball to show the blur is per-object, not a filter
    still = Glossy(diff_color=rgb(0.25, 0.45, 0.8),
                   n=vec3(1.3 + 0.2j, 1.3 + 0.2j, 1.3 + 0.2j),
                   roughness=0.2, spec_coeff=0.4, diff_coeff=0.8)
    sc.add(Sphere(material=still, center=vec3(0.9, -0.05, -1.4), radius=0.35))
    sc.add_Background(procedural_sky())
    return sc


def fly(scene, t):
    # the red ball crosses ~a fifth of the frame during the shutter, with a
    # slight arc (ballistic drop)
    scene.scene_primitives[1].center = np.asarray(
        [-0.9 + 0.55 * t, 0.05 + 0.2 * t - 0.25 * t * t, -0.8], np.float32)


Sc = build_scene()

if __name__ == "__main__":
    img = render_motion_blur(Sc, samples_per_pixel=64, update_scene=fly,
                             slices=32)
    img.save("EXAMPLE_MOTION_BLUR.png")
