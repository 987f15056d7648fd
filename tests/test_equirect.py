"""Equirect (360x180 panorama) camera + environment baking.

The reference camera is pinhole/thin-lens only (sightpy/camera.py:8-49).
Here `Camera(projection="equirect")` maps pixel (u, v) to azimuth/elevation
(core/camera.py generate_rays), and `Scene.render_environment` bakes a
scene into an equirect map in the env-fetch storage convention, so the
result plugs straight into `add_Background(spherical=True, linear=True)`.
The bake test below is the convention oracle: a pinhole render of the baked
background must reproduce a pinhole render of the original scene.
"""

import numpy as np
import pytest

from raytracer_tpu import Camera, Emissive, Scene, Sphere, rgb, vec3
from raytracer_tpu.core.compile import compile_scene
from raytracer_tpu.core.scene import _use_pallas


def _panorama_scene(W=64, H=32):
    sc = Scene(ambient_color=(0, 0, 0))
    sc.camera = Camera(look_from=vec3(0, 0, 0), look_at=vec3(1, 0, 0),
                       screen_width=W, screen_height=H,
                       projection="equirect")
    # distinct emissive markers along +x, +z, -x, +y
    sc.add(Sphere(material=Emissive(color=rgb(1, 0, 0)),
                  center=vec3(5, 0, 0), radius=1.0))
    sc.add(Sphere(material=Emissive(color=rgb(0, 1, 0)),
                  center=vec3(0, 0, 5), radius=1.0))
    sc.add(Sphere(material=Emissive(color=rgb(0, 0, 1)),
                  center=vec3(-5, 0, 0), radius=1.0))
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 0)),
                  center=vec3(0, 5, 0), radius=1.0))
    return sc


def test_equirect_directions():
    """Markers land at the azimuth/elevation the mapping predicts: +x at the
    image center (look_at heading), +z at u=0.75, -x at the wrap seam,
    +y (zenith) smeared across the top row."""
    W, H = 64, 32
    img = np.asarray(_panorama_scene(W, H).render(samples_per_pixel=4,
                                                  seed=0), float)

    def centroid(ch):
        # equator band only: the yellow zenith marker shares channels with
        # the red/green equator markers
        band = img[H // 4: 3 * H // 4, :, ch]
        ys, xs = np.where(band > 100)
        return xs, ys + H // 4

    xs, ys = centroid(0)                     # red: +x -> center
    assert abs(xs.mean() - W / 2) < 2 and abs(ys.mean() - H / 2) < 2
    xs, ys = centroid(1)                     # green: +z -> u = 0.75
    assert abs(xs.mean() - 0.75 * W) < 2 and abs(ys.mean() - H / 2) < 2
    # blue: -x -> wrap seam (columns near 0 and W-1)
    xs, ys = centroid(2)
    xs = np.minimum(xs, W - 1 - xs)          # fold the seam
    assert xs.mean() < 3 and abs(ys.mean() - H / 2) < 2
    # yellow (red+green rows near the top): zenith
    top = img[: H // 4, :, 0] + img[: H // 4, :, 1]
    assert (top > 200).any()


def test_equirect_routes_to_wavefront():
    sc = _panorama_scene()
    static, _ = compile_scene(sc)
    _, _, settings = sc._settings_for_render(False)
    assert settings.projection == "equirect"
    assert _use_pallas(static, settings) == (None, False)


def test_camera_projection_validation():
    with pytest.raises(ValueError, match="projection"):
        Camera(look_from=vec3(0, 0, 0), look_at=vec3(1, 0, 0),
               projection="cylinder")


def test_bake_environment_round_trip():
    """The convention oracle: bake scene A into an env map, display it as
    scene B's ONLY content through a same-center pinhole camera — B must
    reproduce A's pinhole render (up to texel quantization at edges)."""
    sc_a = _panorama_scene()
    env = sc_a.render_environment(width=256, height=128,
                                  samples_per_pixel=4, seed=1)
    assert env.shape == (128, 256, 3) and np.isfinite(env).all()
    # the original equirect camera must be restored after the bake
    assert sc_a.camera.projection == "equirect"

    def pinhole(scene, look_at):
        scene.camera = Camera(look_from=vec3(0, 0, 0), look_at=look_at,
                              screen_width=48, screen_height=36,
                              field_of_view=50)
        return np.asarray(scene.render(samples_per_pixel=4, seed=2,
                                       output="linear"))

    sc_b = Scene(ambient_color=(0, 0, 0))
    sc_b.add_Background(env, spherical=True, linear=True)
    for look_at in (vec3(1, 0, 0), vec3(0, 0, 1), vec3(-1, 0.6, 0.3)):
        a = pinhole(_panorama_scene(), look_at)
        b = pinhole(sc_b, look_at)
        # interiors match exactly (emissive color vs fetched texel); edge
        # pixels differ by texel quantization -> compare robustly
        assert abs(a.mean() - b.mean()) < 0.015, look_at
        assert np.percentile(np.abs(a - b), 90) < 0.05, look_at


def test_equirect_sharded_matches_single():
    from raytracer_tpu.parallel.sharded import make_mesh, render_sharded

    sc = _panorama_scene(32, 16)
    a = np.asarray(render_sharded(sc, samples_per_pixel=8, mesh=make_mesh(8)),
                   float)
    b = np.asarray(sc.render(samples_per_pixel=8, seed=0), float) / 255.0
    assert a.shape == b.shape == (16, 32, 3)
    assert abs(a.mean() - b.mean()) < 2.0 / 255.0
