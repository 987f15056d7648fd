"""Large-frame row-band chunking (core/scene.py).

When one spp-chunk of a frame exceeds the per-chunk ray cap (e.g. 4K frames),
the jnp wavefront splits each chunk into horizontal row bands that reuse the
same compiled executable (row0 is a traced argument).  These tests shrink the
cap to force banding on tiny frames and check the assembled image.
"""

import numpy as np

from raytracer_tpu import (Diffuse, Emissive, Glossy, Plane, Scene, Sphere,
                          rgb, vec3)
from raytracer_tpu.core import scene as scene_mod
from raytracer_tpu.utils.colour import srgb_linear_to_srgb
import jax.numpy as jnp


def _force_bands(monkeypatch, max_rays):
    monkeypatch.setattr(scene_mod, "MAX_RAYS_PER_CHUNK", max_rays)


def test_banded_emissive_exact(monkeypatch):
    # constant emissive wall: banding must not perturb any pixel
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=16, screen_height=10)
    sc.add(Plane(material=Emissive(color=rgb(0.3, 0.5, 0.7)),
                 center=vec3(0, 0, -2), width=100.0, height=100.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    _force_bands(monkeypatch, 64)   # band_rows = 64 // 16 = 4 -> bands 4,4,2
    img = np.asarray(sc.render(samples_per_pixel=2), np.float32) / 255.0
    expected = np.asarray(srgb_linear_to_srgb(jnp.asarray([[0.3, 0.5, 0.7]])))[0]
    assert np.allclose(img.reshape(-1, 3), expected, atol=0.005)


def test_banded_matches_unbanded_statistically(monkeypatch):
    # MC scene: banded and unbanded renders are draws of the same estimator
    def build():
        sc = Scene(ambient_color=rgb(0, 0, 0))
        sc.add_Camera(look_from=vec3(0, 0, 5), look_at=vec3(0, 0, 0),
                      screen_width=16, screen_height=12, field_of_view=30)
        sc.add(Sphere(material=Diffuse(diff_color=rgb(0.7, 0.7, 0.7),
                                       diffuse_rays=1),
                      center=vec3(0, 0, 0), radius=1.0))
        sc.add(Plane(material=Emissive(color=rgb(2, 2, 2)),
                     center=vec3(0, 0, -4), width=60.0, height=60.0,
                     u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
        return sc

    plain = np.asarray(build().render(samples_per_pixel=64, seed=5),
                       np.float32) / 255.0
    _force_bands(monkeypatch, 96)   # band_rows = 96 // 16 = 6 -> bands 6,6
    banded = np.asarray(build().render(samples_per_pixel=64, seed=5),
                        np.float32) / 255.0
    assert abs(plain.mean() - banded.mean()) < 0.01
    assert np.abs(plain - banded).mean() < 0.06   # independent MC draws


def test_banded_stats_and_adaptive(monkeypatch):
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 5), look_at=vec3(0, 0, 0),
                  screen_width=16, screen_height=10, field_of_view=30)
    sc.add(Sphere(material=Glossy(diff_color=rgb(0.5, 0.5, 0.5),
                                  roughness=0.0, spec_coeff=0.0,
                                  diff_coeff=1.0, n=vec3(1.5, 1.5, 1.5)),
                  center=vec3(0, 0, 0), radius=1.0))
    _force_bands(monkeypatch, 64)
    _, stats = sc.render(samples_per_pixel=8, seed=2, return_stats=True)
    # every band of every chunk contributes its ray count
    assert stats["rays_traced"] >= 16 * 10 * 8
    # adaptive + banding compose: the zero-variance scene converges instantly
    _, st2 = sc.render(samples_per_pixel=8, seed=2, return_stats=True,
                       target_noise=1e-6, noise_check_every=2)
    assert st2["noise_q99"] is not None
    assert st2["samples"] <= stats["samples"]
