"""Adaptive sampling: render-to-noise-target (core/scene.py target_noise).

The estimator treats per-chunk pixel means as i.i.d. observations and stops
when the 99th-percentile display-space standard error reaches the target —
a render-to-quality mode the reference lacks entirely (its spp is guesswork).
"""

import numpy as np

from raytracer_tpu import (Diffuse, Emissive, Plane, Scene, Sphere, rgb, vec3)


def _noisy_scene():
    # diffuse sphere lit by an emissive panel: genuine MC variance
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 5), look_at=vec3(0, 0, 0),
                  screen_width=24, screen_height=24, field_of_view=30)
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.7, 0.7, 0.7),
                                   diffuse_rays=1),
                  center=vec3(0, 0, 0), radius=1.0))
    sc.add(Plane(material=Emissive(color=rgb(4, 4, 4)),
                 center=vec3(0, 3, 0), width=4.0, height=4.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, 1)))
    return sc


def test_adaptive_stops_early_on_loose_target():
    sc = _noisy_scene()
    _, stats = sc.render(samples_per_pixel=256, batch_size=4, seed=1,
                         return_stats=True, target_noise=0.2,
                         noise_check_every=2)
    assert stats["samples"] < 256              # stopped before the cap
    assert stats["noise_q99"] <= 0.2


def test_adaptive_exhausts_budget_on_tight_target():
    sc = _noisy_scene()
    _, stats = sc.render(samples_per_pixel=16, batch_size=4, seed=1,
                         return_stats=True, target_noise=1e-5,
                         noise_check_every=2)
    assert stats["samples"] == 16              # budget cap hit
    assert stats["noise_q99"] > 1e-5


def test_adaptive_noise_decreases_with_samples():
    sc = _noisy_scene()
    _, s_few = sc.render(samples_per_pixel=8, batch_size=4, seed=1,
                         return_stats=True, target_noise=1e-6,
                         noise_check_every=2)
    _, s_many = sc.render(samples_per_pixel=64, batch_size=4, seed=1,
                          return_stats=True, target_noise=1e-6,
                          noise_check_every=16)
    assert s_many["noise_q99"] < s_few["noise_q99"]


def test_adaptive_image_matches_fixed_spp():
    # adaptive with an unreachable target renders the identical image to a
    # plain fixed-spp render of the same budget (same chunks, same RNG)
    sc = _noisy_scene()
    a = np.asarray(sc.render(samples_per_pixel=8, batch_size=4, seed=7))
    b = np.asarray(sc.render(samples_per_pixel=8, batch_size=4, seed=7,
                             target_noise=1e-9))
    assert np.array_equal(a, b)


def test_adaptive_checkpoint_resume(tmp_path):
    # an interrupted adaptive render resumes with its second-moment state
    sc = _noisy_scene()
    ck = str(tmp_path / "adapt")
    img_full, st_full = sc.render(samples_per_pixel=16, batch_size=4, seed=3,
                                  return_stats=True, target_noise=1e-6,
                                  checkpoint_path=ck, checkpoint_every=1)
    # rerun from the final checkpoint: all chunks already done
    img_resume, st_resume = sc.render(samples_per_pixel=16, batch_size=4,
                                      seed=3, return_stats=True,
                                      target_noise=1e-6, checkpoint_path=ck,
                                      checkpoint_every=1)
    assert np.array_equal(np.asarray(img_full), np.asarray(img_resume))
    assert st_resume["samples"] == st_full["samples"]
