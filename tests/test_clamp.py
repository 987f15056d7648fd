"""Firefly clamping (Scene.render(clamp=...)).

A per-sample linear-radiance ceiling applied before accumulation: a rare
huge-weight sample (a "firefly") cannot blow out its pixel. Biased where it
engages (standard production trade); a no-op when set above every sample.
"""

import numpy as np
import pytest

from raytracer_tpu import Diffuse, Emissive, Scene, Sphere, rgb, vec3


def firefly_scene(W=24, H=18):
    # a tiny, very bright emitter importance-sampled from a diffuse floor:
    # low-probability cap samples produce huge-weight fireflies at low spp
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0.5, 2), look_at=vec3(0, 0, -1),
                  screen_width=W, screen_height=H)
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.8, 0.8, 0.8),
                                   diffuse_rays=1),
                  center=vec3(0, -20.3, -2), radius=20.0))
    sc.add(Sphere(material=Emissive(color=rgb(300.0, 300.0, 300.0)),
                  center=vec3(1.5, 2.0, -2), radius=0.08, shadow=False),
           importance_sampled=True)
    return sc


def test_clamp_bounds_samples():
    sc = firefly_scene()
    raw = sc.render(8, seed=3, output="linear")
    cl = sc.render(8, seed=3, output="linear", clamp=2.0)
    # the clamped image can never exceed the ceiling
    assert float(cl.max()) <= 2.0 + 1e-6
    # and never exceeds the raw image anywhere (minimum is monotone)
    assert (cl <= raw + 1e-6).all()


def test_clamp_above_everything_is_identity():
    sc = firefly_scene()
    raw = sc.render(4, seed=5, output="linear")
    cl = sc.render(4, seed=5, output="linear", clamp=1e9)
    assert np.array_equal(raw, cl)


def test_clamp_retune_no_structural_change():
    # clamp is traced: two values produce valid, DIFFERENT images
    sc = firefly_scene()
    a = sc.render(4, seed=1, output="linear", clamp=1.0)
    b = sc.render(4, seed=1, output="linear", clamp=0.5)
    assert float(b.max()) <= 0.5 + 1e-6
    assert (b <= a + 1e-6).all()
    # the traced value is consumed: some SAMPLE lies in (0.5, 1.0], so the
    # two ceilings must produce different pixel means somewhere
    assert (a != b).any()


def test_clamp_works_with_variance():
    sc = firefly_scene()
    lin, var = sc.render(4, seed=2, output="linear", with_variance=True,
                         clamp=2.0)
    assert float(lin.max()) <= 2.0 + 1e-6
    assert np.isfinite(var).all() and (var >= 0).all()


def test_clamp_checkpoint_mismatch_restarts(tmp_path):
    # resuming under a DIFFERENT clamp would mix two estimators in one
    # accumulator; the checkpoint records the clamp and mismatches restart
    sc = firefly_scene()
    ck = str(tmp_path / "c.npz")
    sc.render(8, seed=3, batch_size=2, checkpoint_path=ck, checkpoint_every=1)
    from raytracer_tpu.core.scene import _load_checkpoint
    n_pix = 24 * 18
    assert _load_checkpoint(ck, n_pix, 2, 3, clamp=None) is not None
    assert _load_checkpoint(ck, n_pix, 2, 3, clamp=2.0) is None
    # and a clamped render's checkpoint resumes only under the same clamp
    ck2 = str(tmp_path / "c2.npz")
    a = sc.render(8, seed=3, batch_size=2, checkpoint_path=ck2,
                  checkpoint_every=1, clamp=2.0, output="linear")
    b = sc.render(8, seed=3, batch_size=2, checkpoint_path=ck2,
                  checkpoint_every=1, clamp=2.0, output="linear")
    assert np.array_equal(a, b)
    assert _load_checkpoint(ck2, n_pix, 2, 3, clamp=None) is None
