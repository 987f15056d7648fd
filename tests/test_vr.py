"""ODS stereo 360 rendering (raytracer_tpu/vr.py).

The reference camera is pinhole-only (sightpy/camera.py:8-49); ODS is a
beyond-reference capability.  These tests pin the projection convention
(equirect mapping shared with Camera(projection="equirect")), the eye
geometry (zero ipd -> bit-identical eyes; near objects get opposite-sign
horizontal disparity, distant objects almost none) and the output layouts.
"""

import numpy as np
import pytest

from raytracer_tpu import Camera, Emissive, Scene, Sphere, rgb, vec3
from raytracer_tpu.vr import render_ods


def _scene(near=None, W=64, H=32):
    sc = Scene(ambient_color=(0, 0, 0))
    sc.camera = Camera(look_from=vec3(0, 0, 0), look_at=vec3(1, 0, 0),
                       screen_width=W, screen_height=H,
                       projection="equirect")
    sc.add(Sphere(material=Emissive(color=rgb(0, 1, 0)),
                  center=vec3(0, 0, 40), radius=2.0))     # distant, +z
    if near is not None:
        sc.add(Sphere(material=Emissive(color=rgb(1, 0, 0)),
                      center=vec3(near, 0, 0), radius=0.5))  # near, +x
    return sc


def _centroid_col(img, ch):
    ys, xs = np.where(img[:, :, ch] > 0.2)
    assert xs.size, "marker not visible"
    return xs.mean()


def test_zero_ipd_eyes_identical():
    left, right = render_ods(_scene(near=2.0), samples_per_pixel=2,
                             ipd=0.0, layout="separate", output="linear",
                             seed=3)
    assert np.array_equal(left, right)
    assert left.shape == (32, 64, 3)


def test_parallax_sign_and_magnitude():
    """Near +x marker: the left eye (offset toward -z) sees it at a HIGHER
    azimuth/column than the right eye; the distant +z marker shows an order
    of magnitude less disparity."""
    sc = _scene(near=2.0)
    left, right = render_ods(sc, samples_per_pixel=4, ipd=0.5,
                             layout="separate", output="linear", seed=0)
    W = left.shape[1]
    d_near = _centroid_col(left, 0) - _centroid_col(right, 0)
    d_far = _centroid_col(left, 1) - _centroid_col(right, 1)
    # ipd/2 = 0.25 at distance 2 -> azimuth shift atan(0.125) each eye,
    # ~2.3 columns of 64 total disparity
    assert d_near > 1.0, f"near disparity {d_near}"
    assert abs(d_far) < 0.5 * d_near, f"far {d_far} vs near {d_near}"
    # both eyes keep the near marker near the image center column
    assert abs(_centroid_col(left, 0) - W / 2) < W / 8


def test_scene_method_delegates():
    sc = _scene()
    a = sc.render_ods(samples_per_pixel=1, seed=4, layout="separate",
                      output="linear")
    b = render_ods(sc, samples_per_pixel=1, seed=4, layout="separate",
                   output="linear")
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_layouts_and_outputs():
    sc = _scene()
    tb = render_ods(sc, samples_per_pixel=1, layout="top-bottom",
                    output="np")
    assert tb.shape == (64, 64, 3) and tb.dtype == np.uint8
    sbs = render_ods(sc, samples_per_pixel=1, layout="side-by-side",
                     output="np")
    assert sbs.shape == (32, 128, 3)
    img = render_ods(sc, samples_per_pixel=1, width=32, height=16)
    assert img.size == (32, 32)          # PIL (W, H), two eyes stacked
    l, r = render_ods(sc, samples_per_pixel=1, layout="separate")
    assert l.size == (64, 32) and r.size == (64, 32)


def test_anaglyph():
    """Red channel is the left eye, green/blue the right eye."""
    sc = _scene(near=2.0)
    left, right = render_ods(sc, samples_per_pixel=2, ipd=0.5, seed=1,
                             layout="separate", output="np")
    ana = render_ods(sc, samples_per_pixel=2, ipd=0.5, seed=1,
                     layout="anaglyph", output="np")
    assert ana.shape == left.shape
    assert np.array_equal(ana[..., 0], left[..., 0])
    assert np.array_equal(ana[..., 1:], right[..., 1:])
    with pytest.raises(ValueError, match="anaglyph"):
        render_ods(sc, layout="anaglyph", output="linear")


def test_width_only_default_aspect():
    out = render_ods(_scene(), samples_per_pixel=1, width=40, output="np")
    assert out.shape == (40, 40, 3)      # per-eye 40x20, stacked


def test_sharded_matches_single_chip():
    """Sample-sharded ODS over the 8-device mesh agrees with the
    single-chip path statistically, and keeps the zero-ipd eye equality."""
    from raytracer_tpu.parallel.sharded import make_mesh

    sc = _scene(near=2.0)
    mesh = make_mesh()
    single = render_ods(sc, samples_per_pixel=64, ipd=0.5, seed=0,
                        layout="separate", output="linear")
    sharded = render_ods(sc, samples_per_pixel=64, ipd=0.5, seed=0,
                         layout="separate", output="linear", mesh=mesh)
    for a, b in zip(single, sharded):
        assert a.shape == b.shape
        # the estimators share the lattice-free iid jitter but draw
        # different streams: only sphere-edge pixels vary.  Means and
        # marker positions must agree; interiors (zero-variance pixels,
        # the vast majority) must match exactly.
        assert abs(a.mean() - b.mean()) < 0.05 * max(a.mean(), 1e-6)
        exact = np.isclose(a, b, atol=1e-6).mean()
        assert exact > 0.9, f"only {exact:.2%} of pixels identical"
    for ch in (0, 1):
        assert abs(_centroid_col(single[0], ch)
                   - _centroid_col(sharded[0], ch)) < 1.5
    l, r = render_ods(sc, samples_per_pixel=8, ipd=0.0, seed=2,
                      layout="separate", output="linear", mesh=mesh)
    assert np.array_equal(l, r)


def test_clamp():
    """clamp caps per-sample radiance: a huge emitter's contribution drops;
    clamp above the max radiance is bit-identical to off."""
    sc = _scene(near=2.0)
    sc.add(Sphere(material=Emissive(color=rgb(500, 500, 500)),
                  center=vec3(0, 0, -3), radius=0.3))
    base = render_ods(sc, samples_per_pixel=2, seed=0, layout="separate",
                      output="linear")[0]
    clamped = render_ods(sc, samples_per_pixel=2, seed=0, layout="separate",
                         output="linear", clamp=1.0)[0]
    assert clamped.max() <= 1.0 + 1e-6
    assert base.max() > 100.0
    loose = render_ods(sc, samples_per_pixel=2, seed=0, layout="separate",
                       output="linear", clamp=1e6)[0]
    assert np.array_equal(base, loose)


def test_validation():
    sc = _scene()
    with pytest.raises(ValueError, match="layout"):
        render_ods(sc, layout="interleaved")
    with pytest.raises(ValueError, match="output"):
        render_ods(sc, output="exr")
    with pytest.raises(ValueError, match="samples_per_pixel"):
        render_ods(sc, samples_per_pixel=0)
    with pytest.raises(ValueError, match="camera"):
        render_ods(Scene())


def test_scene_settings_honored():
    """render_ods derives settings from scene.settings like
    Scene._settings_for_render (ADVICE r2): a user-set max_bounces / split_k
    changes the ODS output; split_k > 0 renders with full branch-pattern
    enumeration (spp fans by 2^split_k internally, mean stays normalized)."""
    from dataclasses import replace

    from raytracer_tpu import Glossy, Refractive

    sc = _scene(near=2.0)
    # a mirror-ish glossy floor + glass sphere: extra bounces change pixels
    sc.add(Sphere(material=Refractive(n=vec3(1.5 + 0j, 1.5 + 0j, 1.5 + 0j)),
                  center=vec3(2, 0, 2), radius=0.8))
    sc.add(Sphere(material=Glossy(diff_color=rgb(0.2, 0.2, 0.2),
                                  roughness=0.1, spec_coeff=2.0,
                                  diff_coeff=0.3, n=vec3(1.5, 1.5, 1.5)),
                  center=vec3(-2, 0, 0), radius=1.0))
    deep = render_ods(sc, samples_per_pixel=4, seed=0, layout="separate",
                      output="linear")[0]
    sc.settings = replace(sc.settings, max_bounces=1)
    shallow = render_ods(sc, samples_per_pixel=4, seed=0, layout="separate",
                         output="linear")[0]
    assert not np.array_equal(deep, shallow)
    assert np.isfinite(shallow).all()
    # explicit split_k: enumerated Fresnel branches, mean stays bounded
    sc.settings = replace(sc.settings, max_bounces=4, split_k=2)
    split = render_ods(sc, samples_per_pixel=2, seed=0, layout="separate",
                       output="linear")[0]
    assert np.isfinite(split).all()
    assert split.max() <= max(2.0, deep.max() * 2.0)
