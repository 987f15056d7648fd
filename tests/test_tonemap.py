"""Display tone mapping (Scene.render(tonemap=..., exposure=...)).

Operators: "srgb" (the reference pipeline — sRGB EOTF + highlight-preserving
intensity clip, colour_functions.py:4-18), "aces" (Narkowicz filmic fit),
"reinhard" (extended Reinhard).  Exposure scales linear radiance by 2**stops
before the operator.  Defaults are bit-identical to the original pipeline.
"""

import numpy as np
import pytest

from raytracer_tpu import Emissive, Scene, Sphere, rgb, vec3
from raytracer_tpu.utils.colour import (aces_film, reinhard,
                                        srgb_linear_to_srgb,
                                        tonemap_display)


def gradient_scene(W=32, H=24):
    # emitters spanning dim to well past display white exercise the shoulder
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=W, screen_height=H)
    for i, b in enumerate((0.05, 0.4, 1.0, 3.0, 12.0)):
        sc.add(Sphere(material=Emissive(color=rgb(b, 0.8 * b, 0.5 * b)),
                      center=vec3(-1.6 + 0.8 * i, 0, -2), radius=0.3))
    return sc


# -- operator math ----------------------------------------------------------

def test_operators_bounded_and_monotone():
    x = np.linspace(0.0, 50.0, 2048, dtype=np.float32)[:, None].repeat(3, 1)
    for op in (aces_film, reinhard):
        y = np.asarray(op(x))
        assert (y >= 0).all() and (y <= 1).all()
        assert (np.diff(y[:, 0]) >= -1e-6).all()          # monotone
    # reinhard maps its white point to exactly 1
    assert np.allclose(np.asarray(reinhard(np.float32(4.0))), 1.0, atol=1e-6)


def test_tonemap_display_default_matches_reference_pipeline():
    x = np.random.default_rng(0).uniform(0, 2, (64, 3)).astype(np.float32)
    assert np.array_equal(np.asarray(tonemap_display(x)),
                          np.asarray(srgb_linear_to_srgb(x)))


def test_tonemap_display_rejects_unknown():
    with pytest.raises(ValueError, match="tonemap"):
        tonemap_display(np.zeros((2, 3), np.float32), operator="filmic")


# -- render integration -----------------------------------------------------

def test_render_default_unchanged():
    sc = gradient_scene()
    a = np.asarray(sc.render(2, seed=0))
    b = np.asarray(sc.render(2, seed=0, tonemap="srgb", exposure=0.0))
    assert np.array_equal(a, b)


def test_render_aces_compresses_highlights():
    sc = gradient_scene()
    srgb = np.asarray(sc.render(2, seed=0)).astype(np.int32)
    aces = np.asarray(sc.render(2, seed=0, tonemap="aces")).astype(np.int32)
    assert aces.shape == srgb.shape
    # the 12x emitter saturates the sRGB clip (the clip's /(max + 1e-5)
    # lands exactly-white pixels at 254) but stays on the ACES shoulder
    lit = srgb.max(-1) > 0
    sat = srgb.max(-1) >= 254
    assert sat.any()
    assert aces[lit].max() <= 255
    assert (aces[sat].max(-1) <= 255).all()


def test_render_exposure_brightens():
    sc = gradient_scene()
    base = np.asarray(sc.render(2, seed=0, tonemap="reinhard")).astype(int)
    up = np.asarray(sc.render(2, seed=0, tonemap="reinhard",
                              exposure=1.0)).astype(int)
    lit = base.sum(-1) > 0
    # +1 stop never darkens and strictly brightens unsaturated lit pixels
    assert (up[lit] >= base[lit]).all()
    mid = lit & (base.max(-1) > 20) & (base.max(-1) < 200)
    assert mid.any() and (up[mid].astype(int) > base[mid]).any()


def test_render_rejects_unknown_tonemap():
    sc = gradient_scene()
    with pytest.raises(ValueError, match="tonemap"):
        sc.render(1, tonemap="filmic")
