"""SpotLight: cone spotlight with smooth angular falloff (lights.SpotLight).

Beyond the reference — sightpy has point/directional lights only
(lights.py:25-52).  The cone factor is 1 inside the inner half-angle and
smoothsteps to 0 at the outer; the radial falloff matches PointLight's
1/d² ×100 convention, so a cone that covers the whole scene degenerates to
a PointLight exactly.
"""

import numpy as np
import pytest

from raytracer_tpu import (Glossy, Scene, SpotLight, Sphere, Plane, rgb,
                           vec3)
from raytracer_tpu.core.compile import compile_scene


def wall_scene(W=96, H=96, light=None):
    # a matte wall at z=-3 facing the camera; one light at the origin
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 0.001), look_at=vec3(0, 0, -1),
                  screen_width=W, screen_height=H, field_of_view=90)
    sc.add(Plane(material=Glossy(diff_color=rgb(1, 1, 1), n=vec3(1.5, 1.5, 1.5),
                                 roughness=0.0, diff_coeff=1.0,
                                 spec_coeff=0.0),
                 center=vec3(0, 0, -3), width=12.0, height=12.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    if light is not None:
        sc.Light_list.append(light)
    return sc


def render_lum(sc):
    return np.asarray(sc.render(2, seed=0, output="linear")).sum(-1)


def test_cone_radius_matches_angle():
    sc = wall_scene()
    sc.add_SpotLight(pos=vec3(0, 0, 0), direction=vec3(0, 0, -1),
                     color=rgb(1, 1, 1), angle=30.0, inner_angle=22.5)
    lum = render_lum(sc)
    H, W = lum.shape
    ys, xs = np.nonzero(lum > 1e-4)
    assert len(xs) > 50
    # film half-width at the wall = tan(45°)*3 = 3 world units -> W/2 px;
    # outer cone radius = 3*tan(30°) world = tan(30°) * (W/2) px
    r_px = np.hypot(xs - (W - 1) / 2, ys - (H - 1) / 2).max()
    expected = np.tan(np.radians(30.0)) * (W / 2)
    assert abs(r_px - expected) < 3.5
    # center (inside the inner angle) is at full strength vs the rim
    c = lum[H // 2, W // 2]
    assert c > 0 and lum[ys[0], xs[0]] <= c + 1e-6


def test_cone_falloff_monotone_radially():
    sc = wall_scene()
    sc.add_SpotLight(pos=vec3(0, 0, 0), direction=vec3(0, 0, -1),
                     color=rgb(1, 1, 1), angle=40.0, inner_angle=10.0)
    lum = render_lum(sc)
    H, W = lum.shape
    row = lum[H // 2, W // 2:]
    # averaged over small windows to wash out AA jitter: must decrease
    w = 4
    means = [row[i:i + w].mean() for i in range(0, 40, w)]
    assert all(a >= b - 1e-5 for a, b in zip(means, means[1:]))
    assert means[0] > 10 * max(means[-1], 1e-9)


def test_wide_spot_equals_point_light():
    from raytracer_tpu.lights import PointLight, SpotLight as SL

    a = wall_scene(light=PointLight(pos=vec3(0, 0, 0), color=rgb(1, .8, .6)))
    b = wall_scene(light=SL(pos=vec3(0, 0, 0), direction=vec3(0, 0, -1),
                            color=rgb(1, .8, .6), angle=89.0,
                            inner_angle=88.0))
    ia = np.asarray(a.render(2, seed=0, output="linear"))
    ib = np.asarray(b.render(2, seed=0, output="linear"))
    assert ia.max() > 0.01
    np.testing.assert_allclose(ia, ib, atol=1e-6)


def test_spot_casts_shadows():
    sc = wall_scene()
    sc.add_SpotLight(pos=vec3(0, 0, 0), direction=vec3(0, 0, -1),
                     color=rgb(1, 1, 1), angle=35.0)
    sc.add(Sphere(material=Glossy(diff_color=rgb(0, 0, 0), n=vec3(1.5, 1.5, 1.5),
                                  roughness=0.0, diff_coeff=0.0,
                                  spec_coeff=0.0),
                  center=vec3(0.5, 0, -1.5), radius=0.15))
    lum = render_lum(sc)
    H, W = lum.shape
    # the occluder sits right of axis between light and wall: its shadow
    # darkens the wall there while the axis point stays lit
    cx = W // 2 + int(round((0.5 / 1.5 * 3) / 6 * W))   # projected center
    assert lum[H // 2, cx] < 0.05 * lum[H // 2, W // 2]


def test_spot_routes_through_kernel():
    # round 3: spot lights shade in the kernels' unrolled light loop
    # (ops/pallas_trace.py), they no longer force the jnp wavefront
    sc = wall_scene()
    sc.add_SpotLight(pos=vec3(0, 0, 0), direction=vec3(0, 0, -1),
                     color=rgb(1, 1, 1), angle=30.0)
    static, _ = compile_scene(sc)
    assert static.n_spot_lights == 1
    assert static.pallas_ok or static.pallas_tex_ok


def test_spot_mutation_invalidates_compile_cache():
    sc = wall_scene()
    sc.add_SpotLight(pos=vec3(0, 0, 0), direction=vec3(0, 0, -1),
                     color=rgb(1, 1, 1), angle=25.0)
    a = render_lum(sc)
    # aim the same light elsewhere: the content fingerprint must change
    from raytracer_tpu.lights import SpotLight as SL
    sc.Light_list[0] = SL(pos=vec3(0, 0, 0), direction=vec3(0.6, 0, -0.8),
                          color=rgb(1, 1, 1), angle=25.0)
    b = render_lum(sc)
    assert not np.array_equal(a, b)
    xs_a = np.nonzero(a.max(0) > 1e-4)[0]
    xs_b = np.nonzero(b.max(0) > 1e-4)[0]
    assert xs_b.mean() > xs_a.mean() + 10     # the disc moved right


def test_spot_validation():
    with pytest.raises(ValueError, match="angle"):
        SpotLight(pos=(0, 0, 0), direction=(0, 0, -1), color=(1, 1, 1),
                  angle=0.0)
    with pytest.raises(ValueError, match="inner_angle"):
        SpotLight(pos=(0, 0, 0), direction=(0, 0, -1), color=(1, 1, 1),
                  angle=20.0, inner_angle=30.0)
