"""Disc and Cylinder primitives — beyond the reference's
sphere/plane/box/triangle palette (sightpy/geometry/).  Analytic-distance
oracles for the intersectors, attr/uv contracts, shadows, routing, and the
declarative-scene spelling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu import (Cylinder, Disc, Emissive, Glossy, Scene, rgb,
                           vec3, first_hit, Ray, scene_from_dict)
from raytracer_tpu.core.compile import compile_scene
from raytracer_tpu.geometry.intersect import (intersect_cylinders,
                                              intersect_discs)
from raytracer_tpu.utils.constants import FARAWAY, UPDOWN, UPWARDS


def _rays(*od_pairs):
    O = jnp.asarray([o for o, _ in od_pairs], jnp.float32)
    D = jnp.asarray([d for _, d in od_pairs], jnp.float32)
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    return O, D


def disc_tables(center, normal, r_out, r_in=0.0):
    c = jnp.asarray([center], jnp.float32)
    n = jnp.asarray([normal], jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return c, n, jnp.asarray([r_out], jnp.float32), jnp.asarray([r_in], jnp.float32)


def cyl_tables(center, axis, radius, height, capped=True):
    cy = Cylinder(center=vec3(*center), material=None, radius=radius,
                  height=height, axis=vec3(*axis), capped=capped)
    f = lambda x: jnp.asarray([x], jnp.float32)
    return (f(cy.center), f(cy.axis), f(cy.u_axis), f(cy.v_axis),
            f(cy.radius), f(cy.height / 2), f(1.0 if capped else 0.0))


# -- disc intersector --------------------------------------------------------

def test_disc_analytic_distances():
    tabs = disc_tables((0, 0, -5), (0, 0, 1), r_out=1.0, r_in=0.3)
    O, D = _rays(((0, 0.6, 0), (0, 0, -1)),     # hits the annulus band
                 ((0, 0, 0), (0, 0, -1)),       # through the hole -> miss
                 ((0, 1.5, 0), (0, 0, -1)),     # outside the rim -> miss
                 ((0, 0.6, -10), (0, 0, 1)))    # from behind
    t, o = intersect_discs(O, D, *tabs)
    np.testing.assert_allclose(t[0, 0], 5.0, rtol=1e-5)
    assert t[0, 1] == FARAWAY and t[0, 2] == FARAWAY
    np.testing.assert_allclose(t[0, 3], 5.0, rtol=1e-5)
    assert o[0, 0] == UPWARDS       # facing the +z normal
    assert o[0, 3] == UPDOWN        # hit from behind


def test_disc_tilted_distance():
    # 45-degree tilted disc: ray along -z from origin hits the plane
    # z = -(5 - y)... solve analytically via the plane equation
    n = np.array([0.0, 1.0, 1.0]) / np.sqrt(2)
    tabs = disc_tables((0, 0, -5), tuple(n), r_out=2.0)
    O, D = _rays(((0, 0.5, 0), (0, 0, -1)))
    t, _ = intersect_discs(O, D, *tabs)
    # plane: n . (p - c) = 0 with p = (0, 0.5, -t): 0.5 - t + 5 = 0
    np.testing.assert_allclose(t[0, 0], 5.5, rtol=1e-5)


# -- cylinder intersector ----------------------------------------------------

def test_cylinder_side_and_cap_distances():
    tabs = cyl_tables((0, 0, -5), (0, 1, 0), radius=0.5, height=2.0)
    O, D = _rays(((0, 0, 0), (0, 0, -1)),       # side hit: t = 5 - r
                 ((0, 5, -5), (0, -1, 0)),      # top cap: t = 5 - h/2
                 ((0, 0, -5), (0, 0, 1)),       # from inside: exit at wall
                 ((2, 0, 0), (0, 0, -1)))       # misses
    t, o = intersect_cylinders(O, D, *tabs)
    np.testing.assert_allclose(t[0, 0], 4.5, rtol=1e-5)
    np.testing.assert_allclose(t[0, 1], 4.0, rtol=1e-5)
    np.testing.assert_allclose(t[0, 2], 0.5, rtol=1e-4)
    assert t[0, 3] == FARAWAY
    assert o[0, 0] == UPWARDS and o[0, 1] == UPWARDS
    assert o[0, 2] == UPDOWN        # exiting from inside


def test_cylinder_uncapped_is_a_tube():
    capped = cyl_tables((0, 0, -5), (0, 1, 0), radius=0.5, height=2.0)
    open_ = cyl_tables((0, 0, -5), (0, 1, 0), radius=0.5, height=2.0,
                       capped=False)
    O, D = _rays(((0, 5, -5), (0, -1, 0)))      # straight down the axis
    t_c, _ = intersect_cylinders(O, D, *capped)
    t_o, _ = intersect_cylinders(O, D, *open_)
    np.testing.assert_allclose(t_c[0, 0], 4.0, rtol=1e-5)
    assert t_o[0, 0] == FARAWAY                 # passes through the tube


def test_cylinder_oblique_axis():
    # cylinder lying along +x: a ray down the y axis hits the side at
    # distance (5 - r)
    tabs = cyl_tables((0, -5, 0), (1, 0, 0), radius=0.75, height=4.0)
    O, D = _rays(((0, 0, 0), (0, -1, 0)))
    t, _ = intersect_cylinders(O, D, *tabs)
    np.testing.assert_allclose(t[0, 0], 4.25, rtol=1e-5)


# -- attrs via first_hit -----------------------------------------------------

def _scene_with(prim):
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(prim)
    return sc


def _hit_normal(sc, origin, direction):
    O = np.asarray([origin], np.float32)
    D = np.asarray([direction], np.float32)
    D = D / np.linalg.norm(D, axis=-1, keepdims=True)
    h = first_hit(Ray(O, D), sc)
    return np.asarray(h.normal)[0], h


def test_cylinder_normals_classify_cap_vs_side():
    mat = Emissive(color=rgb(1, 1, 1))
    sc = _scene_with(Cylinder(material=mat, center=vec3(0, 0, -5),
                              radius=0.5, height=2.0))
    n_side, _ = _hit_normal(sc, (0, 0, 0), (0, 0, -1))
    np.testing.assert_allclose(n_side, [0, 0, 1], atol=1e-5)
    n_cap, _ = _hit_normal(sc, (0.2, 5, -5), (0, -1, 0))
    np.testing.assert_allclose(n_cap, [0, 1, 0], atol=1e-5)


def test_disc_normal_and_uv_center():
    mat = Emissive(color=rgb(1, 1, 1))
    sc = _scene_with(Disc(material=mat, center=vec3(0, 0, -5), radius=1.0,
                          normal=vec3(0, 0, 1)))
    n, h = _hit_normal(sc, (0, 0, 0), (0, 0, -1))
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-6)
    uv = np.asarray(h.uv)[0]
    np.testing.assert_allclose(uv, [0.5, 0.5], atol=1e-6)   # center


def test_cylinder_uv_contract():
    mat = Emissive(color=rgb(1, 1, 1))
    cy = Cylinder(material=mat, center=vec3(0, 0, -5), radius=0.5,
                  height=2.0)
    sc = _scene_with(cy)
    # mid-height side hit: v = 0.5; u = azimuth of the hit around the axis
    _, h = _hit_normal(sc, (0, 0, 0), (0, 0, -1))
    uv = np.asarray(h.uv)[0]
    assert abs(uv[1] - 0.5) < 1e-5
    assert 0.0 <= uv[0] <= 1.0


def test_disc_rotation_moves_normal():
    mat = Emissive(color=rgb(1, 1, 1))
    d = Disc(material=mat, center=vec3(0, 0, -5), radius=1.0,
             normal=vec3(0, 0, 1))
    d.rotate(90, vec3(1, 0, 0))
    np.testing.assert_allclose(np.asarray(d.normal), [0, -1, 0], atol=1e-6)
    # frame stays orthonormal
    M = np.stack([d.u_axis, d.v_axis, d.normal])
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-6)


# -- rendering integration ---------------------------------------------------

def test_render_shadows_and_routing():
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 2.5, 2.5), look_at=vec3(0, 0, -2),
                  screen_width=48, screen_height=36)
    sc.add_DirectionalLight(Ldir=vec3(0.7, 0.7, 0), color=rgb(0.3, 0.3, 0.3))
    from raytracer_tpu import Plane
    floor = Glossy(diff_color=rgb(0.9, 0.9, 0.9), n=vec3(1.5, 1.5, 1.5),
                   roughness=0.0, diff_coeff=1.0, spec_coeff=0.0)
    sc.add(Plane(material=floor, center=vec3(0, -0.5, -2), width=10,
                 height=10, u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Cylinder(material=floor, center=vec3(0, 0.3, -2), radius=0.4,
                    height=0.6))
    static, _ = compile_scene(sc)
    assert static.n_cylinders == 1
    # round 3: disc/cylinder intersectors live in the kernels too
    assert static.pallas_ok or static.pallas_tex_ok
    # shade two floor points directly: one whose path to the (+x, up)
    # light crosses the cylinder (shadowed), one clear of it (lit); both
    # probe rays drop vertically well outside the cylinder's footprint
    from raytracer_tpu import get_raycolor

    O = np.asarray([[-0.8, 1.5, -2.0], [2.0, 1.5, -2.0]], np.float32)
    D = np.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], np.float32)
    L = np.asarray(get_raycolor(Ray(O, D), sc))
    assert L[0].sum() < 0.25 * L[1].sum()
    # and the full frame renders
    img = np.asarray(sc.render(2, seed=0))
    assert img.shape == (36, 48, 3)


def test_scene_io_spelling():
    cfg = {
        "camera": {"look_from": [0, 0, 1], "look_at": [0, 0, -1],
                   "width": 16, "height": 12},
        "objects": [
            {"type": "disc", "center": [-0.5, 0, -3], "radius": 0.8,
             "inner_radius": 0.2, "normal": [0, 0, 1],
             "material": {"type": "emissive", "color": [1, 1, 1]}},
            {"type": "cylinder", "center": [0.8, 0, -3], "radius": 0.3,
             "height": 1.0, "axis": [0, 1, 0], "capped": False,
             "material": {"type": "emissive", "color": [1, 0.5, 0.2]}},
        ],
    }
    sc = scene_from_dict(cfg)
    assert isinstance(sc.scene_primitives[0], Disc)
    assert isinstance(sc.scene_primitives[1], Cylinder)
    assert not sc.scene_primitives[1].capped
    img = np.asarray(sc.render(2, seed=0))
    assert img.max() > 100


def test_validation():
    with pytest.raises(ValueError, match="inner_radius"):
        Disc(material=None, center=vec3(0, 0, 0), radius=1.0,
             inner_radius=1.5)
    with pytest.raises(ValueError, match="positive"):
        Cylinder(material=None, center=vec3(0, 0, 0), radius=0.0, height=1.0)
    with pytest.raises(ValueError, match="parallel"):
        Disc(material=None, center=vec3(0, 0, 0), radius=1.0,
             normal=vec3(0, 0, 1), u_axis=vec3(0, 0, 2))
