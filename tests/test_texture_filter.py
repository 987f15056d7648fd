"""Bilinear texture filtering + sphere normal maps (beyond the reference:
its fetch is nearest-only, texture.py:32-39, and its normal maps de facto
work on Plane/Cuboid only)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu import (Emissive, Glossy, Plane, Scene, Sphere, image,
                           rgb, vec3)
from raytracer_tpu.core.compile import compile_scene, scene_fingerprint
from raytracer_tpu.materials.shade import fetch_texture


def test_bilinear_interpolates_between_texels():
    tex = jnp.asarray(np.array([[[0.0], [1.0]],
                                [[0.0], [1.0]]], np.float32))
    # texel centers in the fetch convention: u at texel centers x=0.5/1.5
    # -> u = 0.25 / 0.75 for W=2
    uv = jnp.asarray([[0.25, 0.25],    # left texel center
                      [0.75, 0.25],    # right texel center
                      [0.50, 0.25]],   # halfway between
                     jnp.float32)
    c = np.asarray(fetch_texture(tex, uv, 1.0, bilinear=True))[:, 0]
    assert np.allclose(c, [0.0, 1.0, 0.5], atol=1e-6)


def test_bilinear_matches_nearest_on_constant():
    rngtex = jnp.full((7, 5, 3), 0.37, jnp.float32)
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(-2, 2, (64, 2)), jnp.float32)
    a = np.asarray(fetch_texture(rngtex, uv, 1.3, bilinear=False))
    b = np.asarray(fetch_texture(rngtex, uv, 1.3, bilinear=True))
    assert np.allclose(a, b, atol=1e-6)


def test_bilinear_scene_keeps_record_path():
    """Since r3 bilinear textures replay as a 4-tap fetch on the record
    path (ops/pallas_record.py Round.fetch) — the filter changes the
    fingerprint but no longer forces the wavefront."""
    tex = np.zeros((8, 8, 3), np.float32)
    tex[::2, :] = 1.0
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 1, 2), look_at=vec3(0, 0, 0),
                  screen_width=16, screen_height=16)
    sc.add(Plane(material=Emissive(color=image(tex, filter="bilinear")),
                 center=vec3(0, 0, 0), width=4.0, height=4.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    static, _ = compile_scene(sc)
    assert static.pallas_tex_ok and not static.pallas_ok
    img = sc.render(samples_per_pixel=2, seed=0, output="linear")
    assert np.isfinite(np.asarray(img)).all()

    sc2 = Scene()
    sc2.add_Camera(look_from=vec3(0, 1, 2), look_at=vec3(0, 0, 0),
                   screen_width=16, screen_height=16)
    sc2.add(Plane(material=Emissive(color=image(tex)),
                  center=vec3(0, 0, 0), width=4.0, height=4.0,
                  u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    assert scene_fingerprint(sc) != scene_fingerprint(sc2)


def test_image_filter_validation():
    with pytest.raises(ValueError, match="filter"):
        image(np.zeros((2, 2, 3), np.float32), filter="cubic")


def test_sphere_normal_map_tilts_in_tangent_frame():
    """Constant red map on a sphere tilts the normal 45 deg toward the
    longitude tangent T = dP/du; closed form at the +z equator point."""
    from raytracer_tpu.core.integrator import _apply_normal_maps
    from raytracer_tpu.geometry.attrs import hit_attributes
    from raytracer_tpu.geometry.intersect import nearest_hit

    nm = np.full((4, 4, 3), 0.5, np.float32)
    nm[..., 0] = 0.75
    nm[..., 2] = 0.75
    mat = Emissive(color=rgb(1, 1, 1))
    mat.set_normalmap(nm)
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8)
    sc.add(Sphere(material=mat, center=vec3(0, 0, 0), radius=1.0))
    static, data = compile_scene(sc)
    assert any(r.basis_kind == "sphere" for r in static.normal_maps)

    O = jnp.asarray([[0.0, 0.0, 3.0]], jnp.float32)
    D = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    t, orient, obj = nearest_hit(O, D, data.geom)
    P = O + t[:, None] * D
    N_geo, uv = hit_attributes(P, obj, data.geom, static, force_uv=True)
    N = np.asarray(_apply_normal_maps(N_geo, P, uv, obj, data, static))
    # at P=(0,0,1): N=(0,0,1), T = (-z,0,x)/s = (-1,0,0)
    expected = np.array([-1.0, 0.0, 1.0]) / np.sqrt(2.0)
    assert np.abs(N - expected).max() < 1e-3


def test_sphere_normal_map_renders(tmp_path):
    """End-to-end: a bump-mapped glossy sphere renders finite and differs
    from the unmapped render."""
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    h = 0.2 * np.sin(2 * np.pi * 6 * xx) * np.sin(2 * np.pi * 3 * yy)
    dx = np.gradient(h, axis=1) * 64
    dy = np.gradient(h, axis=0) * 64
    n = np.stack([-dx, -dy, np.ones_like(h)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    nmap = (n * 0.5 + 0.5).astype(np.float32)

    imgs = []
    for use in (False, True):
        mat = Glossy(diff_color=rgb(0.6, 0.5, 0.4), roughness=0.3,
                     spec_coeff=0.3, diff_coeff=0.8,
                     n=vec3(1.4 + 0j, 1.4 + 0j, 1.4 + 0j))
        if use:
            mat.set_normalmap(nmap, filter="bilinear")
        sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
        sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                      screen_width=24, screen_height=24)
        sc.add_DirectionalLight(Ldir=vec3(1, 1, 1), color=rgb(1, 1, 1))
        sc.add(Sphere(material=mat, center=vec3(0, 0, 0), radius=1.0))
        sc.add(Sphere(material=Emissive(color=rgb(0.8, 0.8, 0.8)),
                      center=vec3(0, 0, 0), radius=30.0, shadow=False))
        imgs.append(np.asarray(sc.render(samples_per_pixel=2, seed=0,
                                         output="linear")))
    assert np.isfinite(imgs[1]).all()
    assert not np.allclose(imgs[0], imgs[1])
