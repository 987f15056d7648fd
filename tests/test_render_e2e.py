"""End-to-end render sanity: tiny scenes, analytic expectations.

The reference ships no tests; its de-facto acceptance suite is the golden
example images (SURVEY.md §4).  These are fast CPU equivalents with
closed-form expected values; the full example scenes live in examples/ and
scripts/compare_reference.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu import (Diffuse, Emissive, Glossy, Plane, Refractive,
                           RenderSettings, Scene, Sphere, rgb, vec3)
from raytracer_tpu.utils.colour import srgb_linear_to_srgb


def linear_render(scene, spp=4, seed=0):
    img = np.asarray(scene.render(samples_per_pixel=spp, seed=seed),
                     dtype=np.float32) / 255.0
    return img


def test_emissive_direct_view():
    # camera staring at a huge emissive wall: every pixel = tonemapped color
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=16, screen_height=16)
    sc.add(Plane(material=Emissive(color=rgb(0.3, 0.5, 0.7)),
                 center=vec3(0, 0, -2), width=100.0, height=100.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    img = linear_render(sc, spp=2)
    expected = np.asarray(srgb_linear_to_srgb(jnp.asarray([[0.3, 0.5, 0.7]])))[0]
    assert np.allclose(img.reshape(-1, 3).mean(axis=0), expected, atol=0.02)


def test_miss_is_black():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 100, 0), radius=1.0))
    img = linear_render(sc, spp=2)
    assert img.max() == 0.0


def test_glossy_lambert_direct_light():
    # head-on directional light on a pure-diffuse glossy floor, no shadowing
    # objects: pixel = ambient*diff + diff*color*NdotL, NdotL=1
    sc = Scene(ambient_color=rgb(0.0, 0.0, 0.0))
    # NOTE: camera up is fixed world-(0,1,0) (reference camera.py:28-30), so a
    # straight-down view is degenerate — look from a slight angle.
    sc.add_Camera(look_from=vec3(0, 1, 0.3), look_at=vec3(0, 0, 0),
                  screen_width=16, screen_height=16, field_of_view=30)
    sc.add_DirectionalLight(Ldir=vec3(0, 1, 0), color=rgb(0.6, 0.6, 0.6))
    mat = Glossy(diff_color=rgb(0.5, 0.5, 0.5), roughness=0.0,
                 spec_coeff=0.0, diff_coeff=1.0, n=vec3(1.0, 1.0, 1.0))
    sc.add(Plane(material=mat, center=vec3(0, 0, 0), width=100.0, height=100.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1), max_ray_depth=1),
           )
    img = linear_render(sc, spp=2)
    # n == scene n -> F0 = 0, mirror reflection contributes ~0 except grazing
    lin = 0.5 * 0.6  # diff_color * light (NdotL = 1, vertical light)
    expected = np.asarray(srgb_linear_to_srgb(jnp.asarray([[lin] * 3])))[0]
    center = img[6:10, 6:10].reshape(-1, 3).mean(axis=0)
    assert np.allclose(center, expected, atol=0.04)


def test_shadowed_vs_unshadowed():
    # a blocker between the light and the floor darkens the blocked pixels
    def build(shadow):
        sc = Scene(ambient_color=rgb(0, 0, 0))
        # side view of the floor origin; the blocker sphere hangs above it,
        # out of the camera frustum but between the origin and the light
        sc.add_Camera(look_from=vec3(0, 1.0, 6.0), look_at=vec3(0, 0, 0),
                      screen_width=16, screen_height=16, field_of_view=20)
        sc.add_DirectionalLight(Ldir=vec3(0, 1, 0), color=rgb(1, 1, 1))
        mat = Glossy(diff_color=rgb(0.5, 0.5, 0.5), roughness=0.0,
                     spec_coeff=0.0, diff_coeff=1.0, n=vec3(1.0, 1.0, 1.0))
        sc.add(Plane(material=mat, center=vec3(0, 0, 0), width=100.0, height=100.0,
                     u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1), max_ray_depth=1))
        sc.add(Sphere(material=mat, center=vec3(0, 3, 0), radius=1.5,
                      shadow=shadow, max_ray_depth=1))
        return linear_render(sc, spp=2)

    img_shadow = build(True)
    img_noshadow = build(False)
    # the floor band around the origin is under the sphere -> darker with shadow=True
    assert img_shadow[7:10, 4:12].mean() < img_noshadow[7:10, 4:12].mean() - 0.2


def test_refractive_straight_through():
    # glass pane with n=1 passes light through unchanged (F=0, no bend)
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8, field_of_view=20)
    sc.add(Sphere(material=Refractive(n=vec3(1.0, 1.0, 1.0)),
                  center=vec3(0, 0, 0), radius=0.5, shadow=False, max_ray_depth=4))
    sc.add(Plane(material=Emissive(color=rgb(0.8, 0.2, 0.4)),
                 center=vec3(0, 0, -4), width=100.0, height=100.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    img = linear_render(sc, spp=4)
    expected = np.asarray(srgb_linear_to_srgb(jnp.asarray([[0.8, 0.2, 0.4]])))[0]
    assert np.allclose(img.reshape(-1, 3).mean(axis=0), expected, atol=0.03)


def test_diffuse_furnace_like():
    # diffuse floor fully surrounded by an emissive dome of radiance E:
    # one diffuse bounce with cosine sampling gives pixel = albedo * E
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 1, 0.01), look_at=vec3(0, 0, 0),
                  screen_width=12, screen_height=12, field_of_view=30)
    albedo, E = 0.6, 0.5
    sc.add(Plane(material=Diffuse(diff_color=rgb(albedo, albedo, albedo)),
                 center=vec3(0, 0, 0), width=100.0, height=100.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Sphere(material=Emissive(color=rgb(E, E, E)),
                  center=vec3(0, 0, 0), radius=50.0, shadow=False))
    img = linear_render(sc, spp=32)
    expected = np.asarray(srgb_linear_to_srgb(jnp.asarray([[albedo * E] * 3])))[0]
    got = img[4:8, 4:8].reshape(-1, 3).mean(axis=0)
    assert np.allclose(got, expected, atol=0.05)


def test_diffuse_furnace_mesh_clustered(monkeypatch):
    # same furnace identity with the floor TESSELLATED into triangles routed
    # through the CLUSTERED sweep — catches normal-orientation or culling
    # bias in the mesh path (pixel = albedo * E independent of geometry)
    import raytracer_tpu.core.compile as C
    from raytracer_tpu import Triangle

    monkeypatch.setattr(C, "TRI_CLUSTER_THRESHOLD", 32)
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 1, 0.01), look_at=vec3(0, 0, 0),
                  screen_width=12, screen_height=12, field_of_view=30)
    albedo, E = 0.6, 0.5
    mat = Diffuse(diff_color=rgb(albedo, albedo, albedo))
    g = np.linspace(-50, 50, 9)
    for i in range(8):
        for j in range(8):
            x0, x1, z0, z1 = g[i], g[i + 1], g[j], g[j + 1]
            # counter-clockwise seen from +y so the normal points up
            sc.add(Triangle(material=mat, center=vec3(0, 0, 0),
                            p1=vec3(x0, 0, z0), p2=vec3(x1, 0, z1),
                            p3=vec3(x1, 0, z0)))
            sc.add(Triangle(material=mat, center=vec3(0, 0, 0),
                            p1=vec3(x0, 0, z0), p2=vec3(x0, 0, z1),
                            p3=vec3(x1, 0, z1)))
    sc.add(Sphere(material=Emissive(color=rgb(E, E, E)),
                  center=vec3(0, 0, 0), radius=50.0, shadow=False))
    from raytracer_tpu.core.compile import compile_scene
    static, data = compile_scene(sc)
    assert data.geom.tri_cl_lo.shape[0] >= 1   # clustered path engaged
    img = linear_render(sc, spp=32)
    expected = np.asarray(srgb_linear_to_srgb(jnp.asarray([[albedo * E] * 3])))[0]
    got = img[4:8, 4:8].reshape(-1, 3).mean(axis=0)
    assert np.allclose(got, expected, atol=0.05)


def test_deterministic_given_seed():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Sphere(material=Emissive(color=rgb(1, 0.5, 0.2)),
                  center=vec3(0, 0, -3), radius=1.0))
    a = linear_render(sc, spp=16, seed=7)
    b = linear_render(sc, spp=16, seed=7)
    c = linear_render(sc, spp=16, seed=8)
    assert np.array_equal(a, b)
    # (16 spp: at 2 spp the R2 sampler's silhouette hit counts can coincide
    # across seeds — stratification makes per-pixel counts stable by design)
    assert not np.array_equal(a, c)


def test_get_distances_aov():
    sc = Scene()
    # odd resolution so the middle pixel looks exactly down the axis
    sc.add_Camera(look_from=vec3(0, 0, 0), look_at=vec3(0, 0, -1),
                  screen_width=9, screen_height=9)
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, -5), radius=1.0))
    img = np.asarray(sc.get_distances(), dtype=np.float32) / 255.0
    # center pixel: distance 4 -> 0.4 of max_r_distance 10; corners miss -> 1.0
    assert abs(img[4, 4, 0] - 0.4) < 0.05
    assert img[0, 0, 0] > 0.95


def test_checkpoint_bare_name_resume(tmp_path):
    # np.savez appends .npz; resume must work for a suffix-less path too
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Sphere(material=Emissive(color=rgb(0.4, 0.6, 0.8)),
                  center=vec3(0, 0, -3), radius=1.5))
    ck = str(tmp_path / "bare_ckpt")     # no .npz suffix
    a = np.asarray(sc.render(samples_per_pixel=4, batch_size=2, seed=5,
                             checkpoint_path=ck, checkpoint_every=1))
    import os
    assert os.path.exists(ck + ".npz")
    from raytracer_tpu.core.scene import _load_checkpoint
    loaded = _load_checkpoint(ck, 8 * 8, 2, 5)
    assert loaded is not None and loaded[1] == 2  # both chunks recorded
    b = np.asarray(sc.render(samples_per_pixel=4, batch_size=2, seed=5,
                             checkpoint_path=ck))
    assert np.array_equal(a, b)


def test_diffuse_fan_multiplies_samples():
    # reference parity: each camera sample fans into diffuse_rays paths at
    # the first diffuse hit (diffuse.py:34-83); render() folds the fan into
    # the effective sample count
    def build(fan):
        sc = Scene()
        sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                      screen_width=8, screen_height=8)
        sc.add(Plane(material=Diffuse(diff_color=rgb(0.5, 0.5, 0.5),
                                      diffuse_rays=fan),
                     center=vec3(0, 0, -2), width=100.0, height=100.0,
                     u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
        sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                      center=vec3(0, 0, 0), radius=30.0, shadow=False))
        return sc

    _, s1 = build(1).render(samples_per_pixel=4, return_stats=True)
    _, s5 = build(5).render(samples_per_pixel=4, return_stats=True)
    assert s1["samples"] == 4
    assert s5["samples"] == 20
    # same estimator in expectation: fan=1 at 20 spp == fan=5 at 4 spp
    a = np.asarray(build(1).render(samples_per_pixel=20, seed=1),
                   np.float32) / 255.0
    b = np.asarray(build(5).render(samples_per_pixel=4, seed=2),
                   np.float32) / 255.0
    assert abs(a.mean() - b.mean()) < 0.03


def test_bounce_budget_shared_derivation():
    # one derivation for Scene.render / render_sharded / get_raycolor
    from raytracer_tpu.core.compile import compile_scene, derive_max_bounces

    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Sphere(material=Refractive(n=vec3(1.5, 1.5, 1.5)),
                  center=vec3(0, 0, -3), radius=1.0, max_ray_depth=4))
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.5, 0.5, 0.5)),
                 center=vec3(0, -2, 0), width=100.0, height=100.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    static, _, settings = sc._settings_for_render(False)
    assert settings.max_bounces == derive_max_bounces(static) == 7  # 4 + 3
