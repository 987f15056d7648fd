"""Reference API-surface parity: star import, Ray/get_raycolor, PDF classes,
extended vec3 bundle operations."""

import jax
import jax.numpy as jnp
import numpy as np


def test_star_import_surface():
    import raytracer_tpu as rt

    # the names the reference exposes through `from sightpy import *`
    # (sightpy/__init__.py:1-12 + SURVEY.md §1)
    for name in ["Scene", "Camera", "Ray", "vec3", "rgb", "Sphere", "Plane",
                 "Cuboid", "Triangle", "TriangleMesh", "Glossy", "Diffuse",
                 "Refractive", "Emissive", "ThinFilmInterference", "image",
                 "solid_color", "PointLight", "DirectionalLight",
                 "create_animation", "np", "get_raycolor", "cosine_pdf",
                 "hemisphere_pdf", "spherical_caps_pdf", "mixed_pdf",
                 "Hit", "get_distances", "first_hit", "Surface", "SkyBox",
                 "Panorama", "create_animation_using_opencv",
                 # the reference's exact camelCase util names
                 "sRGB_linear_to_sRGB", "sRGB_to_sRGB_linear",
                 "load_image_with_blur", "load_image_as_linear_sRGB",
                 "random_in_unit_spherical_cap",
                 "random_in_unit_spherical_caps", "blur_skybox",
                 "extract", "array_to_vec3", "Light",
                 "FARAWAY", "UPWARDS", "UPDOWN", "SKYBOX_DISTANCE"]:
        assert hasattr(rt, name), name


def test_get_raycolor_bundle():
    from raytracer_tpu import Emissive, Ray, Scene, Sphere, get_raycolor, rgb, vec3

    sc = Scene()
    sc.add(Sphere(material=Emissive(color=rgb(0.25, 0.5, 0.75)),
                  center=vec3(0, 0, -5), radius=1.0))
    O = jnp.zeros((4, 3), jnp.float32)
    D = jnp.asarray([[0, 0, -1], [0, 0, 1], [0, 1, 0], [0, 0, -1]], jnp.float32)
    L = np.asarray(get_raycolor(Ray(origin=O, dir=D), sc))
    assert np.allclose(L[0], [0.25, 0.5, 0.75], atol=1e-5)   # hits
    assert np.allclose(L[1], 0.0)                             # misses
    assert np.allclose(L[3], L[0])


def test_first_hit_record():
    """first_hit returns a populated Hit bundle (reference ray.py:97-143)."""
    from raytracer_tpu import Emissive, Ray, Scene, Sphere, first_hit, rgb, vec3

    sc = Scene()
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, -5), radius=1.0))
    O = jnp.zeros((3, 3), jnp.float32)
    D = jnp.asarray([[0, 0, -1], [0, 0, 1], [0, 1, 0]], jnp.float32)
    h = first_hit(Ray(origin=O, dir=D), sc)
    t = np.asarray(h.distance)
    assert np.isclose(t[0], 4.0, atol=1e-4)            # front of the sphere
    assert t[1] >= 1e30 and t[2] >= 1e30               # misses -> FARAWAY
    assert np.allclose(np.asarray(h.point)[0], [0, 0, -4], atol=1e-4)
    assert np.allclose(np.asarray(h.get_normal())[0], [0, 0, 1], atol=1e-4)
    u, v = np.asarray(h.get_uv())[0]
    assert 0.0 <= u <= 1.0 and np.isclose(v, 0.5, atol=1e-4)  # equator
    assert np.asarray(h.orientation)[0] == 1.0         # entering
    assert np.asarray(h.obj_id)[0] == 0


def test_ray_where_concatenate():
    from raytracer_tpu import Ray

    a = Ray(jnp.zeros((2, 3)), jnp.ones((2, 3)))
    b = Ray(jnp.ones((2, 3)), jnp.zeros((2, 3)))
    w = Ray.where(jnp.asarray([True, False]), a, b)
    assert np.allclose(np.asarray(w.origin), [[0, 0, 0], [1, 1, 1]])
    c = Ray.concatenate([a, b])
    assert len(c) == 4


def test_pdf_classes(key):
    from raytracer_tpu import cosine_pdf, mixed_pdf, spherical_caps_pdf

    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (256, 1))
    p1 = cosine_pdf(256, n)
    d = p1.generate(key)
    assert np.asarray(p1.value(d)).min() >= 0
    origin = jnp.zeros((256, 3), jnp.float32)
    p2 = spherical_caps_pdf(
        256, origin, (jnp.asarray([[0.0, 5.0, 0.0]], jnp.float32),
                      jnp.asarray([1.0], jnp.float32)))
    pm = mixed_pdf(256, p1, p2, 0.5)
    d2 = pm.generate(key)
    assert np.asarray(pm.value(d2)).min() >= 0
    assert np.allclose(np.linalg.norm(np.asarray(d2), axis=-1), 1.0, atol=1e-4)


def test_vec3_bundle_ops():
    from raytracer_tpu import vec3

    v = vec3(np.arange(4.0), np.arange(4.0) + 1, np.arange(4.0) + 2)
    assert v.shape() == (4,)
    assert len(v) == 4
    assert np.allclose(v.yzx().x, v.y)
    assert np.allclose(v.zxy().x, v.z)
    e = v.extract(np.asarray([True, False, True, False]))
    assert e.x.shape == (2,)
    p = e.place(np.asarray([True, False, True, False]))
    assert np.allclose(p.x, [0, 0, 2, 0])
    r = v.repeat(2)
    assert r.x.shape == (8,)
    m = v.mean(axis=0)
    assert np.isclose(m.x, 1.5)
    c = vec3.concatenate([v, v])
    assert c.x.shape == (8,)
    s = vec3.select([np.asarray([True, False])],
                    [vec3(np.ones(2), np.ones(2), np.ones(2))])
    assert np.allclose(s.x, [1, 0])
    basis = [vec3(1.0, 0, 0), vec3(0, 1.0, 0), vec3(0, 0, 1.0)]
    cb = vec3(1.0, 2.0, 3.0).change_basis(basis)
    assert (cb.x, cb.y, cb.z) == (1.0, 2.0, 3.0)
