"""CustomMaterial: the user-defined wavefront shading hook.

The reference's extensibility is subclassing Material with a recursive numpy
get_color (sightpy/materials/material.py:11-44); here a subclass implements
shade(ctx) -> ShadeOut over the whole wavefront (materials/base.py
CustomMaterial) and the integrator dispatches to it by material slot.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np


def _scene(mat, W=48, H=36):
    from raytracer_tpu import Scene, Sphere, vec3

    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=W, screen_height=H)
    sc.add(Sphere(material=mat, center=vec3(0, 0, -3), radius=1))
    return sc


def test_custom_flat_color_matches_builtin_emissive():
    """A trivial custom shader must reproduce Emissive exactly."""
    from raytracer_tpu import CustomMaterial, Emissive, default_shade_out, rgb

    class FlatColor(CustomMaterial):
        def __init__(self, color):
            super().__init__()
            self.color = tuple(color)

        def shade(self, ctx):
            col = jnp.broadcast_to(
                jnp.asarray(self.color, jnp.float32), ctx.P.shape)
            return dataclasses.replace(default_shade_out(ctx), add=col)

    a = np.asarray(_scene(FlatColor((0.9, 0.4, 0.1))).render(
        samples_per_pixel=2, seed=3))
    b = np.asarray(_scene(Emissive(color=rgb(0.9, 0.4, 0.1))).render(
        samples_per_pixel=2, seed=3))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_custom_mirror_continuation():
    """A custom mirror shader continues the path and picks up radiance from
    an emissive object that only its REFLECTED rays can reach."""
    from raytracer_tpu import (CustomMaterial, Emissive, Scene, Sphere,
                               default_shade_out, rgb, vec3)

    class Mirror(CustomMaterial):
        def shade(self, ctx):
            d = ctx.D - ctx.N * (2.0 * jnp.sum(ctx.D * ctx.N, axis=-1,
                                               keepdims=True))
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            n = ctx.P.shape[0]
            return dataclasses.replace(
                default_shade_out(ctx),
                beta_mult=jnp.full((n, 3), 0.8, ctx.P.dtype),
                new_origin=ctx.P + ctx.N * ctx.eps[..., None],
                new_dir=d,
                cont=ctx.depth < ctx.obj_max_depth,
                is_reflection=jnp.ones((n,), bool))

    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=48, screen_height=36)
    sc.add(Sphere(material=Mirror(), center=vec3(0, 0, -3), radius=1))
    # emissive sphere BEHIND the camera: visible only via the mirror
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, 6), radius=3))
    img = np.asarray(sc.render(samples_per_pixel=2, seed=0)).astype(float)
    H, W, _ = img.shape
    center = img[H // 2, W // 2]
    corner = img[1, 1]
    # mirror center reflects straight back into the emissive: bright gray
    assert center.min() > 100, center
    # corners miss everything: black
    assert corner.max() < 5, corner


def test_example_custom_material_renders():
    """The showcase example builds and renders a small frame with both
    custom shaders active alongside built-in Glossy/Emissive."""
    import importlib
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    mod = importlib.import_module("example_custom_material")
    sc = mod.build_scene(width=64, height=48)
    img = np.asarray(sc.render(samples_per_pixel=2, seed=0)).astype(float)
    assert img.mean() > 5.0          # something rendered
    H, W, _ = img.shape
    left = img[:, : W // 2].mean(axis=(0, 1))
    right = img[:, W // 2:].mean(axis=(0, 1))
    # iridescent sphere (left) and blue-toon sphere (right) color the halves
    # differently
    assert np.abs(left - right).max() > 2.0


def test_custom_param_mutation_retraces():
    """Mutating a plain-python shader parameter must invalidate BOTH cache
    layers (scene fingerprint + jit static custom_fp) — not serve the old
    compiled shader."""
    from raytracer_tpu import CustomMaterial, default_shade_out

    class Bright(CustomMaterial):
        def __init__(self):
            super().__init__()
            self.level = 0.1

        def shade(self, ctx):
            col = jnp.full(ctx.P.shape, self.level, ctx.P.dtype)
            return dataclasses.replace(default_shade_out(ctx), add=col)

    mat = Bright()
    sc = _scene(mat)
    a = np.asarray(sc.render(samples_per_pixel=1, seed=0)).astype(float)
    mat.level = 0.9
    b = np.asarray(sc.render(samples_per_pixel=1, seed=0)).astype(float)
    assert b.max() > a.max() + 50, (a.max(), b.max())


def test_first_hit_reuses_compiled_executable():
    """first_hit is compiled once per (structure, shape): a second call and a
    moved-object call must not re-trace (scene tables are jit arguments)."""
    from raytracer_tpu import Emissive, Ray, Scene, Sphere, first_hit, rgb, vec3
    from raytracer_tpu.core.ray import _first_hit_impl

    sc = Scene()
    sph = Sphere(material=Emissive(color=rgb(1, 1, 1)),
                 center=vec3(0, 0, -5), radius=1.0)
    sc.add(sph)
    O = jnp.zeros((4, 3), jnp.float32)
    D = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (4, 1))
    r = Ray(origin=O, dir=D)
    h1 = first_hit(r, sc)
    misses0 = int(_first_hit_impl._cache_size())
    h2 = first_hit(r, sc)
    sph.center = np.asarray([0, 0, -7], np.float32)   # same structure
    h3 = first_hit(r, sc)
    assert int(_first_hit_impl._cache_size()) == misses0   # no new traces
    assert np.isclose(np.asarray(h1.distance)[0], 4.0, atol=1e-4)
    assert np.isclose(np.asarray(h2.distance)[0], 4.0, atol=1e-4)
    assert np.isclose(np.asarray(h3.distance)[0], 6.0, atol=1e-4)
    # miss lanes are zeroed, not FARAWAY pseudo-points
    back = first_hit(Ray(origin=O, dir=-D), sc)
    assert np.asarray(back.distance).min() >= 1e30
    assert np.allclose(np.asarray(back.point), 0.0)


def test_custom_shader_with_closed_over_texture():
    """A custom shader can sample its own image texture via fetch_texture
    (the array is traced in as a program constant)."""
    from raytracer_tpu import CustomMaterial, default_shade_out
    from raytracer_tpu.materials.shade import fetch_texture
    from raytracer_tpu.textures.procedural import checkerboard

    tex = jnp.asarray(checkerboard(8))

    class Checkered(CustomMaterial):
        def shade(self, ctx):
            col = fetch_texture(tex, ctx.uv, repeat=4.0)
            return dataclasses.replace(default_shade_out(ctx), add=col)

    img = np.asarray(_scene(Checkered(), W=64, H=48).render(
        samples_per_pixel=4, seed=1)).astype(float)
    sphere = img[14:34, 22:42].reshape(-1, 3).mean(-1)
    # a checker pattern on the sphere: both dark and bright texels visible
    assert sphere.max() > 150 and sphere.min() < 100, (
        sphere.min(), sphere.max())


def test_first_hit_agrees_with_distances_aov():
    """Two public entry points over the same kernels must agree: first_hit's
    clipped distances equal the get_distances AOV."""
    from raytracer_tpu import (Emissive, Ray, Scene, Sphere, first_hit,
                               get_distances, rgb, vec3)

    sc = Scene()
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, -4), radius=1.0))
    O = np.zeros((5, 3), np.float32)
    D = np.asarray([[0, 0, -1], [0.1, 0, -1], [0, 0.12, -1],
                    [0, 1, 0], [1, 0, 0]], np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    r = Ray(origin=O, dir=D)
    h = first_hit(r, sc)
    aov = np.asarray(get_distances(r, sc))
    expect = np.minimum(np.asarray(h.distance), 10.0) / 10.0
    assert np.allclose(aov[:, 0], expect, atol=1e-5)


def test_custom_scene_never_routes_to_pallas():
    from raytracer_tpu import CustomMaterial, default_shade_out
    from raytracer_tpu.core.compile import compile_scene

    class Black(CustomMaterial):
        def shade(self, ctx):
            return default_shade_out(ctx)

    static, _ = compile_scene(_scene(Black()))
    assert not static.pallas_ok and not static.pallas_tex_ok
    assert static.custom_mats and static.needs_uv
