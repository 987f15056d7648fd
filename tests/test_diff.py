"""Differentiable rendering: gradients through the wavefront integrator.

The fork's use case is inferring a refraction index from rendered images
(Training_raytracer.ipynb, via likelihood-free ML).  Here the renderer is
pure JAX, so the same inference runs as gradient descent through the
renderer itself (raytracer_tpu/diff.py).  These tests pin down that:
  * gradients w.r.t. material tables are finite (safe_sqrt at TIR /
    missed-discriminant / grazing-cap saturation sites, core/safemath.py),
  * they match finite differences,
  * and a short Adam loop actually recovers a glass IoR from a target image.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytracer_tpu import Emissive, Refractive, Scene, Sphere, rgb, vec3
from raytracer_tpu.core.safemath import safe_norm
from raytracer_tpu.diff import (differentiable_render,
                                differentiable_render_sharded,
                                safe_value_and_grad, update_materials)
from raytracer_tpu.parallel.sharded import make_mesh


def glass_scene(n=1.5, wh=(16, 16)):
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=wh[0], screen_height=wh[1], field_of_view=30)
    # tiny imaginary part: exercises Beer-Lambert absorption too
    sc.add(Sphere(material=Refractive(n=vec3(n + 1e-6j, n + 1e-6j, n + 1e-6j)),
                  center=vec3(0, 0, 0), radius=0.5, shadow=False,
                  max_ray_depth=3))
    # emissive enclosure: every escaping path sees structured radiance
    sc.add(Sphere(material=Emissive(color=rgb(0.8, 0.6, 0.4)),
                  center=vec3(0, 0, 0), radius=20.0, shadow=False))
    return sc


def test_grad_finite_and_matches_fd():
    fn, data = differentiable_render(glass_scene(), samples_per_pixel=4)

    def loss(n_re):
        return jnp.mean(fn(update_materials(data, refr_n_re=n_re)) ** 2)

    n0 = data.mats.refr_n_re
    g = jax.grad(loss)(n0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 1e-5  # not silently zero

    eps = 1e-3
    e = jnp.zeros_like(n0).at[0, 0].set(eps)
    fd = (loss(n0 + e) - loss(n0 - e)) / (2 * eps)
    assert np.isclose(float(fd), float(g[0, 0]), rtol=0.05), (fd, g[0, 0])


def test_grad_wrt_emissive_color_is_exact():
    # radiance is LINEAR in the emitter color, so AD must be exact: the
    # gradient is the same at any emitter value and scaling is exact
    fn, data = differentiable_render(glass_scene(), samples_per_pixel=2)

    def mean_img(em):
        return jnp.mean(fn(update_materials(data, emissive_color=em)))

    em0 = data.mats.emissive_color
    assert np.isclose(float(mean_img(2.0 * em0)), 2.0 * float(mean_img(em0)),
                      rtol=1e-5)
    g = jax.grad(mean_img)(em0)
    g2 = jax.grad(mean_img)(2.0 * em0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.allclose(np.asarray(g), np.asarray(g2), rtol=1e-5)


def test_sharded_grad_finite_and_matches_fd():
    # data-parallel gradient: shard_map over the 8 virtual devices, psum
    # over the sample axis; AD must transpose through the collective
    mesh = make_mesh(n_sample_shards=4, n_pixel_shards=2)
    fn, data = differentiable_render_sharded(glass_scene(), 8, mesh=mesh)

    def loss(n_re):
        return jnp.mean(fn(update_materials(data, refr_n_re=n_re)) ** 2)

    n0 = data.mats.refr_n_re
    g = jax.grad(loss)(n0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 1e-5

    eps = 1e-3
    e = jnp.zeros_like(n0).at[0, 0].set(eps)
    fd = (loss(n0 + e) - loss(n0 - e)) / (2 * eps)
    assert np.isclose(float(fd), float(g[0, 0]), rtol=0.05), (fd, g[0, 0])


def test_chunked_render_grad_matches_fd():
    # eff spp past the 128-spp chunk cap: the Refractive scene's auto
    # split_k=3 makes 32 camera samples x 8 patterns = 256 eff spp, so the
    # render accumulates 2 chunks under the rematerialized lax.scan.  AD
    # through the scan + checkpoint must still match finite differences.
    fn, data = differentiable_render(glass_scene(), samples_per_pixel=32)

    def loss(n_re):
        return jnp.mean(fn(update_materials(data, refr_n_re=n_re)) ** 2)

    n0 = data.mats.refr_n_re
    g = jax.grad(loss)(n0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 1e-5

    eps = 1e-3
    e = jnp.zeros_like(n0).at[0, 0].set(eps)
    fd = (loss(n0 + e) - loss(n0 - e)) / (2 * eps)
    assert np.isclose(float(fd), float(g[0, 0]), rtol=0.05), (fd, g[0, 0])

    # and the chunked estimator agrees with the single-chunk one
    fn1, _ = differentiable_render(glass_scene(), samples_per_pixel=8)
    a, b = np.asarray(fn(data)), np.asarray(fn1(data))
    assert abs(a.mean() - b.mean()) < 0.02, (a.mean(), b.mean())


def test_spp_validation():
    with pytest.raises(ValueError, match="samples_per_pixel"):
        differentiable_render(glass_scene(), samples_per_pixel=0)
    with pytest.raises(ValueError, match="samples_per_pixel"):
        differentiable_render_sharded(glass_scene(), 0,
                                      mesh=make_mesh(4, 2))


def test_safe_value_and_grad_scrubs_nonfinite():
    # where() scrubbing repairs the forward value but NOT the backward pass
    # (zero cotangent x infinite partial = NaN) — the exact hazard
    # safe_value_and_grad exists for
    denom = jnp.array([1.0, 0.0])

    def f(x):
        y = x / denom
        return jnp.sum(jnp.where(jnp.isfinite(y), y, 0.0))

    x0 = jnp.array([2.0, 3.0])
    v_plain, g_plain = jax.value_and_grad(f)(x0)
    assert np.isfinite(float(v_plain)) and not np.all(np.isfinite(g_plain))
    v, g = safe_value_and_grad(f)(x0)
    assert float(v) == float(v_plain)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(g[0]) == 1.0 and float(g[1]) == 0.0


def test_safe_norm_grad_finite_at_zero():
    # jnp.linalg.norm's VJP is 0/0 at the origin; safe_norm's is defined
    g = jax.grad(lambda v: jnp.sum(safe_norm(v)))(jnp.zeros((4, 3)))
    assert np.all(np.isfinite(np.asarray(g)))
    g_ref = jax.grad(lambda v: jnp.sum(jnp.linalg.norm(v, axis=-1)))(
        jnp.zeros((4, 3)))
    assert not np.all(np.isfinite(np.asarray(g_ref)))  # the hazard is real
    # value parity away from zero
    v = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)),
                    jnp.float32)
    assert np.allclose(np.asarray(safe_norm(v)),
                       np.asarray(jnp.linalg.norm(v, axis=-1)), rtol=1e-6)


def test_recover_ior_by_gradient_descent():
    true_n = 1.5
    fn, data = differentiable_render(glass_scene(true_n), samples_per_pixel=4)
    target = fn(data)  # render at the true parameters

    # start well off (1.2) and optimize the SCALAR real IoR (tied channels)
    def loss(n_scalar):
        n_re = jnp.full_like(data.mats.refr_n_re, n_scalar)
        return jnp.mean((fn(update_materials(data, refr_n_re=n_re))
                         - target) ** 2)

    opt = optax.adam(3e-2)

    @jax.jit
    def step(n, s):
        g = jax.grad(loss)(n)
        upd, s = opt.update(g, s)
        return optax.apply_updates(n, upd), s

    n = jnp.asarray(1.2, jnp.float32)
    state = opt.init(n)
    for _ in range(60):
        n, state = step(n, state)
    assert abs(float(n) - true_n) < 0.03, float(n)
