"""Environment-map importance sampling (alias method over equirect maps).

The reference can only importance-sample scene primitives (spherical caps,
random.py:76-151); an HDR environment with a small bright sun is hopeless
there.  Here compile builds alias tables over the map's luminance
(core/compile.py _env_is_tables) and the Diffuse mixture gains an
environment component (core/rng.py mixed_diffuse_sample) — two gathers per
sample, no divergence.

The critical invariants: (1) the sampler's (u, v) mapping agrees with the
env FETCH convention (sphere uv + fetch_texture's negated-row indexing), or
importance sampling would aim at the mirror image; (2) pdf(d) is exactly the
sampler's own density, so the mixture estimator stays unbiased.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu import Diffuse, Plane, Scene, rgb, vec3
from raytracer_tpu.core import rng
from raytracer_tpu.core.compile import _env_is_tables, compile_scene
from raytracer_tpu.materials.shade import fetch_texture


def _spot_env(H=32, W=64, spot_rc=(8, 48), spot_r=2, bright=50.0, base=0.01):
    """Equirect env: dim everywhere, bright disk at texel (row, col)."""
    img = np.full((H, W, 3), base, np.float32)
    r, c = spot_rc
    yy, xx = np.mgrid[0:H, 0:W]
    img[(yy - r) ** 2 + (xx - c) ** 2 <= spot_r ** 2] = bright
    return img


def _sphere_uv(d):
    u = (np.arctan2(d[..., 2], d[..., 0]) + np.pi) / (2 * np.pi)
    v = (np.arcsin(np.clip(d[..., 1], -1, 1)) + np.pi / 2) / np.pi
    return np.stack([u, v], -1)


def test_sampler_aligns_with_fetch_convention():
    """Directions drawn from the env distribution fetch the bright texels
    through the SAME uv convention the renderer shades with."""
    img = _spot_env()
    prob, alias, pdf_t, hw = _env_is_tables(img, max_h=32, max_w=64)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    n = 4096
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    d = np.asarray(rng.env_alias_sample(u1, u2, jnp.asarray(prob),
                                        jnp.asarray(alias), hw))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    uv = jnp.asarray(_sphere_uv(d), jnp.float32)
    fetched = np.asarray(fetch_texture(jnp.asarray(img), uv))
    # ~all mass sits on the bright spot (the dim background holds < 1% of
    # the luminance-x-solid-angle integral here)
    assert (fetched[..., 0] > 1.0).mean() > 0.95


def test_pdf_matches_sampler_density():
    """Chi-square-style check: the empirical cell visit frequency matches
    pdf * cell solid angle, and the pdf integrates to 1 over the sphere."""
    img = _spot_env(bright=5.0, base=0.5)   # moderate contrast
    prob, alias, pdf_t, hw = _env_is_tables(img, max_h=16, max_w=32)
    # MC integral of pdf over the sphere with uniform directions
    k = jax.random.PRNGKey(1)
    d = rng.random_in_unit_sphere(k, (200_000,))
    vals = np.asarray(rng.env_pdf_value(d, jnp.asarray(pdf_t), hw))
    integral = vals.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.05, integral
    # sampled directions: empirical pdf at the sample ≈ claimed pdf
    k1, k2 = jax.random.split(k)
    n = 200_000
    ds = rng.env_alias_sample(jax.random.uniform(k1, (n,)),
                              jax.random.uniform(k2, (n,)),
                              jnp.asarray(prob), jnp.asarray(alias), hw)
    # E[1/pdf] over samples = total solid angle = 4pi
    inv = 1.0 / np.asarray(rng.env_pdf_value(ds, jnp.asarray(pdf_t), hw))
    assert abs(inv.mean() / (4 * np.pi) - 1.0) < 0.05


def _floor_scene(importance_sampled, bright=200.0, spot_r=2):
    sc = Scene(ambient_color=(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 1.0, 2), look_at=vec3(0, 0, -1),
                  screen_width=24, screen_height=24)
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.7, 0.7, 0.7),
                                  diffuse_rays=1),
                 center=vec3(0, -0.5, -2), width=30, height=30,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add_Background(_spot_env(bright=bright, spot_r=spot_r), spherical=True,
                      importance_sampled=importance_sampled)
    return sc


def test_env_is_unbiased():
    """Equal-spp renders with and without env IS agree in the mean (the
    mixture pdf compensates exactly for the redirected samples)."""
    a = np.asarray(_floor_scene(True, bright=20.0, spot_r=6).render(
        samples_per_pixel=192, seed=5, output="linear"))
    b = np.asarray(_floor_scene(False, bright=20.0, spot_r=6).render(
        samples_per_pixel=768, seed=9, output="linear"))
    ma, mb = a.mean(), b.mean()
    assert mb > 0.01
    assert abs(ma - mb) / mb < 0.08, (ma, mb)


def test_env_is_cuts_variance():
    """A small bright sun: importance sampling slashes per-pixel variance at
    equal spp."""
    var = {}
    for flag in (True, False):
        sc = _floor_scene(flag, bright=400.0, spot_r=2)
        _, v = sc.render(samples_per_pixel=32, seed=2, output="linear",
                         with_variance=True)
        var[flag] = float(np.mean(v))
    assert var[True] * 3.0 < var[False], var


def test_env_is_gates_and_validation():
    sc = _floor_scene(True)
    static, data = compile_scene(sc)
    assert static.env_is_shape != (0, 0)
    assert not static.pallas_ok and not static.pallas_tex_ok
    assert data.env_is_prob.shape[0] == np.prod(static.env_is_shape)

    # cubemap SkyBox cannot be importance-sampled
    sc2 = Scene()
    sc2.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                   screen_width=4, screen_height=4)
    with pytest.raises(ValueError, match="equirect"):
        sc2.add_Background(_spot_env(), spherical=False,
                           importance_sampled=True)


def test_env_is_fingerprint():
    """Toggling importance_sampled changes the scene fingerprint (the jit
    static key changes through SceneStatic anyway, but the compile cache
    must also invalidate)."""
    from raytracer_tpu.core.compile import scene_fingerprint

    fa = scene_fingerprint(_floor_scene(True))
    fb = scene_fingerprint(_floor_scene(False))
    assert fa != fb


def test_black_env_falls_back():
    """A black importance-sampled map has no distribution to sample: compile
    must fall back to the plain mixture instead of drawing uniform
    directions with a claimed pdf of 0 (a biased estimator)."""
    sc = Scene(ambient_color=(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 1.0, 2), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.7, 0.7, 0.7),
                                  diffuse_rays=1),
                 center=vec3(0, -0.5, -2), width=30, height=30,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add_Background(np.zeros((16, 32, 3), np.float32), spherical=True,
                      importance_sampled=True)
    static, data = compile_scene(sc)
    assert static.env_is_shape == (0, 0)
    assert data.env_is_prob.shape[0] == 0
    img = np.asarray(sc.render(samples_per_pixel=4, seed=0, output="linear"))
    assert np.isfinite(img).all() and img.max() == 0.0
