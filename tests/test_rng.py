import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core import rng


def test_unit_disk(key):
    rx, ry = rng.random_in_unit_disk(key, (4096,))
    r2 = np.asarray(rx) ** 2 + np.asarray(ry) ** 2
    assert r2.max() <= 1.0 + 1e-6
    # area-uniform: mean r^2 = 1/2
    assert abs(r2.mean() - 0.5) < 0.03


def test_unit_sphere(key):
    d = np.asarray(rng.random_in_unit_sphere(key, (4096,)))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.05


def test_cosine_sample_distribution(key):
    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (8192, 1))
    d = rng.cosine_sample(key, n)
    cos = np.asarray(jnp.sum(d * n, axis=-1))
    assert cos.min() >= -1e-5
    # E[cos] = 2/3 for pdf = cos/pi
    assert abs(cos.mean() - 2.0 / 3.0) < 0.02
    # pdf value matches cos/pi
    pdf = np.asarray(rng.cosine_pdf_value(d, n))
    assert np.allclose(pdf, np.clip(cos, 0, 1) / np.pi, atol=1e-5)


def test_hemisphere_sample(key):
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (2048, 1))
    d = rng.hemisphere_sample(key, n)
    assert np.asarray(jnp.sum(d * n, axis=-1)).min() >= 0.0


def test_caps_sample_inside_cap(key):
    origin = jnp.zeros((2048, 3), jnp.float32)
    centers = jnp.asarray([[0.0, 0.0, -10.0]], jnp.float32)
    radii = jnp.asarray([1.0], jnp.float32)
    d = rng.caps_sample(key, origin, centers, radii)
    cos_to_axis = np.asarray(d)[:, 2] * -1.0
    cos_max = np.sqrt(1 - (1.0 / 10.0) ** 2)
    assert cos_to_axis.min() >= cos_max - 1e-4
    pdf = np.asarray(rng.caps_pdf_value(d, origin, centers, radii))
    assert np.all(pdf > 0)
    expected = 1.0 / ((1 - cos_max) * 2 * np.pi)
    assert np.allclose(pdf, expected, rtol=1e-3)


def test_caps_pdf_integrates_to_one(key):
    # MC integral of the caps pdf over the sphere = 1
    origin = jnp.zeros((1, 3), jnp.float32)
    centers = jnp.asarray([[0.0, 0.0, -5.0], [3.0, 0.0, -4.0]], jnp.float32)
    radii = jnp.asarray([1.0, 1.5], jnp.float32)
    d = rng.random_in_unit_sphere(key, (200_000,))
    pdf = np.asarray(rng.caps_pdf_value(
        d, jnp.zeros((200_000, 3), jnp.float32), centers, radii))
    integral = pdf.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.05


def test_mixture_sample(key):
    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (4096, 1))
    origin = jnp.zeros((4096, 3), jnp.float32)
    centers = jnp.asarray([[0.0, 10.0, 0.0]], jnp.float32)
    radii = jnp.asarray([2.0], jnp.float32)
    d, pdf = rng.mixed_cosine_caps_sample(key, n, origin, centers, radii, 0.5)
    assert np.all(np.isfinite(np.asarray(d)))
    assert np.asarray(pdf).min() >= 0.0
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-4)


def test_determinism(key):
    a = rng.cosine_sample(key, jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32))
    b = rng.cosine_sample(key, jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32))
    assert np.allclose(np.asarray(a), np.asarray(b))
    c = rng.cosine_sample(jax.random.fold_in(key, 1),
                          jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32))
    assert not np.allclose(np.asarray(a), np.asarray(c))
