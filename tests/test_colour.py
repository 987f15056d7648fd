import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils.colour import srgb_linear_to_srgb, srgb_to_srgb_linear


def test_round_trip():
    x = np.linspace(0.0, 0.9, 32).reshape(-1, 1).repeat(3, -1)
    y = np.asarray(srgb_linear_to_srgb(jnp.asarray(x, jnp.float32)))
    back = srgb_to_srgb_linear(y)
    assert np.allclose(back, x, atol=2e-3)


def test_highlight_scaling_preserves_hue():
    # a pixel brighter than 1.0 is scaled so max channel == ~1, not clipped
    x = jnp.asarray([[4.0, 2.0, 1.0]], jnp.float32)
    y = np.asarray(srgb_linear_to_srgb(x))[0]
    assert y.max() <= 1.0 + 1e-5
    # ordering of channels preserved (hue direction intact)
    assert y[0] > y[1] > y[2]


def test_monotonic():
    x = jnp.linspace(0, 1, 64, dtype=jnp.float32)[:, None].repeat(3, -1)
    y = np.asarray(srgb_linear_to_srgb(x))
    assert np.all(np.diff(y[:, 0]) >= -1e-6)
