import numpy as np

from raytracer_tpu.utils.thin_film import thin_film_lut, thin_film_reflectance


def test_fresnel_energy_conservation_real_ior():
    """F + T = 1 by construction; F at normal incidence = ((n1-n2)/(n1+n2))^2."""
    n1, n2 = 1.0, 1.5
    F0 = ((n1 - n2) / (n1 + n2)) ** 2
    # evaluate via the shading kernel's math (complex fresnel, zero imag)
    import jax.numpy as jnp
    import jax
    cos_i = jnp.asarray([[1.0], [0.5]], jnp.float32)
    c1 = jax.lax.complex(jnp.full((2, 3), n1), jnp.zeros((2, 3)))
    c2 = jax.lax.complex(jnp.full((2, 3), n2), jnp.zeros((2, 3)))
    ratio = c1 / c2
    cos_t = jnp.sqrt(1.0 - ratio * ratio * (1.0 - cos_i * cos_i))
    r_per = (c1 * cos_i - c2 * cos_t) / (c1 * cos_i + c2 * cos_t)
    r_par = -(c1 * cos_t - c2 * cos_i) / (c1 * cos_t + c2 * cos_i)
    F = (jnp.abs(r_per) ** 2 + jnp.abs(r_par) ** 2) / 2.0
    assert np.isclose(float(F[0, 0]), F0, atol=1e-6)
    assert np.all((np.asarray(F) >= 0) & (np.asarray(F) <= 1))


def test_thin_film_reflectance_physical():
    R = thin_film_reflectance(np.linspace(0, 1, 16), np.linspace(0, 1000, 16), 1.4)
    assert R.shape == (16, 3)
    assert R.min() >= 0.0 and R.max() <= 1.0
    # zero thickness -> film vanishes -> no reflection
    R0 = thin_film_reflectance(np.array([1.0]), np.array([0.0]), 1.4)
    assert R0.max() < 1e-6
    # quarter-wave peak: d = lambda / (4 n) maximizes R at normal incidence
    lam = 550.0
    d_peak = lam / (4 * 1.4)
    Rp = thin_film_reflectance(np.array([1.0]), np.array([d_peak]), 1.4)[0, 1]
    Roff = thin_film_reflectance(np.array([1.0]), np.array([2 * d_peak]), 1.4)[0, 1]
    assert Rp > Roff
    # classic two-interface maximum: R = (2r/(1+r^2))^2 with r = (1-n)/(1+n)
    r = (1 - 1.4) / (1 + 1.4)
    R_max = (2 * abs(r) / (1 + r ** 2)) ** 2
    assert np.isclose(Rp, R_max, atol=1e-3)


def test_thin_film_lut_layout():
    lut = thin_film_lut(1.4, height=64, max_thickness=128)
    assert lut.shape == (64, 128, 3)
    assert lut.dtype == np.float32


def test_glossy_schlick_bounds():
    # Schlick F in [F0, 1]
    F0 = 0.04
    cos = np.linspace(0, 1, 32)
    F = F0 + (1 - F0) * (1 - cos) ** 5
    assert F.min() >= F0 - 1e-9 and F.max() <= 1.0 + 1e-9
