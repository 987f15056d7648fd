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


def test_deterministic_split_exact_and_unbiased():
    """Deterministic two-branch refraction (reference refractive.py:102-110).

    A glass sphere inside a uniform emissive furnace: every branch of the
    Fresnel tree terminates on the same radiance L0, and the branch weights
    at each split sum to F + T = 1, so the pattern-block estimator returns
    L0 (almost) deterministically — seed-to-seed variance ~0 — while the
    stochastic estimator (mc=True) shows real branch-selection noise.
    """
    import numpy as np
    from raytracer_tpu import Emissive, Refractive, Scene, Sphere, rgb, vec3
    from raytracer_tpu.utils.colour import srgb_linear_to_srgb

    L0 = 0.6

    def build(mc):
        sc = Scene(ambient_color=rgb(0, 0, 0))
        sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                      screen_width=8, screen_height=8, field_of_view=30)
        sc.add(Sphere(material=Refractive(n=vec3(1.5, 1.5, 1.5)),
                      center=vec3(0, 0, 0), radius=0.7, shadow=False,
                      max_ray_depth=4, mc=mc))
        sc.add(Sphere(material=Emissive(color=rgb(L0, L0, L0)),
                      center=vec3(0, 0, 0), radius=20.0, shadow=False))
        return sc

    def center_vals(mc, spp, seeds):
        return np.array([
            np.asarray(build(mc).render(samples_per_pixel=spp, seed=s),
                       np.float32)[3:5, 3:5, 0].mean() / 255.0
            for s in seeds])

    from raytracer_tpu.core.compile import compile_scene, derive_split_k
    static, _ = compile_scene(build(False))
    assert derive_split_k(static) == 3
    assert derive_split_k(compile_scene(build(True))[0]) == 0

    expected = float(srgb_linear_to_srgb(np.full((1, 3), L0))[0, 0])
    det = center_vals(False, 2, seeds=(1, 2, 3))        # eff 2*8 paths
    sto = center_vals(True, 16, seeds=(1, 2, 3))        # same path count
    # unbiased: both estimators sit on the furnace value
    assert abs(det.mean() - expected) < 0.02, (det, expected)
    assert abs(sto.mean() - expected) < 0.08, (sto, expected)
    # the deterministic tree has (almost) no branch-selection variance:
    # residual wiggle is only the 3rd-order stochastic tail + AA jitter
    assert det.std() <= sto.std() + 1e-4, (det.std(), sto.std())
    assert det.std() < 0.01, det.std()
