"""Spectral dispersion (Refractive(dispersion=True), materials/shade.py).

The reference explicitly does not implement dispersion — it averages the
per-channel IoRs for the refraction direction ("Spectrum dispersion is not
implemented", refractive.py:76).  Here dispersion=True switches transmitted
paths to hero-wavelength sampling: one uniformly-chosen channel's Snell
direction with 3x single-channel throughput — unbiased per channel.
"""

import numpy as np

from raytracer_tpu import Emissive, Refractive, Scene, Sphere, rgb, vec3
from raytracer_tpu.core.compile import compile_scene


def glass_scene(n, dispersion, W=48, H=36):
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=W, screen_height=H, field_of_view=35)
    sc.add(Sphere(material=Refractive(n=n, dispersion=dispersion),
                  center=vec3(0, 0, 0), radius=0.5, shadow=False,
                  max_ray_depth=4))
    # bright backdrop: refraction displacement is what the camera sees
    sc.add(Sphere(material=Emissive(color=rgb(1.0, 1.0, 1.0)),
                  center=vec3(0, 0, 0), radius=20.0, shadow=False))
    return sc


def test_equal_ior_dispersion_matches_plain():
    # with EQUAL channel IoRs every hero picks the same Snell direction, so
    # dispersion must reproduce the plain render in expectation
    n = vec3(1.5 + 1e-8j, 1.5 + 1e-8j, 1.5 + 1e-8j)
    plain = glass_scene(n, False).render(32, seed=3, output="linear")
    disp = glass_scene(n, True).render(32, seed=4, output="linear")
    assert abs(float(plain.mean()) - float(disp.mean())) < 0.02, (
        plain.mean(), disp.mean())
    # per-channel means too (the 3x one-hot weighting must cancel exactly)
    assert np.allclose(plain.mean((0, 1)), disp.mean((0, 1)), atol=0.03)


def test_dispersive_channels_separate():
    # a strong artificial spread: channel IoRs far apart => the refracted
    # image's channels must DIFFER where the plain render's are identical
    n = vec3(1.3 + 1e-8j, 1.5 + 1e-8j, 1.8 + 1e-8j)
    plain = glass_scene(n, False).render(48, seed=5, output="linear")
    disp = glass_scene(n, True).render(48, seed=5, output="linear")
    # inside the glass silhouette (central rows/cols)
    region = np.s_[12:24, 16:32]
    sep = lambda img: float(np.abs(np.diff(img[region], axis=-1)).mean())
    # plain: all channels refract identically (channel-averaged IoR) so any
    # separation is MC noise; dispersive separation must dominate it
    assert sep(disp) > 4.0 * sep(plain), (sep(plain), sep(disp))


def test_dispersive_scene_keeps_pallas_path():
    """Since r3 hero-wavelength dispersion is unrolled in the kernels
    (static.refr_disp) — a solid dispersive scene keeps the mega-kernel."""
    n = vec3(1.3, 1.5, 1.8)
    static, _ = compile_scene(glass_scene(n, True))
    assert static.has_dispersion
    assert static.pallas_ok
    assert static.refr_disp == (True,)
    static2, _ = compile_scene(glass_scene(n, False))
    assert not static2.has_dispersion
    assert static2.refr_disp == (False,)


def test_dispersion_kernel_matches_wavefront():
    """Cross-path statistical equivalence of the hero-wavelength estimator:
    kernel (interpreter) vs jnp wavefront on a strongly dispersive glass."""
    from raytracer_tpu import RenderSettings

    n = vec3(1.3 + 1e-8j, 1.5 + 1e-8j, 1.8 + 1e-8j)
    sc = glass_scene(n, True, W=24, H=18)
    a = np.asarray(sc.render(samples_per_pixel=48, seed=0, output="linear"))
    a1 = np.asarray(sc.render(samples_per_pixel=48, seed=1, output="linear"))
    sc.settings = RenderSettings(use_pallas="always")
    b = np.asarray(sc.render(samples_per_pixel=48, seed=0, output="linear"))
    assert np.allclose(a.reshape(-1, 3).mean(0), b.reshape(-1, 3).mean(0),
                       atol=0.03), (a.mean((0, 1)), b.mean((0, 1)))
    # hero-wavelength sampling is high-variance per pixel (3x one-hot
    # weights): bound the cross-path pixel difference by the wavefront's
    # OWN seed-to-seed scatter instead of a fixed tolerance
    noise = np.abs(a - a1).mean()
    assert np.abs(a - b).mean() < 1.5 * noise + 0.01, (
        np.abs(a - b).mean(), noise)
    # the kernel path must actually separate the channels inside the glass
    region = np.s_[6:12, 8:16]
    sep = float(np.abs(np.diff(b[region], axis=-1)).mean())
    assert sep > 0.01, sep


def test_dispersion_flag_in_compile_cache_fingerprint():
    from raytracer_tpu.core.compile import scene_fingerprint

    a = glass_scene(vec3(1.3, 1.5, 1.8), False)
    fp0 = scene_fingerprint(a)
    a.scene_primitives[0].material.dispersion = True
    assert scene_fingerprint(a) != fp0
