"""Low-discrepancy camera sampling (core/lds.py, RenderSettings.sampler).

Properties established:
  1. variance reduction — R2 renders land measurably closer to a converged
     truth than i.i.d. renders at equal spp (the feature's reason to exist);
  2. unbiasedness — R2 and i.i.d. estimate the same image (z-test on the
     image mean over seeds);
  3. chunk invariance — the lattice continues across chunk boundaries:
     a render split into chunks draws the SAME camera sample set as one
     unchunked render (exactly equal for a jitter-only scene);
  4. the fixed-point recurrence is exact: u(s) visits frac(rot + s*alpha)
     with perfect stratification at any sample index.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from raytracer_tpu import Emissive, Scene, Sphere, rgb, vec3

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def _render(sc, spp, seed, sampler, **kw):
    from raytracer_tpu.core.integrator import RenderSettings

    sc.settings = RenderSettings(sampler=sampler)
    return sc.render(spp, seed=seed, output="linear", **kw)


def test_r2_reduces_mse_vs_iid():
    from example_cornellbox import build_cornell

    sc = build_cornell(24, 24)
    truth = _render(sc, 128, 999, "r2")
    seeds = (0, 1, 2)
    mse = lambda img: float(((img - truth) ** 2).mean())
    m_iid = np.mean([mse(_render(sc, 8, s, "iid")) for s in seeds])
    m_r2 = np.mean([mse(_render(sc, 8, s, "r2")) for s in seeds])
    # measured ~2.2x at 16 spp on 32x32 (scripts/probe_lds.py); demand a
    # conservative 1.25x so seed luck cannot flake the test
    assert m_r2 < m_iid / 1.25, (m_iid, m_r2)


def test_r2_unbiased_vs_iid():
    from example_cornellbox import build_cornell

    sc = build_cornell(16, 16)
    seeds = range(4)
    a = np.stack([_render(sc, 8, s, "r2") for s in seeds])
    b = np.stack([_render(sc, 8, 100 + s, "iid") for s in seeds])
    # z-test on the whole-image mean: same estimator => same expectation
    se = np.hypot(a.mean((1, 2, 3)).std(ddof=1), b.mean((1, 2, 3)).std(ddof=1))
    se /= np.sqrt(len(seeds))
    diff = abs(a.mean() - b.mean())
    assert diff < max(4 * se, 0.01), (a.mean(), b.mean(), se)


def test_lattice_continues_across_chunks():
    # emissive-only scene: the image depends ONLY on the camera AA samples,
    # so chunked and unchunked renders of one lattice must agree exactly
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=12, screen_height=12)
    sc.add(Sphere(material=Emissive(color=rgb(1, 0.5, 0.2)),
                  center=vec3(0, 0, -3), radius=1.0))
    one = sc.render(8, seed=3, output="linear", batch_size=8)
    four = sc.render(8, seed=3, output="linear", batch_size=2)
    assert np.allclose(one, four, atol=1e-6), np.abs(one - four).max()
    # and restarting the lattice instead (sample0 fixed at 0) would double
    # -count samples 0..1: verify the chunks really draw distinct samples
    two_a = sc.render(2, seed=3, output="linear")
    assert not np.allclose(one, two_a, atol=1e-6)


def test_r2_bits_exact_stratification():
    import jax.numpy as jnp

    from raytracer_tpu.core import lds

    pix = jnp.full((1,), 7, jnp.uint32)
    seed = jnp.int32(42)
    n = 4096
    s = jnp.arange(n, dtype=jnp.uint32)
    u = np.asarray(lds.to_float(lds.r2_bits(pix, s, seed, 0)))
    assert u.shape == (n,) and (u >= 0).all() and (u < 1).all()
    # perfect equidistribution: every length-256 window of [0,1) bins gets
    # n/256 +- small discrepancy hits (i.i.d. would scatter ~ sqrt(16)=4)
    hist, _ = np.histogram(u, bins=256, range=(0.0, 1.0))
    assert hist.min() >= 14 and hist.max() <= 18, (hist.min(), hist.max())
    # distinct pixels get distinct rotations
    u2 = np.asarray(lds.to_float(lds.r2_bits(
        jnp.full((1,), 8, jnp.uint32), s, seed, 0)))
    assert abs(float(u[0]) - float(u2[0])) > 1e-6


def test_sampler_validation():
    from raytracer_tpu.core.camera import Camera, generate_rays
    import jax

    cam = Camera(look_from=(0, 0, 0), look_at=(0, 0, -1),
                 screen_width=4, screen_height=4)
    with pytest.raises(ValueError, match="sampler"):
        generate_rays(jax.random.PRNGKey(0), cam.params(), 4, 4, 1,
                      sampler="sobol")
