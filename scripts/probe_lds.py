"""Probe: how much does low-discrepancy sampling cut MSE at equal spp?

Compares `RenderSettings.sampler="iid"` (the reference's estimator:
independent uniforms everywhere) against the default `"r2"` (per-pixel
Cranley-Patterson-rotated rank-1 lattices for camera AA, thin lens, and the
first diffuse bounce — core/lds.py) on the Cornell box against a converged
truth.  CPU.

Measured 2026-08-17 (32x32, 16 spp, 5 seeds, 512-spp truth):
  iid                      MSE 0.001496 +- 0.000365
  r2 camera-only           MSE 0.000741             [intermediate build]
  r2 camera + first bounce MSE 0.000314 +- 0.000020 (4.8x, and 18x less
                                                     seed-to-seed scatter)

Run: python scripts/probe_lds.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "examples"))

from example_cornellbox import build_cornell
from raytracer_tpu.core.integrator import RenderSettings


def main():
    S, spp, seeds = 32, 16, range(5)
    sc = build_cornell(S, S)
    sc.settings = RenderSettings(sampler="r2")
    truth = sc.render(512, seed=999, output="linear")
    mse = lambda img: float(((np.asarray(img) - truth) ** 2).mean())

    results = {}
    for sampler in ("iid", "r2"):
        sc.settings = RenderSettings(sampler=sampler)
        ms = [mse(sc.render(spp, seed=s, output="linear")) for s in seeds]
        results[sampler] = (np.mean(ms), np.std(ms))
        print(f"{sampler:3s} MSE @ {spp}spp: {np.mean(ms):.6f} "
              f"+- {np.std(ms):.6f}")
    print(f"ratio: {results['iid'][0] / results['r2'][0]:.2f}x")


if __name__ == "__main__":
    main()
