"""Cheap CI parity check against COMMITTED reference renders (VERDICT r3 #8).

scripts/gen_parity_assets.py renders each reference workload twice with the
patched reference engine at a small frame and commits both runs
(tests/parity/<name>.npz).  Here our engine renders the same workload at the
matched estimator (iid sampler, the reference's shipped spp) and the MSE
against the committed render is compared to the committed run-to-run noise
floor — the reference itself never runs in CI, so the check costs one small
CPU render per workload.

Both images are independent draws of (ideally) the same estimator:
MSE(ours, ref_a) ~= MSE(ref_a, ref_b) when our estimator is unbiased; a
factor-2 violation at these frame sizes means a real estimator/convention
regression (uv flip, falloff change, texture tiling), which is exactly what
the 16x16 goldens were too small to catch.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

PARITY_DIR = Path(__file__).parent / "parity"
WORKLOADS = ["example1", "example2", "example3", "example4",
             "example_cornellbox"]


def _mse(a, b):
    a = a.astype(np.float64) / 255.0
    b = b.astype(np.float64) / 255.0
    return float(np.mean((a - b) ** 2))


@pytest.mark.parametrize("name", WORKLOADS)
def test_parity_quick(name):
    f = PARITY_DIR / f"{name}.npz"
    if not f.exists():
        pytest.skip("no committed reference render "
                    "(run scripts/gen_parity_assets.py)")
    if not Path(os.environ.get("SIGHTPY_ASSETS",
                               "/root/reference/sightpy")).exists():
        pytest.skip("reference assets unavailable")
    z = np.load(f)
    ref_a, ref_b = z["ref_a"], z["ref_b"]
    spp, W, H = int(z["spp"]), int(z["width"]), int(z["height"])

    from raytracer_tpu import RenderSettings

    if name == "example_cornellbox":
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "examples"))
        from example_cornellbox import build_cornell

        sc = build_cornell(W, H)
    else:
        from _examples import load_example

        sc = load_example(name, W, H)
    sc.settings = RenderSettings(sampler="iid")
    ours = np.asarray(sc.render(samples_per_pixel=spp, seed=3))
    assert ours.shape == ref_a.shape, (ours.shape, ref_a.shape)

    floor = _mse(ref_a, ref_b)
    m = _mse(ours, ref_a)
    # equality of estimators predicts m ~= floor; 1.6x + eps covers the
    # chi-square spread of an MSE over ~9k pixels and benign FP drift
    assert m < max(1.6 * floor, 1e-4), (
        f"{name}: MSE(ours, ref) {m:.6f} vs ref noise floor {floor:.6f}")
