#!/usr/bin/env python
"""Automated output-parity report vs the reference renderer.

Renders examples 1-4 + the Cornell box with BOTH engines at a matched
estimator — the reference's own i.i.d. sampling (our `sampler="iid"`), the
reference's shipped spp (our render folds the 20-ray diffuse fan into the
effective sample count exactly as the reference's estimator does,
Scene._diffuse_fan) — and reports per-channel MSE + grayscale SSIM between
the two images, next to the reference's OWN seed-to-seed noise floor (two
independent reference runs).  Parity holds where MSE(ours, ref) is
comparable to MSE(ref, ref'): the remaining difference is sampling noise,
not estimator bias.

The reference (numpy 2-patched copy, scripts/measure_reference.py recipe)
runs in subprocesses; render output is intercepted before its save/show.
Reference scene sources: /root/reference/example{1..4}.py,
example_cornellbox.py; render loop scene.py:71-140.

Usage:  python scripts/parity_report.py [--skip-ref-repeat]
Writes PARITY.json and prints the markdown table for BASELINE.md.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

# Both engines run on the same 1-core host CPU so the wall columns are
# apples-to-apples (r3's PARITY.json timed our side through a COLD remote-TPU
# compile — 246 s of XLA compile tunnel, not compute; VERDICT r3 #4).  Must
# be set before raytracer_tpu/jax import; the axon sitecustomize overrides
# the env var, so render_ours also calls jax.config.update.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from measure_reference import SCRATCH, setup  # noqa: E402

# (module, spp, camera override (W, H) or None)
WORKLOADS = [
    ("example1", 6, None),
    ("example2", 7, None),
    ("example3", 4, None),
    ("example4", 10, None),
    ("example_cornellbox", 20, (100, 100)),
]

_REF_RUNNER = r"""
import sys
import numpy as np

scratch, name, out, spp, W, H = sys.argv[1:7]
sys.path.insert(0, scratch)
import sightpy

orig_render = sightpy.Scene.render


def render(self, samples_per_pixel=None, progress_bar=False, **kw):
    img = orig_render(self, samples_per_pixel=int(spp))
    np.save(out, np.asarray(img))
    raise SystemExit(0)


sightpy.Scene.render = render
if int(W):
    orig_cam = sightpy.Scene.add_Camera

    def add_Camera(self, **kw):
        kw["screen_width"] = int(W)
        kw["screen_height"] = int(H)
        return orig_cam(self, **kw)

    sightpy.Scene.add_Camera = add_Camera

import importlib

try:
    m = importlib.import_module(name)
    if hasattr(m, "main"):
        m.main()
except SystemExit:
    pass
"""


def render_reference(name, spp, size):
    out = tempfile.mktemp(suffix=".npy")
    W, H = size if size else (0, 0)
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-c", _REF_RUNNER, str(SCRATCH), name, out,
         str(spp), str(W), str(H)],
        check=True, cwd=str(SCRATCH),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    arr = np.load(out)
    os.unlink(out)
    return arr, time.time() - t0


def render_ours(name, spp, size):
    """Render our twin example with the reference estimator (iid sampler).

    Returns (image, cold_wall_s, warm_wall_s): cold includes the XLA:CPU
    compile (skipped on repeat reports by the fingerprint-keyed persistent
    cache, raytracer_tpu/__init__.py); warm is the steady-state render wall
    the reference's numpy loop should be compared against.
    """
    import importlib

    import jax

    jax.config.update("jax_platforms", "cpu")
    from raytracer_tpu import RenderSettings

    sys.path.insert(0, str(ROOT / "examples"))
    t0 = time.time()
    if name == "example_cornellbox":
        m = importlib.import_module(name)
        sc = m.build_cornell(*size)
    else:
        m = importlib.import_module(name)
        sc = m.Sc
    sc.settings = RenderSettings(sampler="iid")
    img = np.asarray(sc.render(samples_per_pixel=spp, seed=0))
    cold = time.time() - t0
    t0 = time.time()
    img = np.asarray(sc.render(samples_per_pixel=spp, seed=0))
    return img, cold, time.time() - t0


def mse(a, b):
    a = a.astype(np.float64) / 255.0
    b = b.astype(np.float64) / 255.0
    return [float(np.mean((a[..., k] - b[..., k]) ** 2)) for k in range(3)]


def ssim(a, b, win=7):
    """Grayscale SSIM, uniform window (Wang 2004 constants)."""
    a = (a.astype(np.float64) / 255.0).mean(axis=-1)
    b = (b.astype(np.float64) / 255.0).mean(axis=-1)
    k = np.ones((win, win)) / win ** 2

    def filt(x):
        from numpy.lib.stride_tricks import sliding_window_view

        return sliding_window_view(x, (win, win)).reshape(
            x.shape[0] - win + 1, x.shape[1] - win + 1, -1) @ k.reshape(-1)

    mu_a, mu_b = filt(a), filt(b)
    va = filt(a * a) - mu_a ** 2
    vb = filt(b * b) - mu_b ** 2
    cov = filt(a * b) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))
    return float(s.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-ref-repeat", action="store_true",
                    help="skip the second reference run (no noise floor)")
    args = ap.parse_args()

    setup()
    report = {}
    for name, spp, size in WORKLOADS:
        ref, t_ref = render_reference(name, spp, size)
        ours, t_cold, t_warm = render_ours(name, spp, size)
        assert ref.shape == ours.shape, (name, ref.shape, ours.shape)
        row = {
            "spp": spp,
            "shape": list(ref.shape),
            "mse_rgb": mse(ours, ref),
            "ssim": ssim(ours, ref),
            "ref_wall_s": round(t_ref, 2),
            "ours_wall_cold_s": round(t_cold, 2),
            "ours_wall_s": round(t_warm, 2),
        }
        if not args.skip_ref_repeat:
            ref2, _ = render_reference(name, spp, size)
            row["ref_noise_floor_mse"] = mse(ref, ref2)
            row["ref_self_ssim"] = ssim(ref, ref2)
        report[name] = row
        print(name, json.dumps(row), flush=True)

    (ROOT / "PARITY.json").write_text(json.dumps(report, indent=2))
    print("\n| workload | spp | MSE(ours, ref) | ref noise floor "
          "| SSIM(ours, ref) | ref self-SSIM |")
    print("|---|---|---|---|---|---|")
    for name, row in report.items():
        m = np.mean(row["mse_rgb"])
        nf = np.mean(row.get("ref_noise_floor_mse", [float("nan")]))
        print(f"| {name} | {row['spp']} | {m:.5f} | {nf:.5f} "
              f"| {row['ssim']:.4f} | {row.get('ref_self_ssim', float('nan')):.4f} |")


if __name__ == "__main__":
    main()
