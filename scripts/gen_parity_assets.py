#!/usr/bin/env python
"""Generate committed reference renders for the CI parity check.

Renders each reference workload TWICE with the patched reference engine
(scripts/measure_reference.py recipe) at a small frame, and stores both
runs in tests/parity/<name>.npz.  The reference draws from the unseeded
global numpy RNG, so two runs differ by exactly its sampling noise — the
pair IS the noise floor the CI test (tests/test_parity_quick.py) compares
our render against, without ever running the reference in CI.

Usage: python scripts/gen_parity_assets.py          (takes a few minutes)
"""
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from measure_reference import setup  # noqa: E402
from parity_report import render_reference  # noqa: E402

# (module, spp, (W, H)) — small frames, the reference's shipped spp
WORKLOADS = [
    ("example1", 6, (64, 48)),
    ("example2", 7, (64, 48)),
    ("example3", 4, (64, 48)),
    ("example4", 10, (64, 48)),
    ("example_cornellbox", 10, (64, 64)),
]

OUT = ROOT / "tests" / "parity"


def main():
    setup()
    OUT.mkdir(exist_ok=True)
    for name, spp, size in WORKLOADS:
        ref_a, ta = render_reference(name, spp, size)
        ref_b, tb = render_reference(name, spp, size)
        np.savez_compressed(OUT / f"{name}.npz",
                            ref_a=ref_a.astype(np.uint8),
                            ref_b=ref_b.astype(np.uint8),
                            spp=spp, width=size[0], height=size[1])
        floor = float(np.mean((ref_a / 255.0 - ref_b / 255.0) ** 2))
        print(f"{name}: {ref_a.shape} spp={spp} walls {ta:.1f}/{tb:.1f} s "
              f"noise-floor MSE {floor:.6f}", flush=True)


if __name__ == "__main__":
    main()
