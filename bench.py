#!/usr/bin/env python
"""Benchmark: Cornell box path tracing on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": Mrays/s, "unit": "Mrays/s", "vs_baseline": x}

Workload: the reference's Cornell box scene (example_cornellbox.py) at
400x400 x 256 spp — the BASELINE.json target configuration.  `value` is
path-tracing throughput (rays actually traced / steady-state wall-clock).
`vs_baseline` is the speedup over the numpy reference on this host,
anchored by scripts/measure_reference.py (BASELINE_MEASURED.json); the
reference crashes on this machine's numpy 2.x for the Cornell scene, so the
anchor extrapolates from its working configurations (see BASELINE.md).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "examples"))

W, H, SPP = 400, 400, 256


def main():
    from examples.example_cornellbox import build_cornell

    sc = build_cornell(W, H)

    # warm up / compile with a single chunk of the same static shape
    chunk = max(1, min(SPP, (1 << 22) // (W * H)))
    sc.render(samples_per_pixel=chunk, batch_size=chunk, seed=1)

    # best of 2: host-side dispatch is sensitive to CPU contention on this
    # single-core box; the min is the honest device throughput
    wall = float("inf")
    for rep in range(2):
        t0 = time.time()
        img, stats = sc.render(samples_per_pixel=SPP, batch_size=chunk,
                               seed=rep, return_stats=True)
        wall = min(wall, time.time() - t0)
    img.save("/tmp/bench_cornell.png")

    mrays = stats["rays_traced"] / wall / 1e6

    # baseline anchor: numpy reference primary-ray throughput on this host
    vs_baseline = None
    anchor = Path(__file__).parent / "BASELINE_MEASURED.json"
    if anchor.exists():
        base = json.loads(anchor.read_text())
        ref_mrays = base.get("cornell_total_mrays_s") or base.get("mean_total_mrays_s")
        if ref_mrays:
            vs_baseline = mrays / ref_mrays

    print(json.dumps({
        "metric": "cornell_box_400x400_256spp_path_rays",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
        "wall_s_256spp": round(wall, 3),
        "rays_traced": int(stats["rays_traced"]),
        "samples": int(stats["samples"]),
        "target_wall_s": 10.0,
    }))


if __name__ == "__main__":
    main()
