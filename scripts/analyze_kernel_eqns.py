#!/usr/bin/env python
"""Attribute the solid mega-kernel's jaxpr equations to source sections.

The roofline (BASELINE.md) shows the kernel is VPU-issue-bound: device time
tracks the ~12.6k (TILE,128)-shaped vector equations per program, and every
dead-lane-recovery lever measured negative — so the only remaining headline
lever is fewer equations.  This script traces the bench Cornell kernel and
buckets each equation in the pallas_call's jaxpr by the deepest
raytracer_tpu frame in its source traceback (function name), then by
top-level section, so "where do the equations go" has a measured answer.

CPU-only analysis (tracing, no execution).  Prints a JSON summary plus a
per-function table.
"""

import json
import os
import sys
from collections import Counter
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def _frames(eqn):
    """All (file, function, line) frames of an eqn's user traceback."""
    src = eqn.source_info
    tb = src.traceback
    if tb is None:
        return []
    out = []
    for frame in tb.frames:
        line = getattr(frame, "start_line", getattr(frame, "line_num", 0))
        out.append((frame.file_name, frame.function_name, line))
    return out


def _bucket(eqn):
    """Deepest raytracer_tpu frame (function name) owning this eqn."""
    for fname, func, line in _frames(eqn):
        if "raytracer_tpu" in fname:
            mod = fname.rsplit("raytracer_tpu/", 1)[-1]
            return f"{mod}:{func}"
    return "<jax-internal>"


def find_pallas_jaxprs(jaxpr, out=None):
    if out is None:
        out = []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn.params["jaxpr"])
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None:
                find_pallas_jaxprs(inner, out)
    return out


def main():
    from example_cornellbox import build_cornell

    from raytracer_tpu.core.compile import compile_scene
    from raytracer_tpu.core.scene import _render_chunk_pallas
    from raytracer_tpu.core.integrator import RenderSettings

    W = H = 400
    sc = build_cornell(W, H)
    static, data = compile_scene(sc)
    assert static.pallas_ok, "bench Cornell must route the solid kernel"
    settings = sc.settings if hasattr(sc, "settings") else RenderSettings()
    _, _, settings = sc._settings_for_render(False)

    spp = 2

    def fn(key, data, cam):
        L, _ = _render_chunk_pallas(key, data, cam, static, settings, W, H,
                                    spp)
        return L

    closed = jax.make_jaxpr(fn)(
        jax.random.PRNGKey(0), data, sc.camera.params())
    inner = find_pallas_jaxprs(closed.jaxpr)
    if not inner:
        print(json.dumps({"error": "no pallas_call found"}))
        return
    kj = inner[0]

    by_func = Counter()
    by_prim = Counter()
    by_line = Counter()
    total = 0
    # flatten nested jaxprs inside the kernel (scans/conds), though the
    # solid kernel body is python-unrolled and should be flat
    stack = [kj]
    while stack:
        j = stack.pop()
        for eqn in j.eqns:
            total += 1
            by_func[_bucket(eqn)] += 1
            by_prim[eqn.primitive.name] += 1
            if "--lines" in sys.argv:
                for fname, func, line in _frames(eqn):
                    if "raytracer_tpu" in fname:
                        mod = fname.rsplit("raytracer_tpu/", 1)[-1]
                        by_line[f"{mod}:{line}:{func}"] += 1
                        break
            for v in eqn.params.values():
                innerj = getattr(v, "jaxpr", None)
                if innerj is not None:
                    stack.append(innerj)

    # section roll-up by function-name heuristics
    sections = Counter()
    for key, n in by_func.items():
        low = key.lower()
        if "raygen" in low or "lds" in low or "camera" in low:
            sec = "raygen+lds"
        elif "isect" in low or "intersect" in low:
            sec = "intersect"
        elif "rng" in low or "uniform" in low or "mix32" in low:
            sec = "rng"
        elif any(s in low for s in ("diffuse", "glossy", "refr", "fresnel",
                                    "thin", "emiss", "shade", "light",
                                    "env", "sky")):
            sec = "shading"
        elif "jax-internal" in low:
            sec = "jax-internal"
        else:
            sec = "other"
        sections[sec] += n

    print(json.dumps({
        "kernel_eqns_total": total,
        "sections": dict(sections.most_common()),
        "top_primitives": dict(by_prim.most_common(12)),
    }))
    print("\nper-function (top 40):")
    for key, n in by_func.most_common(40):
        print(f"  {n:6d}  {key}")
    if by_line:
        # caveat: jax caches jit tracings of jnp helpers (where, sqrt, ...)
        # — the cached jaxpr's source lines point at the FIRST call site,
        # so helper-heavy lines aggregate other call sites' eqns too
        print("\nper-line (top 60, --lines):")
        for key, n in by_line.most_common(60):
            print(f"  {n:6d}  {key}")


if __name__ == "__main__":
    main()
