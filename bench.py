#!/usr/bin/env python
"""Benchmark: Cornell box path tracing on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": Mrays/s, "unit": "Mrays/s", "vs_baseline": x, ...}

Workload: the reference's Cornell box scene (example_cornellbox.py) at
400x400 x 256 spp — the BASELINE.json target configuration.  Since round 2
`samples_per_pixel` follows reference estimator semantics (each camera
sample fans into diffuse_rays=20 first-bounce paths, diffuse.py:34-83), so
256 spp traces 5120 paths/pixel — the SAME sample count the reference's own
estimator draws at 256 spp.  `value` is path-tracing throughput (rays
actually traced / steady-state wall-clock); `vs_baseline` is the speedup
over the numpy reference's total-ray throughput measured on this host
(scripts/measure_reference.py, BASELINE_MEASURED.json).

Timing: median of REPS identical renders (first render per process pays
executable-load/warmup and is excluded); IQR reported so round-over-round
deltas are attributable.  Set RAYTPU_BENCH_EXAMPLES=0 to skip the
per-example timings (examples 1-4, one render each at 16 spp), and
RAYTPU_BENCH_FEATURES=0 to skip the feature-path block (instancing,
smooth+normal-mapped mesh, env-IS, ODS — one timed render each so every
production render path has a round-over-round number, VERDICT r4 #4).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "examples"))

W, H, SPP = 400, 400, 256
REPS = 5


def _median_iqr(xs):
    xs = sorted(xs)
    n = len(xs)
    med = xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])
    q1 = xs[max(0, n // 4)]
    q3 = xs[min(n - 1, (3 * n) // 4)]
    return med, q3 - q1


def bench_examples():
    """One timed render per example scene (second run in-process)."""
    import importlib

    out = {}
    for name in ("example1", "example2", "example3", "example4"):
        mod = importlib.import_module(name)
        sc = mod.Sc
        spp = 16
        # warm with IDENTICAL settings: return_stats is part of the jit
        # static key, so a stats-less warmup would make the timed render a
        # fresh compile (minutes through the axon tunnel)
        sc.render(samples_per_pixel=spp, batch_size=None, seed=1,
                  return_stats=True)
        # median of 3: a single render can eat a multi-hundred-ms relay
        # stall (observed: example2 1.60 s one-off vs 0.76 s steady)
        walls = []
        for seed in (2, 3, 4):
            t0 = time.time()
            _, stats = sc.render(samples_per_pixel=spp, seed=seed,
                                 return_stats=True)
            walls.append(time.time() - t0)
        wall = sorted(walls)[1]
        out[name] = {"wall_s": round(wall, 3),
                     "spp": spp, "samples": int(stats["samples"]),
                     "mrays_per_s": round(
                         stats["rays_traced"] / wall / 1e6, 1)}
    return out


def bench_mesh_scene():
    """5,120-triangle icosphere scene (scripts/bench_mesh.py shapes: second
    identical render timed, D2H forced)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
    from bench_mesh import build_scene

    import numpy as np

    sc = build_scene(4)
    sc.render(samples_per_pixel=4, seed=0, return_stats=True)
    walls = []
    for seed in (1, 2, 3):
        t0 = time.time()
        img, st = sc.render(samples_per_pixel=4, seed=seed, return_stats=True)
        np.asarray(img)
        walls.append(time.time() - t0)
    return {"wall_s": round(sorted(walls)[1], 3), "tris": 5120, "spp": 4}


def bench_feature_paths():
    """One timed render per non-reference feature path (VERDICT r4 #4):
    instanced meshes, smooth+normal-mapped mesh, env-importance-sampled
    panorama, ODS stereo — the paths test_instances/test_mesh_attrs/
    test_env_is/test_vr prove correct but no bench ever timed.  All four
    ride the jnp wavefront (their gates); each is warm + median of 3."""
    import importlib

    import numpy as np

    def timed(render_fn):
        np.asarray(render_fn(0))                 # compile + warm
        walls = []
        for seed in (1, 2, 3):
            t0 = time.time()
            np.asarray(render_fn(seed))
            walls.append(time.time() - t0)
        return round(sorted(walls)[1], 3)

    out = {}

    # 1) instanced meshes (two-level instancing over the clustered sweep)
    inst = importlib.import_module("example_instances")
    out["instances"] = {
        "wall_s": timed(lambda s: inst.Sc.render(samples_per_pixel=4,
                                                 seed=s, output="linear")),
        "spp": 4, "w": 400, "h": 300}

    # 2) smooth + normal-mapped textured mesh (vertex attrs + tangent frames)
    mt = importlib.import_module("example_mesh_textured")
    bump = 0.5 + 0.3 * np.sin(
        np.linspace(0, 40 * np.pi, 64, dtype=np.float32))[None, :, None]
    nm = np.concatenate([np.broadcast_to(bump, (64, 64, 1)),
                         np.full((64, 64, 1), 0.5, np.float32),
                         np.full((64, 64, 1), 1.0, np.float32)], axis=2)
    mt.ball.set_normalmap(np.ascontiguousarray(nm))
    out["mesh_smooth_normalmap"] = {
        "wall_s": timed(lambda s: mt.Sc.render(samples_per_pixel=4,
                                               seed=s, output="linear")),
        "spp": 4, "w": 400, "h": 300}

    # 3) environment-map importance sampling (alias-table env mixture)
    envm = importlib.import_module("example_env_is")
    env_sc = envm.build_scene()
    out["env_is"] = {
        "wall_s": timed(lambda s: env_sc.render(samples_per_pixel=8,
                                                seed=s, output="linear")),
        "spp": 8, "w": 400, "h": 300}

    # 4) ODS stereo 360 (both eyes, one executable)
    from raytracer_tpu.vr import render_ods
    vrm = importlib.import_module("example_vr")
    vr_sc = vrm.build_scene(256, 128)
    out["ods_stereo"] = {
        "wall_s": timed(lambda s: render_ods(vr_sc, samples_per_pixel=4,
                                             ipd=0.2, seed=s,
                                             output="linear")),
        "spp": 4, "w": 256, "h": 128, "layout": "top-bottom"}

    # 5) bilinear-filtered texture on the record path — the quad-atlas
    # fetch (one gather row per 2x2 tap set, R5 / probe_quad_rows.py 2.61x)
    from raytracer_tpu import (Glossy, Plane, Scene, Sphere, procedural_sky,
                               rgb, vec3)
    from raytracer_tpu.core.compile import compile_scene
    from raytracer_tpu.textures import image
    from raytracer_tpu.textures.procedural import checkerboard

    bl = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    bl.add_Camera(look_from=vec3(0, 0.25, 1), look_at=vec3(0, 0.25, -3),
                  screen_width=400, screen_height=300)
    bl.add_DirectionalLight(Ldir=vec3(0.52, 0.45, -0.5),
                            color=rgb(0.15, 0.15, 0.15))
    bl.add(Sphere(material=Glossy(diff_color=rgb(1.0, 0.572, 0.184),
                                  n=vec3(0.15 + 3.58j, 0.4 + 2.37j,
                                         1.54 + 1.91j),
                                  roughness=0.0, spec_coeff=0.2,
                                  diff_coeff=0.8),
                  center=vec3(-0.5, 0.1, -3.0), radius=0.6,
                  max_ray_depth=3))
    bl.add(Plane(material=Glossy(diff_color=image(checkerboard(64),
                                                  repeat=40.0,
                                                  filter="bilinear"),
                                 n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j),
                                 roughness=0.2, spec_coeff=0.3,
                                 diff_coeff=0.9),
                 center=vec3(0, -0.5, -3.0), width=120.0, height=120.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1),
                 max_ray_depth=3))
    bl.add_Background(procedural_sky(128, 96))
    st, dat = compile_scene(bl)
    assert st.pallas_tex_ok and dat.tex_atlas_quad is not None
    out["bilinear_quad"] = {
        "wall_s": timed(lambda s: bl.render(samples_per_pixel=8, seed=s,
                                            output="linear")),
        "spp": 8, "w": 400, "h": 300}
    return out


def bench_sharded_block(timeout=1800):
    """Sharded-path shape numbers on a virtual 8-CPU mesh (VERDICT r2 #7).

    Runs in a SUBPROCESS: the host device-count flag must be set before jax
    initializes, and this process already owns the TPU backend."""
    import subprocess

    r = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "scripts" /
                             "bench_sharded.py")],
        timeout=timeout, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr.strip().splitlines()[-1] if r.stderr
                           else f"rc={r.returncode}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def _wait_for_backend(attempts=6, probe_timeout=240, sleep_s=300):
    """The axon TPU relay has outages (observed: worker down for hours with
    jax.devices() hanging or raising 'Unable to initialize backend').  Probe
    device init in a SUBPROCESS (a hang cannot be interrupted in-process)
    and retry with backoff so a bench launched mid-outage still succeeds."""
    import subprocess

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if i < attempts - 1:
            print(f"# TPU backend unavailable (attempt {i + 1}/{attempts}); "
                  f"retrying in {sleep_s}s", file=sys.stderr, flush=True)
            time.sleep(sleep_s)
    # proceeding would hang forever in-process; fail loud instead
    raise SystemExit(
        f"TPU backend unavailable after {attempts} probe attempts")


def main():
    from examples.example_cornellbox import build_cornell

    _wait_for_backend()

    sc = build_cornell(W, H)

    # warm up / compile with a single chunk of the same static shape (and
    # the same collect_stats static, or the first timed rep recompiles)
    chunk = max(1, min(SPP * 20, (1 << 22) // (W * H)))
    sc.render(samples_per_pixel=1, batch_size=chunk, seed=1, return_stats=True)

    walls = []
    stats = None
    for rep in range(REPS):
        t0 = time.time()
        img, stats = sc.render(samples_per_pixel=SPP, batch_size=chunk,
                               seed=rep, return_stats=True)
        walls.append(time.time() - t0)
    img.save("/tmp/bench_cornell.png")
    wall, iqr = _median_iqr(walls)

    mrays = stats["rays_traced"] / wall / 1e6

    # baseline anchor: numpy reference total-ray throughput on this host
    vs_baseline = None
    anchor = Path(__file__).parent / "BASELINE_MEASURED.json"
    if anchor.exists():
        base = json.loads(anchor.read_text())
        ref_mrays = base.get("cornell_total_mrays_s") or base.get("mean_total_mrays_s")
        if ref_mrays:
            vs_baseline = mrays / ref_mrays

    result = {
        "metric": "cornell_box_400x400_256spp_path_rays",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(vs_baseline, 1) if vs_baseline else None,
        "wall_s_256spp": round(wall, 3),
        "wall_iqr_s": round(iqr, 3),
        "reps": REPS,
        "rays_traced": int(stats["rays_traced"]),
        "samples": int(stats["samples"]),
        "target_wall_s": 10.0,
    }
    if os.environ.get("RAYTPU_BENCH_EXAMPLES", "1") != "0":
        try:
            result["examples"] = bench_examples()
        except Exception as e:         # examples need assets; never fail bench
            result["examples_error"] = f"{type(e).__name__}: {e}"
        try:
            result["mesh_icosphere"] = bench_mesh_scene()
        except Exception as e:
            result["mesh_error"] = f"{type(e).__name__}: {e}"
        if os.environ.get("RAYTPU_BENCH_FEATURES", "1") != "0":
            try:
                result["feature_paths"] = bench_feature_paths()
            except Exception as e:
                result["feature_paths_error"] = f"{type(e).__name__}: {e}"
        try:
            result["sharded_virtual8"] = bench_sharded_block()
        except Exception as e:
            result["sharded_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
