"""Roofline / utilization statement for the two hot paths (VERDICT r3 #3).

Produces falsifiable "% of peak" numbers for BASELINE.md:

1. **VPU issue-bound peak + per-op costs** — scripts/vpu_peak.py measures
   balanced register-fused expression trees (VPU_PEAK.json): the fma-tree
   rate is the denominator, and swapping the leaf op calibrates the slot
   cost of div/sqrt/exp/sin/select ON THIS CHIP.  (The r4 chained-FMA
   loop is kept as `vmem_stream_*` — its loop-carried values round-trip
   VMEM, so it measures bandwidth, not issue; dividing by it produced the
   invalid 854% utilization VERDICT r4 #2 flagged.)
2. **Solid mega-kernel achieved slot rate** — the Cornell kernel's jaxpr is
   COSTED per primitive (kernel_costed_ops: 1 slot per single-cycle ALU
   eqn, measured slots for div/sqrt/exp/sin, 0 for layout) in the SAME
   units as the denominator (fma = mul+add = 2 slots on both sides, so
   the contraction factor cancels).  achieved = slots x programs /
   kernel device time (xprof); achieved / peak = VPU utilization, an
   upper bound (the numerator assumes no CSE).
3. **Replay achieved gather rate** — example4's replay performs a known
   number of atlas-gather rows per render (2 rounds x B x N); achieved
   rows/s over the replay's device time vs the measured gather-engine
   ceiling (~13 ns/row, scripts/probe_gather.py) = gather utilization.
   (The engine, not HBM, is the wall: 13 ns/row of 4-byte rows is ~0.3 GB/s
   of useful traffic on an ~800 GB/s part.)
4. **Device-busy vs relay-idle wall fraction** for both renders, from the
   xprof device plane.

Writes ROOFLINE.json and prints the BASELINE.md block.
"""
import glob
import json
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "examples"))

import raytracer_tpu  # noqa: E402


# ---------------------------------------------------------------------------
# xplane parsing (tensorflow.tsl proto shipped in this image)
# ---------------------------------------------------------------------------


def parse_xplane(profile_dir):
    """(device_busy_s, trace_wall_s, top_ops {name: s}) from an xprof dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(str(Path(profile_dir) / "**" / "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {profile_dir}"
    space = xplane_pb2.XSpace()
    space.ParseFromString(Path(sorted(paths)[-1]).read_bytes())
    busy = 0.0
    tops = {}
    t_lo, t_hi = float("inf"), 0.0
    for plane in space.planes:
        is_dev = ("TPU" in plane.name and "XLA Op" not in plane.name
                  and plane.name.startswith("/device"))
        if not is_dev:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # the per-core op line: events are non-overlapping executions
            if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ps * 1e-12
                busy += dur
                nm = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                tops[nm] = tops.get(nm, 0.0) + dur
                start = (line.timestamp_ns * 1e-9 + ev.offset_ps * 1e-12)
                t_lo = min(t_lo, start)
                t_hi = max(t_hi, start + dur)
    wall = (t_hi - t_lo) if t_hi > t_lo else 0.0
    return busy, wall, dict(sorted(tops.items(), key=lambda kv: -kv[1])[:12])


# ---------------------------------------------------------------------------
# 1. empirical VPU peak
# ---------------------------------------------------------------------------


def vpu_peak(chains=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 512          # fma ops per element
    ROWS = 512

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        # `chains` INDEPENDENT fma chains: one serial chain measures
        # latency-bound issue (1.17 T lane-ops/s measured at 2 interleaved
        # ops); enough independent streams hide the fma latency and measure
        # the true issue ceiling for the fma/select-heavy code the
        # mega-kernel actually runs.  Measured: 4 chains 0.63 T (latency
        # stalls), sweep below picks the max.
        bs = [a + 0.1 * (j + 1) for j in range(chains)]
        for i in range(K // chains):
            bs = [b * a + 1.0 for b in bs]
        r = bs[0]
        for b in bs[1:]:
            r = r + b
        o_ref[...] = r

    G = 64
    x = jnp.ones((G * ROWS, 128), jnp.float32)
    call = pl.pallas_call(
        kernel, grid=(G,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * ROWS, 128), jnp.float32))
    f = jax.jit(call)
    np.asarray(f(x))
    # one call is ~1 ms of device time — a synchronous timing would be all
    # relay round-trip.  Chain REPS dependent calls (output feeds input, so
    # the device can't elide any) and sync once.
    REPS = 256

    def chained(x):
        for _ in range(REPS):
            x = f(x)
        return x

    np.asarray(chained(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(x))
        ts.append(time.perf_counter() - t0)
    w = float(np.median(ts))
    ops = G * ROWS * 128 * (K // chains * chains) * REPS  # fma ops issued
    return ops / w                         # vector-lane-ops / s


# ---------------------------------------------------------------------------
# 2/3/4. workload traces
# ---------------------------------------------------------------------------


# jaxpr-level slot cost model for the MFU numerator (VERDICT r4 #2).
# Units: "1 slot" = one single-cycle vector ALU op AT THE JAXPR LEVEL — an
# fma counts as mul + add = 2 slots, in BOTH the numerator (kernel jaxpr)
# and the denominator (scripts/vpu_peak.py counts its x*c+d leaves as 2),
# so the unknown fma-contraction factor cancels.  Multi-cycle ops (div,
# sqrt, exp, sin, ...) carry the slot cost MEASURED by vpu_peak.py's
# calibration trees on this chip.  Layout ops that move no lanes are 0.
# Stated limitation: the numerator assumes no CSE across duplicate
# subexpressions (Mosaic does CSE some — R4.11), so achieved slots/s is an
# upper bound and the utilization an upper bound accordingly.
_ZERO_SLOT = {"broadcast_in_dim", "reshape", "squeeze", "transpose",
              "copy", "bitcast_convert_type", "stop_gradient", "iota"}
_DEFAULT_SPECIAL = {"div": 4.0, "rem": 4.0, "sqrt": 4.0, "rsqrt": 4.0,
                    "exp": 6.0, "log": 6.0, "sin": 8.0, "cos": 8.0,
                    "tan": 12.0, "atan2": 12.0}


def _slot_costs():
    """Calibrated per-op slot costs from VPU_PEAK.json (scripts/vpu_peak.py)
    when present, conservative defaults otherwise."""
    costs = dict(_DEFAULT_SPECIAL)
    p = ROOT / "VPU_PEAK.json"
    if p.exists():
        cal = json.loads(p.read_text())
        for op, keys in (("div", ("div",)), ("rem", ("div",)),
                         ("sqrt", ("sqrt",)), ("rsqrt", ("rsqrt",)),
                         ("exp", ("exp",)), ("log", ("exp",)),
                         ("sin", ("sin",)), ("cos", ("sin",)),
                         ("convert_element_type", ("convert",)),
                         ("mask_logical", ("mask",))):
            for k in keys:
                v = cal.get(k, {}).get("slots_per_op")
                if v is not None:
                    costs[op] = float(v)
    return costs


def kernel_costed_ops(static, data, cam_vec, W, H, spp, B, split_k, sampler):
    """(costed_slots, raw_eqns) per slot-program of the solid kernel jaxpr.

    Every eqn whose output is (TILE, 128)-shaped is costed by primitive via
    _slot_costs(); integer_pow y is a log2(y) multiply chain; reductions
    over the tile cost log2(width) combine steps."""
    import math as _m

    from raytracer_tpu.ops import pallas_trace as pt

    costs = _slot_costs()
    seed = jnp.asarray([1, 2, 0], jnp.int32)
    jaxpr = jax.make_jaxpr(
        lambda s: pt.pallas_trace_chunk(s, data, cam_vec, static, W, H, spp,
                                        B, False, split_k, sampler))(seed)

    def eqn_cost(eq):
        name = eq.primitive.name
        if name in _ZERO_SLOT:
            return 0.0
        if name == "integer_pow":
            y = abs(int(eq.params.get("y", 2)))
            return float(max(1, _m.ceil(_m.log2(max(y, 2))) + bin(y).count("1") - 1))
        if name.startswith("reduce_") or name == "reduce_precision":
            return 8.0          # log2(128) combine steps, sublane-parallel
        if name in ("and", "or", "xor", "not"):
            # boolean mask-register ops (i1 operands) run on bit-packed
            # masks — calibrated separately from full-width ALU ops
            try:
                if all(str(getattr(v.aval, "dtype", "")) == "bool"
                       for v in eq.invars if hasattr(v, "aval")):
                    return costs.get("mask_logical", 1.0)
            except Exception:
                pass
        return costs.get(name, 1.0)

    # Global value numbering + CSE over the kernel body: Mosaic CSEs
    # identical subexpressions (measured in R4.11 — merged-group dedup
    # bought far less than its eqn delta), so counting duplicates as
    # executed ops overstates the numerator.  Model it at jaxpr
    # granularity: value-number every eqn by (prim, params, operand value
    # numbers), substituting call operands through jit boundaries so
    # cached jnp-helper jaxprs don't alias distinct call sites; count
    # each distinct computation once.  (Mosaic's real CSE runs
    # post-lowering and may differ in both directions; stated method.)
    state = {"raw": 0.0, "cse": 0.0, "eqns": 0, "next": [0]}
    seen = {}

    def go(jx, argvns, constvns):
        local = {}
        for v, a in zip(jx.invars, argvns):
            local[v] = a
        for v, a in zip(jx.constvars, constvns):
            local[v] = a

        def vnum(v):
            if not hasattr(v, "aval") or hasattr(v, "val"):   # Literal
                return ("lit", str(getattr(v, "val", v)))
            if v not in local:
                # unseen free var (shouldn't happen) — unique number
                local[v] = ("free", state["next"][0])
                state["next"][0] += 1
            return local[v]

        for eq in jx.eqns:
            ins = tuple(vnum(v) for v in eq.invars)
            sub = None
            for name in ("jaxpr", "call_jaxpr"):
                if eq.params.get(name) is not None:
                    sub = eq.params[name]
                    break
            if sub is not None:
                sj = sub.jaxpr if hasattr(sub, "jaxpr") else sub
                cvn = [("const", state["next"][0] + i)
                       for i in range(len(sj.constvars))]
                state["next"][0] += len(sj.constvars)
                outs = go(sj, list(ins), cvn)
                for o, ovn in zip(eq.outvars, outs):
                    local[o] = ovn
                continue
            if eq.params.get("branches") is not None:
                # no lax.cond/scan inside the unrolled kernel body; if one
                # appears, count its eqns without cross-branch CSE
                for q in eq.params["branches"]:
                    qj = q.jaxpr if hasattr(q, "jaxpr") else q
                    go(qj, [("br", state["next"][0] + i)
                            for i in range(len(qj.invars))],
                       [("brc", state["next"][0] + 9000 + i)
                        for i in range(len(qj.constvars))])
                state["next"][0] += 20000
            try:
                pkey = str(sorted(
                    (k, str(v)) for k, v in eq.params.items()
                    if k not in ("jaxpr", "call_jaxpr", "branches")))
            except Exception:
                pkey = str(eq.params)
            key = (eq.primitive.name, pkey, ins)
            fresh = key not in seen
            if fresh:
                seen[key] = ("v", state["next"][0])
                state["next"][0] += 1
            for i, o in enumerate(eq.outvars):
                local[o] = seen[key] + (i,)
            ov = eq.outvars
            if (ov and hasattr(ov[0], "aval")
                    and getattr(ov[0].aval, "shape", ())
                    and ov[0].aval.shape[-1] == 128):
                c = eqn_cost(eq)
                state["raw"] += c
                if fresh:
                    state["cse"] += c
                if c > 0:
                    state["eqns"] += 1
        return [vnum(v) for v in jx.outvars]

    def find_pallas(jx, acc):
        for eq in jx.eqns:
            if eq.primitive.name == "pallas_call":
                acc.append(eq.params["jaxpr"])
            for v in eq.params.values():
                inner = getattr(v, "jaxpr", None)
                if inner is not None:
                    find_pallas(inner, acc)
        return acc

    inner = find_pallas(jaxpr.jaxpr, [])
    assert inner, "no pallas_call in the traced chunk"
    kj = inner[0].jaxpr if hasattr(inner[0], "jaxpr") else inner[0]
    args = [("arg", i) for i in range(len(kj.invars))]
    consts = [("kconst", i) for i in range(len(kj.constvars))]
    go(kj, args, consts)
    return state["cse"], state["raw"], state["eqns"]


def trace_render(sc, spp, profile_dir, **kw):
    sc.render(samples_per_pixel=spp, seed=1, **kw)        # warm
    t0 = time.time()
    img = sc.render(samples_per_pixel=spp, seed=2, profile_dir=profile_dir,
                    **kw)
    np.asarray(img)
    return time.time() - t0


def gather_path_block(name, sc, spp):
    """Gather-row speed-of-light accounting for a record/replay scene.

    The replay's atlas gathers sweep every (bounce, ray) record element:
    round 1 always (x4 taps when any group fetches bilinear), round 2 only
    for thin-film slots past TF_COMP_LIMIT (pallas_record.py Round/fetch).
    rows = taps_r1 * B * N (+ B * N for round 2); utilization compares the
    END-TO-END wall against rows x the measured single-stream gather-engine
    ceiling (probe_gather.py, ~13 ns/row) — "how close is the whole render
    to the time the gather microbenchmark alone needs for this row count".
    """
    from raytracer_tpu.core.compile import compile_scene_cached
    from raytracer_tpu.ops.pallas_record import replay_rounds

    static, _ = compile_scene_cached(sc)
    assert static.pallas_tex_ok, f"{name} does not route the record path"
    _, _, st = sc._settings_for_render(False)
    W, H = sc.camera.screen_width, sc.camera.screen_height
    eff = spp * sc._diffuse_fan() * (1 << st.split_k)
    n = eff * W * H
    B = st.max_bounces
    round2 = replay_rounds(static) == 2
    bil = any(r.bilinear for r in (tuple(static.diffuse_tex)
                                   + tuple(static.glossy_tex)
                                   + tuple(static.emissive_tex)))
    taps = 4 if bil else 1
    rows = (taps + (1 if round2 else 0)) * B * n
    wall = trace_render(sc, spp, f"/tmp/roofline_{name}")
    busy, _, tops = parse_xplane(f"/tmp/roofline_{name}")
    blk = {
        "wall_s": wall, "device_busy_s": busy, "busy_frac": busy / wall,
        "eff_spp": eff, "bounces": B, "replay_rounds": 1 + int(round2),
        "bilinear_taps": taps, "gather_rows": rows,
        "achieved_ns_per_row_of_wall": wall / rows * 1e9,
        "gather_engine_ceiling_ns_per_row": 13.0,
        "gather_utilization_of_wall": (rows * 13e-9) / wall,
        "top_ops_s": tops,
    }
    print(name, json.dumps({k: v for k, v in blk.items()
                            if k != "top_ops_s"}, indent=1, default=float))
    return blk


def main():
    out = {}
    if "--gather-only" in sys.argv:
        # examples 1-3 (single-round record/replay scenes) appended to the
        # existing ROOFLINE.json: is THEIR wall also the gather engine?
        import importlib
        print("devices:", jax.devices())
        p = ROOT / "ROOFLINE.json"
        prev = json.loads(p.read_text()) if p.exists() else {}
        for name in ("example1", "example2", "example3"):
            sc = importlib.import_module(name).Sc
            prev[name] = gather_path_block(name, sc, 16)
        p.write_text(json.dumps(prev, indent=2, default=float))
        print("updated ROOFLINE.json (gather blocks)")
        return
    print("devices:", jax.devices())
    # the r4 chained-FMA microkernel measures the VMEM-STREAMING regime
    # (loop-carried values round-trip VMEM at ~7.2 TB/s) — kept as
    # bandwidth evidence, NOT the MFU denominator (that quotient produced
    # the invalid 854% of r4).  The issue-bound peak + per-op slot costs
    # come from scripts/vpu_peak.py -> VPU_PEAK.json.
    peaks = {c: vpu_peak(c) for c in (4, 8, 16)}
    for c, p in peaks.items():
        print(f"  vmem-stream rate @ {c:2d} chains: {p / 1e12:.2f} T "
              f"lane-ops/s", flush=True)
    out["vmem_stream_lane_ops_per_s"] = max(peaks.values())
    out["vmem_stream_by_chains"] = {str(c): p for c, p in peaks.items()}

    issue_peak = None
    pk = ROOT / "VPU_PEAK.json"
    if pk.exists():
        cal = json.loads(pk.read_text())
        issue_peak = (cal.get("fma_peak_lane_ops_per_s")
                      or cal.get("fma", {}).get("lane_ops_per_s"))
        out["vpu_issue_peak_lane_slots_per_s"] = issue_peak
        out["vpu_slot_costs"] = {k: v.get("slots_per_op")
                                 for k, v in cal.items()
                                 if isinstance(v, dict)
                                 and "slots_per_op" in v}
        print(f"VPU issue-bound peak (vpu_peak.py): "
              f"{issue_peak / 1e12:.2f} T lane-slots/s")
    else:
        print("VPU_PEAK.json missing — run scripts/vpu_peak.py first; "
              "utilization will be omitted, not faked")

    if "--peak-only" in sys.argv:
        # refresh just the peaks + derived utilization in ROOFLINE.json
        p = ROOT / "ROOFLINE.json"
        prev = json.loads(p.read_text())
        prev["vmem_stream_lane_ops_per_s"] = out["vmem_stream_lane_ops_per_s"]
        prev["vmem_stream_by_chains"] = out["vmem_stream_by_chains"]
        prev.pop("vpu_peak_vector_lane_ops_per_s", None)
        prev.pop("vpu_peak_by_chains", None)
        if issue_peak:
            prev["vpu_issue_peak_lane_slots_per_s"] = issue_peak
            prev["vpu_slot_costs"] = out["vpu_slot_costs"]
            if "cornell" in prev and "achieved_lane_slots_per_s" in prev.get(
                    "cornell", {}):
                prev["cornell"]["vpu_utilization"] = (
                    prev["cornell"]["achieved_lane_slots_per_s"] / issue_peak)
        p.write_text(json.dumps(prev, indent=2, default=float))
        print("updated ROOFLINE.json (peaks only)")
        print("cornell vpu_utilization:",
              prev.get("cornell", {}).get("vpu_utilization"))
        return

    # ---- Cornell (solid mega-kernel) ----
    from example_cornellbox import build_cornell
    from raytracer_tpu.core.compile import (compile_scene_cached,
                                            derive_max_bounces,
                                            derive_split_k)
    from raytracer_tpu.ops.pallas_trace import TILE_ROWS

    W = H = 400
    SPP = 64                              # ~1/4 bench: short trace file
    if "--spp" in sys.argv:               # --spp 256 = full bench scale
        SPP = int(sys.argv[sys.argv.index("--spp") + 1])
    sc = build_cornell(W, H)
    static, data = compile_scene_cached(sc)
    _, _, settings = sc._settings_for_render(False)
    B = settings.max_bounces
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    chunk = max(1, min(SPP * 20, (1 << 22) // (W * H)))
    slots, slots_raw, eqns = kernel_costed_ops(
        static, data, cam_vec, W, H, chunk, B,
        settings.split_k, settings.sampler)
    wall = trace_render(sc, SPP, "/tmp/roofline_cornell")
    busy, twall, tops = parse_xplane("/tmp/roofline_cornell")
    n_chunks = -(-SPP * 20 // chunk)
    programs = -(-chunk * W * H // (TILE_ROWS * 128)) * n_chunks
    # the kernel op is the dominant busy entry; use its time if identifiable
    kern_s = max((v for k, v in tops.items()
                  if "custom" in k.lower() or "pallas" in k.lower()),
                 default=busy)
    achieved = slots * programs * TILE_ROWS * 128 / max(kern_s, 1e-9)
    out["cornell"] = {
        "wall_s": wall, "device_busy_s": busy, "busy_frac": busy / wall,
        "kernel_vector_eqns_per_slot_program": eqns,
        "kernel_costed_slots_per_slot_program": slots,
        "kernel_costed_slots_no_cse": slots_raw,
        "kernel_time_s": kern_s,
        "programs": programs,
        # slots/s in the SAME units as the vpu_peak.py denominator (fma =
        # 2 slots, specials at measured cost), after jaxpr-level value
        # numbering/CSE — see kernel_costed_ops for the stated method
        "achieved_lane_slots_per_s": achieved,
        "vpu_utilization": (achieved / issue_peak) if issue_peak else None,
        "top_ops_s": tops,
    }
    print(json.dumps(out["cornell"], indent=1, default=float))

    # ---- example4 (record + replay) ----
    import importlib
    m4 = importlib.import_module("example4")
    sc4 = m4.Sc
    wall4 = trace_render(sc4, 16, "/tmp/roofline_ex4")
    busy4, _, tops4 = parse_xplane("/tmp/roofline_ex4")
    from raytracer_tpu.ops.pallas_record import replay_rounds
    st4, _ = compile_scene_cached(sc4)
    _, _, set4 = sc4._settings_for_render(False)
    eff = 16 * (1 << set4.split_k)
    n = eff * 400 * 300
    B4 = set4.max_bounces
    gather_rows = replay_rounds(st4) * B4 * n   # 2 for example4 (noise->LUT)
    out["example4"] = {
        "wall_s": wall4, "device_busy_s": busy4, "busy_frac": busy4 / wall4,
        "gather_rows": gather_rows,
        "achieved_ns_per_row_of_wall": wall4 / gather_rows * 1e9,
        "gather_engine_ceiling_ns_per_row": 13.0,
        "gather_utilization_of_wall": (gather_rows * 13e-9) / wall4,
        "top_ops_s": tops4,
    }
    print(json.dumps(out["example4"], indent=1, default=float))

    (ROOT / "ROOFLINE.json").write_text(json.dumps(out, indent=2,
                                                   default=float))
    print("wrote ROOFLINE.json")


if __name__ == "__main__":
    main()
