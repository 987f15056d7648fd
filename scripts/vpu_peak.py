#!/usr/bin/env python
"""Issue-bound VPU peak + per-op cost calibration (VERDICT r4 #2).

The r4 roofline's "peak" microkernel was a chained-FMA loop whose
loop-carried values Mosaic streams through VMEM — it measured VMEM
bandwidth (~7.2 TB/s), not issue rate, and dividing the solid kernel's
jaxpr-eqn throughput by it produced the impossible 854% utilization.

This probe measures an ISSUE-bound peak instead: each kernel statement is
ONE wide balanced expression tree over a resident tile — P independent
leaves (x*c_j + d_j, distinct constants so nothing CSEs or folds) combined
by a balanced product tree — so Mosaic register-fuses the whole statement
(BASELINE.md: fusion happens inside expression trees) and VMEM traffic is
2 tile accesses per ~3P ops.  Constants keep values ~1.0 (no overflow).

It then calibrates the RELATIVE cost of the expensive ops the solid kernel
uses (div, sqrt/rsqrt, exp, sin/cos, select) by swapping the leaf op and
comparing measured rates — giving scripts/roofline.py a per-primitive cost
table whose numerator and denominator are in the SAME units (measured
vector-op slots), so utilization lands in (0, 1] and a reader can falsify
it by rerunning this script.

Output: one JSON line with lane-ops/s peaks per op mix.

Usage: python scripts/vpu_peak.py [reps] [grid] [statements]
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

TILE = (128, 128)
LANES = TILE[0] * TILE[1]
P = 32          # leaves per statement tree


def _tree_reduce(vals):
    """Balanced product tree (max ILP, depth log2)."""
    while len(vals) > 1:
        nxt = []
        for i in range(0, len(vals) - 1, 2):
            nxt.append(vals[i] * vals[i + 1])
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return vals[0]


def _leaves(x, op):
    """P independent leaves; ops per leaf depends on `op`."""
    rng = np.random.default_rng(11)
    cs = 1.0 + 0.01 * rng.standard_normal(P)
    ds = 0.01 * rng.standard_normal(P)
    out = []
    for j in range(P):
        c, d = float(cs[j]), float(ds[j])
        if op == "fma":                       # 2 ops
            out.append(x * c + d)
        elif op == "div":                     # 1 div + 1 add
            out.append(c / (x + (2.0 + d)))   # x ~1 -> arg ~3, leaf ~0.33
        elif op == "sqrt":                    # 1 sqrt + 1 mul
            out.append(jnp.sqrt(x * (c * c)))
        elif op == "rsqrt":
            out.append(jax.lax.rsqrt(x * (c * c)))
        elif op == "exp":                     # 1 exp + 1 mul
            out.append(jnp.exp((x - 1.0) * c))
        elif op == "sin":
            out.append(1.0 + 0.1 * jnp.sin(x * c + d))
        elif op == "select":                  # 1 cmp + 1 select + 1 add
            out.append(jnp.where(x > c, x + d, c + d))
        elif op == "convert":                 # 2 converts + 3 muls + 1 add
            iv = ((x * c + d) * 256.0).astype(jnp.int32)
            out.append(iv.astype(jnp.float32) * (1.0 / 256.0))
        elif op == "mask":                    # 2 cmps + 2 mask-ands + select
            m = (x > c) & (x < c + 0.5) & (x > d)
            out.append(jnp.where(m, x, c))
        else:
            raise ValueError(op)
    return out


# ops-per-statement accounting (vector-op slots per element, counting each
# transcendental as ONE slot here — the RELATIVE rate vs fma gives its
# true slot cost)
_OPS_PER_LEAF = {"fma": 2, "div": 2, "sqrt": 2, "rsqrt": 2, "exp": 2,
                 "sin": 4, "select": 3, "convert": 6, "mask": 6}
# how many of those leaf ops are the special op being calibrated
_N_SPECIAL = {"convert": 2, "mask": 2}


def make_kernel(op, statements):
    def kernel(x_ref, o_ref):
        y = x_ref[...]
        for s in range(statements):
            t = _tree_reduce(_leaves(y, op))
            # renormalize toward 1 so long statement chains stay finite
            # (2 extra ops, counted in ops_el)
            y = 1.0 + (t - 1.0) * 0.125
        o_ref[...] = y
    return kernel


def measure(op, reps, grid, statements):
    kernel = make_kernel(op, statements)
    x = jnp.ones((TILE[0], TILE[1]), jnp.float32) * 1.0001
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(TILE, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(TILE, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(TILE, jnp.float32),
    )
    f = jax.jit(lambda x: call(x).sum())
    np.asarray(f(x))                                  # compile + warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    # per statement: P leaves * ops/leaf + (P-1) tree muls + 2 renorm ops
    ops_el = statements * (P * _OPS_PER_LEAF[op] + (P - 1) + 2)
    lane_ops = grid * LANES * ops_el
    return lane_ops / med, med, ops_el


def make_chain_kernel(K, D, statements):
    """K independent fma chains of depth D per statement, summed — ILP=K
    sustained at every tree level (the product tree's ILP narrows to 1 at
    its root, which stalls issue near the end of each statement)."""
    rng = np.random.default_rng(7)
    cs = 1.0 + 0.01 * rng.standard_normal((K, D))
    ds = 0.01 * rng.standard_normal((K, D))

    def kernel(x_ref, o_ref):
        y = x_ref[...]
        for s in range(statements):
            chains = []
            for k in range(K):
                v = y
                for d in range(D):
                    v = v * float(cs[k, d]) + float(ds[k, d])
                chains.append(v)
            t = _tree_reduce_add(chains)
            y = 1.0 + (t * (1.0 / K) - 1.0) * 0.125
        o_ref[...] = y
    return kernel, statements * (K * D * 2 + (K - 1) + 3)


def _tree_reduce_add(vals):
    while len(vals) > 1:
        nxt = []
        for i in range(0, len(vals) - 1, 2):
            nxt.append(vals[i] + vals[i + 1])
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return vals[0]


def measure_kernel(kernel, ops_el, reps, grid):
    x = jnp.ones((TILE[0], TILE[1]), jnp.float32) * 1.0001
    call = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(TILE, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(TILE, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(TILE, jnp.float32),
    )
    f = jax.jit(lambda x: call(x).sum())
    np.asarray(f(x))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    return grid * LANES * ops_el / med, med


def main(reps=7, grid=4096, statements=64):
    out = {"P": P, "grid": grid, "statements": statements}
    # fma peak = max over tree/chain shapes (each shape has a different
    # ILP-vs-depth profile; the ceiling is whichever issues best)
    best = None
    for K, D in ((8, 8), (16, 8), (16, 16), (32, 4)):
        kern, ops_el = make_chain_kernel(K, D, statements)
        rate, med = measure_kernel(kern, ops_el, reps, grid)
        out[f"fma_chains_{K}x{D}"] = {"lane_ops_per_s": rate,
                                      "wall_ms": med * 1e3}
        best = max(best or 0.0, rate)
    base = None
    for op in ("fma", "select", "div", "sqrt", "rsqrt", "exp", "sin",
               "convert", "mask"):
        rate, med, ops_el = measure(op, reps, grid, statements)
        out[op] = {"lane_ops_per_s": rate, "wall_ms": med * 1e3,
                   "ops_per_element": ops_el}
        if op == "fma":
            base = rate
            best = max(best or 0.0, rate)
            out["fma_peak_lane_ops_per_s"] = best
        else:
            # slot cost of the special op relative to a 1-slot ALU op:
            # solve rate ratio for the per-leaf extra cost
            ns = _N_SPECIAL.get(op, 1)
            n_1slot = P * (_OPS_PER_LEAF[op] - ns) + (P - 1) + 2
            per_stmt_slots_eq = base / rate * (P * _OPS_PER_LEAF["fma"]
                                               + (P - 1) + 2)
            extra = (per_stmt_slots_eq - n_1slot) / (P * ns)
            out[op]["slots_per_op"] = round(max(extra, 0.0), 2)
    print(json.dumps(out))
    (Path(__file__).resolve().parent.parent / "VPU_PEAK.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]))
