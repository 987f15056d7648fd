"""Probe: per-lane gather from a VMEM-resident table inside a Pallas kernel.

VERDICT r3 #1 wants image-textured scenes (examples 1-3) to route through the
solid mega-kernel with in-kernel texture fetch.  That requires fetching
table[idx] where idx is a (TILE_ROWS, 128) int32 tile of incoherent texel
indices and table is a packed-int32 texture living in VMEM (checkered_floor
is 327x321 = 105k words = 420 KB).

This probe measures which formulations Mosaic legalizes at this toolchain
(jax 0.9.0) and how fast they run on hardware:

  A. jnp.take(table_2d.reshape(-1), flat_idx)   — arbitrary gather
  B. two-step: row dynamic-gather via take_along_axis along sublanes, then
     lane gather  (only if A fails)
  C. the jnp (XLA, non-Pallas) gather as the baseline floor (~13 ns/row,
     scripts/probe_gather.py)

Run on the TPU (default); INTERPRET=1 for the CPU interpreter.

MEASURED (TPU v5e, jax 0.9.0, 2026-08-20): **negative — no in-kernel path.**
  - pallas jnp.take from VMEM: FAILED at lowering with
    "NotImplementedError: Only 2D gather is supported"
    (jax/_src/pallas/mosaic/lowering.py:2482 _gather_lowering_rule).
  - The ONLY gather Mosaic lowers is tpu.dynamic_gather via
    jnp.take_along_axis on 2D operands where operand.shape == indices.shape
    == out.shape (lowering.py:2483-2523): a per-row 128-lane shuffle
    (axis=1) or per-lane 128-sublane shuffle (axis=0) — a 128-entry
    permutation primitive, NOT an arbitrary table lookup.  Two composed
    dynamic_gathers cannot synthesize an arbitrary (row, col) fetch either:
    the second gather's index matrix would need per-element (row, col)
    coupling that collides whenever two lanes of one output row want the
    same column from different rows.
  - Consequence: a VMEM-resident texture table cannot be fetched per-lane
    inside a kernel at this toolchain for any texture larger than 128
    texels (the shipped example textures are 105k+).  The in-kernel
    small-texture fetch (VERDICT r3 #1's proposed mechanism) is therefore
    structurally unavailable; speeding the textured path must restructure
    the record/replay split instead.
  - Control rows: the no-gather pallas baseline ran (100.5 ms), the XLA
    (non-Pallas) jnp.take baseline measured 154 ms for 6.3M fetches
    (~24 ns/fetch, consistent with probe_gather's 13-18 ns/row plus decode
    arithmetic).
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(int(os.environ.get("INTERPRET", "0")))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

TILE_ROWS = 128
T = 327 * 321          # checkered_floor texel count
N = 1 << 20            # rays per launch (one record-path chunk's primaries)
BOUNCES = 6            # fetches per ray in a real kernel


def kernel_take(table_ref, idx_ref, out_ref):
    acc = jnp.zeros((TILE_ROWS, 128), jnp.float32)
    idx = idx_ref[...]
    tab = table_ref[...].reshape(-1)
    for b in range(BOUNCES):
        ix = jnp.remainder(idx + b * 977, T)
        v = jnp.take(tab, ix.reshape(-1), axis=0).reshape(idx.shape)
        acc = acc + v.astype(jnp.float32)
    out_ref[...] = acc


def kernel_baseline(table_ref, idx_ref, out_ref):
    # same arithmetic, no gather: isolates the gather cost
    acc = jnp.zeros((TILE_ROWS, 128), jnp.float32)
    idx = idx_ref[...]
    for b in range(BOUNCES):
        ix = jnp.remainder(idx + b * 977, T)
        acc = acc + ix.astype(jnp.float32)
    out_ref[...] = acc


def run(kernel, name):
    rows = T // 128 + 1
    table = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, T, size=(N // 128, 128)),
        jnp.int32)
    G = (N // 128) // TILE_ROWS
    call = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
        interpret=(pltpu.InterpretParams() if INTERPRET else False),
    )
    f = jax.jit(call)
    try:
        out = np.asarray(f(table, idx))
    except Exception as e:
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:300]}")
        return None
    # timed reps (second render in process; D2H forces completion)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(table, idx))
        ts.append(time.perf_counter() - t0)
    w = float(np.median(ts))
    print(f"{name}: ok  wall={w*1e3:.1f} ms  "
          f"{N * BOUNCES / w / 1e9:.2f} G-fetch/s  "
          f"({w / (N * BOUNCES) * 1e9:.2f} ns/fetch)")
    return out


def run_xla(name):
    tab = jnp.arange(T, dtype=jnp.int32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, T, size=(N,)), jnp.int32)

    @jax.jit
    def f(tab, idx):
        acc = jnp.zeros((N,), jnp.float32)
        for b in range(BOUNCES):
            ix = jnp.remainder(idx + b * 977, T)
            acc = acc + jnp.take(tab, ix, axis=0).astype(jnp.float32)
        return acc

    np.asarray(f(tab, idx))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(tab, idx))
        ts.append(time.perf_counter() - t0)
    w = float(np.median(ts))
    print(f"{name}: wall={w*1e3:.1f} ms  {N * BOUNCES / w / 1e9:.2f} G-fetch/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    a = run(kernel_baseline, "pallas baseline (no gather)")
    b = run(kernel_take, "pallas jnp.take from VMEM")
    if a is not None and b is not None:
        # verify correctness: table[i] == i so take == index sum
        ref = run(kernel_baseline, "recheck")
        print("gather correct:", np.array_equal(b, ref))
    run_xla("XLA jnp.take (non-pallas)")
