#!/usr/bin/env python
"""Probe: can @pl.when skip a fat per-tile bounce body on real TPU?

r2 measured that a lax.cond carrying ~30 tile planes fails Mosaic
legalization (STATUS round-3 notes), killing per-tile early-out for the
kernels' dead bounces.  pl.when + VMEM scratch refs avoids the carry
entirely: state lives in refs, the predicated body only writes.  This toy
mirrors the kernels' shape — ~20 state planes in scratch, 6 python-unrolled
"bounces", each bounce ~60 VPU ops per plane — and times two inputs:
  all-alive  every tile alive every bounce (no skipping possible)
  tail-dead  alive only in bounce 0 (5 of 6 bounces skippable per tile)
A real gap between the two proves both legalization AND actual skipping.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
NPLANES = 20
BOUNCES = 6


def make(kill_after):
    def kernel(x_ref, out_ref, *scratch):
        alive_ref = scratch[0]
        planes = scratch[1:]
        alive_ref[...] = x_ref[...] > 0.0
        for p in planes:
            p[...] = x_ref[...]

        for b in range(BOUNCES):
            any_alive = jnp.any(alive_ref[...])

            @pl.when(any_alive)
            def _(b=b):
                # ~60 transcendental-ish VPU ops over every plane
                acc = jnp.zeros((TILE, 128), jnp.float32)
                for p in planes:
                    v = p[...]
                    v = v * 1.0001 + jnp.sin(v) * 0.25
                    v = v + jnp.sqrt(jnp.abs(v) + 1e-3)
                    p[...] = v
                    acc = acc + v
                # kill lanes after bounce `kill_after` (data-driven via x)
                if b >= kill_after:
                    alive_ref[...] = jnp.zeros((TILE, 128), bool)
                else:
                    alive_ref[...] = alive_ref[...] & (acc == acc)

        out_ref[...] = planes[0][...]

    return kernel


def run(n, kill_after):
    G = -(-n // (TILE * 128))
    x = jnp.ones((G * TILE, 128), jnp.float32)
    scratch = ([pltpu.VMEM((TILE, 128), jnp.bool_)]
               + [pltpu.VMEM((TILE, 128), jnp.float32)] * NPLANES)
    call = pl.pallas_call(
        make(kill_after),
        grid=(G,),
        in_specs=[pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * TILE, 128), jnp.float32),
        scratch_shapes=scratch,
    )
    f = jax.jit(call)
    out = f(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = f(x)
        np.asarray(out.ravel()[:1])
        best = min(best, time.time() - t0)
    return best


def main(n=4_000_000):
    t_all = run(n, kill_after=BOUNCES)   # never killed: all 6 bounces run
    t_tail = run(n, kill_after=1)        # dead after bounce 0: 5 skippable
    t_none = run(n, kill_after=0)        # all 6 skippable: overhead floor
    print(f"all-alive : {t_all*1e3:8.2f} ms")
    print(f"tail-dead : {t_tail*1e3:8.2f} ms")
    print(f"all-dead  : {t_none*1e3:8.2f} ms")
    print(f"speedup   : {t_all/t_tail:5.2f}x  (6x is the ideal ceiling)")
    per_full = t_all / BOUNCES
    per_skip = t_none / BOUNCES
    print(f"per-bounce: full {per_full*1e3:.2f} ms, skipped {per_skip*1e3:.2f}"
          f" ms ({per_skip/per_full*100:.0f}% residual)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000)
