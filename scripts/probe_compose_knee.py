#!/usr/bin/env python
"""Would merging example4's two replay rounds pay? (the TF_COMP_LIMIT raise)

example4's thin-film slot composes to a 36M-entry (LUT rows x noise texels)
table — past TF_COMP_LIMIT (2M), so the replay runs the dependent two-round
fetch: 2 gathers x 5.76M rows/chunk from the ~12.6M-word atlas, measured
~8.3 ns/row pipelined (STATUS R4.2).  Raising the limit would halve the row
count but grow the atlas to ~49M words — and the sync-timed gather probe
(probe_gather.py) saw per-row cost rise past ~32M-row tables (13 -> 18
ns/row), which could cancel the halving.

This probe measures the ACTUAL trade pipelined (the production regime —
sync-timed walls are 3-5x off through the axon relay): per chunk of
N=5.76M random rows,
  A: two dependent gathers from a 12.6M-word int32 table   (status quo)
  B: one gather from a 49.2M-word int32 table              (merged round)
interleaved A/B/A/B in one process, CH chunks enqueued back-to-back with a
dependent chain, one device sync at the end.

Decision rule: B pays iff  t_B < t_A - ~10%  (the compose also costs a
one-time 36M-element build per scene compile + 144 MB HBM).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N = 5_760_000            # rows per chunk (example4: 960k rays x 6 bounces)
T_SMALL = 12_600_000     # example4's current packed atlas, words
T_BIG = 49_200_000       # atlas + 36M-entry composed thin-film table
CH = 16                  # chunks per timed pass (example4 = 16 chunks)


def make(T):
    rng = np.random.default_rng(17)
    tab = jnp.asarray(rng.integers(0, 1 << 30, size=T, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, T, size=N, dtype=np.int32))
    return tab, idx


def run_two(tab, idx, carry):
    # dependent two-round fetch: round-2 index depends on round-1 words
    # (the thin-film LUT col depends on the fetched noise texel)
    w1 = jnp.take(tab, (idx + carry) % tab.shape[0], mode="clip")
    idx2 = (idx ^ (w1 & 0xFFFF)) % tab.shape[0]
    w2 = jnp.take(tab, idx2, mode="clip")
    return (w1 & 1023) + (w2 & 1023)


def run_one(tab, idx, carry):
    w = jnp.take(tab, (idx + carry) % tab.shape[0], mode="clip")
    return (w & 1023) + ((w >> 10) & 1023)


def timed(fn, tab, idx, reps=CH):
    f = jax.jit(fn)
    carry = jnp.zeros((N,), jnp.int32)
    np.asarray(f(tab, idx, carry)[:1])            # compile + warm
    t0 = time.time()
    for _ in range(reps):
        carry = f(tab, idx, carry)                # dependent chain
    np.asarray(carry[:1])                         # one sync
    return (time.time() - t0) / reps


def main():
    tab_s, idx = make(T_SMALL)
    tab_b, _ = make(T_BIG)
    print(f"N={N} rows/chunk, {CH} chunks/pass, tables "
          f"{T_SMALL/1e6:.1f}M / {T_BIG/1e6:.1f}M words", flush=True)
    for rep in range(3):
        a = timed(run_two, tab_s, idx)
        b = timed(run_one, tab_b, idx)
        print(f"pass {rep}:  A two-round@{T_SMALL//1_000_000}M "
              f"{a*1e3:7.2f} ms/chunk ({a/N/2*1e9:5.2f} ns/row x2)   "
              f"B one-round@{T_BIG//1_000_000}M {b*1e3:7.2f} ms/chunk "
              f"({b/N*1e9:5.2f} ns/row)   B/A = {b/a:.3f}", flush=True)


if __name__ == "__main__":
    main()
