#!/usr/bin/env python
"""Microbench: XLA gather throughput on TPU vs gathered-row width.

The replay/compaction design space hinges on one number: what a gather
costs per ROW when each row is K contiguous words (jnp.take on a (T, K)
table).  The measured scalar-gather floor is ~13 ns/element; if wide rows
gather at the same per-ROW cost (bandwidth-bound tail), then permuting
whole state rows (compaction) is cheap and dead-lane recovery becomes a
matter of one partition + narrow relaunch.  If cost scales per ELEMENT,
compaction stays a dead end (matches r2's argsort measurements).

Usage: python scripts/probe_gather.py [N] (default 4M indices)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(n=4_000_000):
    rng = np.random.default_rng(0)

    def bench(T, k):
        idx = jnp.asarray(rng.integers(0, T, size=n, dtype=np.int32))
        tab = jnp.asarray(rng.random((T, k), dtype=np.float32))

        @jax.jit
        def take(tab, idx):
            return jnp.take(tab, idx, axis=0, mode="clip")

        out = take(tab, idx)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = take(tab, idx)
            np.asarray(out.ravel()[:1])
            best = min(best, time.time() - t0)
        ns_row = best / n * 1e9
        gbps = n * k * 4 / best / 1e9
        print(f"T={T:>10d} k={k:4d}  {best*1e3:8.2f} ms  {ns_row:7.2f} ns/row"
              f"  {gbps:7.1f} GB/s", flush=True)

    print("-- table size sweep (k=1): locality dependence", flush=True)
    for T in (1 << 14, 1 << 17, 1 << 20, 1 << 23, 1 << 25, 1 << 27):
        bench(T, 1)
    print("-- row width sweep (T=1M): per-row vs per-element cost", flush=True)
    for k in (1, 2, 4, 8, 16, 32, 128):
        bench(1 << 20, k)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000)
