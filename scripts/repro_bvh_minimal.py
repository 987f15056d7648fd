#!/usr/bin/env python
"""Geometry-free minimal repro for the BVH-traversal TPU-worker crash.

Round-2 bisection (scripts/repro_200k_crash.py, STATUS.md) isolated the
>=327k-triangle crash to the BVH stack traversal (geometry/bvh.py):
clustered + flat sweeps pass at the same scale, bvh-nearest reliably takes
the worker down with a "kernel fault".  This script reproduces ONLY the
traversal's XLA constructs — a lax.while_loop carrying a (N_rays, STACK)
int32 per-ray stack mutated by data-dependent scatters, popping node ids
that drive gathers into node tables — over a SYNTHETIC complete binary
tree.  No raytracer imports, no triangle math: if this crashes, the fault
is in the compiled while_loop/scatter/gather pattern at scale, not in our
geometry code.

The tree mirrors the 327k-tri case: ~163k nodes (tris/LEAF_SIZE * 2),
depth ~18+, 480k rays, stack depth 64.  Per-ray traversal decisions come
from a hashed (ray, node) bit so push patterns are data-dependent and
incoherent, like real incoherent rays.

Usage (run in its OWN process — a crash kills it; worker needs ~10 min):
  timeout 900 python scripts/repro_bvh_minimal.py [n_rays] [n_leaves] [stack]

Exit 0 + a checksum line = survived.  A relay/worker fault = crash repro.
"""

import sys

import numpy as np


def main(n_rays=480_000, n_leaves=81_920, stack_depth=64):
    import jax
    import jax.numpy as jnp

    # synthetic complete binary tree, heap order: node i has children
    # 2i+1 / 2i+2; leaves are nodes >= n_internal.
    n_internal = n_leaves - 1
    n_nodes = 2 * n_leaves - 1
    print(f"rays={n_rays} nodes={n_nodes} stack={stack_depth}", flush=True)

    left = np.arange(n_nodes, dtype=np.int32) * 2 + 1
    right = left + 1
    is_leaf = left >= n_nodes
    left = np.minimum(left, n_nodes - 1)
    right = np.minimum(right, n_nodes - 1)
    # per-node payload the loop gathers (stands in for bvh_lo/hi AABBs)
    payload = np.random.default_rng(0).standard_normal(
        (n_nodes, 3)).astype(np.float32)

    leftd = jnp.asarray(left)
    rightd = jnp.asarray(right)
    leafd = jnp.asarray(is_leaf)
    payld = jnp.asarray(payload)

    def traverse(seed):
        n = n_rays
        STACK = stack_depth
        stack = jnp.zeros((n, STACK), jnp.int32)
        sp = jnp.ones((n,), jnp.int32)
        acc = jnp.zeros((n,), jnp.float32)
        rows = jnp.arange(n)

        def cond(state):
            _, sp, _ = state
            return jnp.any(sp > 0)

        def body(state):
            stack, sp, acc = state
            active = sp > 0
            top = jnp.maximum(sp - 1, 0)
            node = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
            sp = jnp.where(active, sp - 1, sp)

            pay = jnp.take(payld, node, axis=0, mode="clip")
            acc = acc + jnp.where(active, pay[:, 0], 0.0)

            # data-dependent "hit" decision: hash(ray, node, seed) bit,
            # biased so expected pushed-subtree size stays bounded
            h = (rows.astype(jnp.uint32) * jnp.uint32(2654435761)
                 ^ node.astype(jnp.uint32) * jnp.uint32(2246822519)
                 ^ jnp.uint32(seed))
            h = (h ^ (h >> 15)) * jnp.uint32(2246822519)
            hit = (h & jnp.uint32(0xFFFF)) < jnp.uint32(0x9000)  # p~0.56

            is_lf = jnp.take(leafd, node, axis=0, mode="clip")
            push = active & hit & ~is_lf
            l = jnp.take(leftd, node, axis=0, mode="clip")
            r = jnp.take(rightd, node, axis=0, mode="clip")
            s0 = jnp.clip(sp, 0, STACK - 1)
            s1 = jnp.clip(sp + 1, 0, STACK - 1)
            stack = stack.at[rows, s0].set(jnp.where(push, r, stack[rows, s0]))
            stack = stack.at[rows, s1].set(jnp.where(push, l, stack[rows, s1]))
            sp = jnp.where(push, jnp.minimum(sp + 2, STACK), sp)
            return stack, sp, acc

        _, _, acc = jax.lax.while_loop(cond, body, (stack, sp, acc))
        return acc

    fn = jax.jit(traverse)
    for i in range(3):
        out = np.asarray(fn(i))  # D2H forces completion through the relay
        print(f"rep {i}: checksum {float(out.sum()):.3f}", flush=True)
    print("SURVIVED", flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
