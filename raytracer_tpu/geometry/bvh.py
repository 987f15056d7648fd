"""Vectorized BVH traversal over the wavefront (jnp, lax.while_loop).

The reference has no acceleration structure at all — its own TriangleMesh
header says ~200 triangles take ~3 minutes and "a BVH is needed"
(sightpy/geometry/triangle_mesh.py:7-9, and the class itself is dead code).
Here large triangle sets get a binned-SAH BVH (built natively at scene
compile, raytracer_tpu/native) traversed on-device: every ray carries its own
node stack; one `lax.while_loop` iteration pops one node per ray, tests its
AABB against the ray's current best hit, and either tests the (<= 4) leaf
triangles or pushes both children.  All fixed shapes; rays that finish idle
until the slowest ray's stack drains.

Triangle tables are permuted at compile time into BVH leaf order, so leaf
ranges index the tables directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.constants import FARAWAY, UPDOWN, UPWARDS

STACK_DEPTH = 64
LEAF_SIZE = 4


def _gather(t, i):
    return jnp.take(t, i, axis=0, mode="clip")


def _tri_hit(geom, tri_id, ox, oy, oz, D):
    """Reference triangle test (triangle.py:36-66) for per-ray triangle ids."""
    n = _gather(geom.tri_normal, tri_id)
    cen = _gather(geom.tri_centroid, tri_id)
    p1 = _gather(geom.tri_p1, tri_id)
    p2 = _gather(geom.tri_p2, tri_id)
    p3 = _gather(geom.tri_p3, tri_id)
    n31 = _gather(geom.tri_n31, tri_id)
    n12 = _gather(geom.tri_n12, tri_id)
    n23 = _gather(geom.tri_n23, tri_id)
    O = jnp.stack([ox, oy, oz], axis=-1)
    ndd = jnp.sum(n * D, axis=-1)
    ndd = jnp.where(ndd == 0.0, ndd + 1e-4, ndd)
    ndco = jnp.sum(n * (cen - O), axis=-1)
    tt = ndco / ndd
    M = O + D * tt[..., None]
    inside = (
        (jnp.sum(n31 * (M - p1), axis=-1) >= 0)
        & (jnp.sum(n12 * (M - p2), axis=-1) >= 0)
        & (jnp.sum(n23 * (M - p3), axis=-1) >= 0)
        & (ndco * ndd > 0)
    )
    t = jnp.where(inside, jnp.abs(tt), FARAWAY)
    orient = jnp.where(ndd < 0, UPWARDS, UPDOWN).astype(jnp.float32)
    return t, orient


def bvh_traverse(O, D, geom, tri_mask=None, stack_depth=STACK_DEPTH):
    """Nearest triangle hit via the BVH.

    Returns (t (N,), orient (N,), local_tri_id (N,)).  `tri_mask` (T,) bool
    optionally restricts which triangles can occlude (shadow rays).

    stack_depth must be >= tree depth + 1 (DFS pushes both children per pop,
    so occupancy is bounded by the deepest path + 1); compile_scene sizes it
    from the measured tree depth so unbalanced SAH trees can never silently
    overflow and drop subtrees.
    """
    n = O.shape[0]
    STACK = int(stack_depth)
    inv_d = 1.0 / D                          # inf on zero components is fine
    ox, oy, oz = O[..., 0], O[..., 1], O[..., 2]

    stack = jnp.zeros((n, STACK), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)            # root pre-pushed at slot 0
    best_t = jnp.full((n,), FARAWAY, O.dtype)
    best_o = jnp.ones((n,), O.dtype)
    best_id = jnp.zeros((n,), jnp.int32)
    rows = jnp.arange(n)

    def cond(state):
        _, sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_o, best_id = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
        sp = jnp.where(active, sp - 1, sp)

        lo = _gather(geom.bvh_lo, node)
        hi = _gather(geom.bvh_hi, node)
        t1 = (lo - O) * inv_d
        t2 = (hi - O) * inv_d
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit_box = active & (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best_t)

        count = _gather(geom.bvh_count, node)
        first = _gather(geom.bvh_first, node)
        is_leaf = count > 0

        # leaf: test up to LEAF_SIZE triangles
        leaf_active = hit_box & is_leaf
        for j in range(LEAF_SIZE):
            tri_id = jnp.clip(first + j, 0, geom.tri_p1.shape[0] - 1)
            valid = leaf_active & (j < count)
            if tri_mask is not None:
                valid = valid & _gather(tri_mask, tri_id)
            t_j, o_j = _tri_hit(geom, tri_id, ox, oy, oz, D)
            better = valid & (t_j < best_t)
            best_t = jnp.where(better, t_j, best_t)
            best_o = jnp.where(better, o_j, best_o)
            best_id = jnp.where(better, tri_id, best_id)

        # internal node hit: push both children
        push = hit_box & ~is_leaf
        left = _gather(geom.bvh_left, node)
        right = _gather(geom.bvh_right, node)
        s0 = jnp.clip(sp, 0, STACK - 1)
        s1 = jnp.clip(sp + 1, 0, STACK - 1)
        stack = stack.at[rows, s0].set(jnp.where(push, right, stack[rows, s0]))
        stack = stack.at[rows, s1].set(jnp.where(push, left, stack[rows, s1]))
        sp = jnp.where(push, jnp.minimum(sp + 2, STACK), sp)
        return stack, sp, best_t, best_o, best_id

    _, _, best_t, best_o, best_id = jax.lax.while_loop(
        cond, body, (stack, sp, best_t, best_o, best_id))
    return best_t, best_o, best_id
