"""Batched ray-primitive intersection kernels (jnp, TPU-friendly).

The reference iterates a Python list of collider objects and intersects the
whole ray bundle against each one (sightpy/ray.py:124, one numpy pass per
collider).  Here every primitive *type* is a struct-of-arrays table and one
fused kernel intersects all instances of the type against all rays at once,
producing a (num_objects, num_rays) distance matrix; the nearest-hit reduce
is a single argmin.  No Python-level per-object loop survives tracing.

Shapes: rays are (N, 3); per-type object tables are (M, ...) arrays; outputs
are (M, N) distances (FARAWAY on miss) and (M, N) orientations (+1 enter /
-1 exit, matching UPWARDS/UPDOWN in the reference sphere.py:44-52,
plane.py:79-90, cuboid.py:129-139, triangle.py:57-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.safemath import safe_sqrt
from ..utils.constants import FARAWAY, UPDOWN, UPWARDS


def intersect_spheres(O, D, center, radius):
    """Sphere intersection (reference sphere.py:26-52).

    Uses the numerically stable perpendicular-distance form of the quadratic
    (important in float32: the reference's b^2-4c form cancels catastrophically
    at Cornell-box coordinate scales; it survives only because numpy is f64).
    """
    oc = O[None, :, :] - center[:, None, :]                 # (M, N, 3)
    tca = -jnp.sum(D[None, :, :] * oc, axis=-1)             # (M, N)
    # perpendicular vector from center to the ray at closest approach
    perp = oc + tca[..., None] * D[None, :, :]
    d2 = jnp.sum(perp * perp, axis=-1)
    r2 = (radius * radius)[:, None]
    disc = r2 - d2
    sq = safe_sqrt(disc)   # grad-safe: missed rays (disc <= 0) get 0, not NaN
    h0 = tca - sq
    h1 = tca + sq
    h = jnp.where((h0 > 0) & (h0 < h1), h0, h1)
    # orientation from the sign of N.D at the hit point
    M_point = O[None, :, :] + D[None, :, :] * h[..., None]
    NdotD = jnp.sum((M_point - center[:, None, :]) * D[None, :, :], axis=-1)
    valid = (disc > 0) & (h > 0) & (NdotD != 0)
    t = jnp.where(valid, h, FARAWAY)
    orient = jnp.where(NdotD < 0, UPWARDS, UPDOWN).astype(jnp.float32)
    return t, orient


def intersect_planes(O, D, center, normal, u_axis, v_axis, half_w, half_h):
    """Finite-rectangle intersection (reference plane.py:57-90)."""
    NdotD = jnp.sum(normal[:, None, :] * D[None, :, :], axis=-1)     # (M, N)
    NdotD = jnp.where(NdotD == 0.0, NdotD + 0.0001, NdotD)
    NdotC_O = jnp.sum(normal[:, None, :] * (center[:, None, :] - O[None, :, :]), axis=-1)
    t = NdotC_O / NdotD
    M_point = O[None, :, :] + D[None, :, :] * t[..., None]
    M_C = M_point - center[:, None, :]
    u = jnp.sum(u_axis[:, None, :] * M_C, axis=-1)
    v = jnp.sum(v_axis[:, None, :] * M_C, axis=-1)
    hit_inside = (
        (jnp.abs(u) <= half_w[:, None])
        & (jnp.abs(v) <= half_h[:, None])
        & (NdotC_O * NdotD > 0)
    )
    t = jnp.where(hit_inside, jnp.abs(t), FARAWAY)
    orient = jnp.where(NdotD < 0, UPWARDS, UPDOWN).astype(jnp.float32)
    return t, orient


def intersect_boxes(O, D, basis, lb_local, rt_local):
    """Oriented-box slab test in the box's local basis (reference cuboid.py:105-139).

    basis: (M, 3, 3) with *rows* = box axes (world->local transform).
    lb_local / rt_local: (M, 3) box corners expressed in the local basis.
    """
    # world -> local: x_local[i] = basis[i, :] . x_world
    O_l = jnp.einsum("mij,nj->mni", basis, O)
    D_l = jnp.einsum("mij,nj->mni", basis, D)
    dirfrac = 1.0 / D_l
    t_lo = (lb_local[:, None, :] - O_l) * dirfrac               # (M, N, 3)
    t_hi = (rt_local[:, None, :] - O_l) * dirfrac
    tmin = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    tmax = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    miss = (tmax < 0) | (tmin > tmax)
    inside = tmin < 0
    t = jnp.where(miss, FARAWAY, jnp.where(inside, tmax, tmin))
    orient = jnp.where(inside, UPDOWN, UPWARDS).astype(jnp.float32)
    return t, orient


def intersect_discs(O, D, center, normal, r_out, r_in):
    """Disc / annulus intersection (beyond the reference): the rectangle
    test of intersect_planes with a radial band check instead of the
    half-width bounds."""
    NdotD = jnp.sum(normal[:, None, :] * D[None, :, :], axis=-1)      # (M, N)
    NdotD = jnp.where(NdotD == 0.0, NdotD + 0.0001, NdotD)
    NdotC_O = jnp.sum(normal[:, None, :]
                      * (center[:, None, :] - O[None, :, :]), axis=-1)
    t = NdotC_O / NdotD
    M_point = O[None, :, :] + D[None, :, :] * t[..., None]
    M_C = M_point - center[:, None, :]
    rho2 = jnp.sum(M_C * M_C, axis=-1)
    hit = ((rho2 <= (r_out * r_out)[:, None])
           & (rho2 >= (r_in * r_in)[:, None])
           & (NdotC_O * NdotD > 0))
    t = jnp.where(hit, jnp.abs(t), FARAWAY)
    orient = jnp.where(NdotD < 0, UPWARDS, UPDOWN).astype(jnp.float32)
    return t, orient


def intersect_cylinders(O, D, center, axis, u_axis, v_axis, radius, half_h,
                        capped):
    """Finite (optionally capped) cylinder intersection (beyond the
    reference).  Solved in each cylinder's local frame (x along u_axis, z
    along v_axis, y along axis); every intermediate is a 2D (M, N) plane.
    Orientation comes from the local surface normal's sign against the ray
    (UPWARDS entering / UPDOWN exiting, like the sphere)."""
    def ldot(a, X):
        # (M, 3) frame rows . (N, 3) world vectors -> (M, N)
        return jnp.sum(a[:, None, :] * X[None, :, :], axis=-1)

    OC = O  # broadcast against per-object centers inside ldot terms
    ox = ldot(u_axis, OC) - jnp.sum(u_axis * center, axis=-1)[:, None]
    oy = ldot(axis, OC) - jnp.sum(axis * center, axis=-1)[:, None]
    oz = ldot(v_axis, OC) - jnp.sum(v_axis * center, axis=-1)[:, None]
    dx = ldot(u_axis, D)
    dy = ldot(axis, D)
    dz = ldot(v_axis, D)

    r2 = (radius * radius)[:, None]
    hh = half_h[:, None]
    cap_on = (capped > 0.5)[:, None]

    # side surface: quadratic in the (x, z) plane
    a = dx * dx + dz * dz
    a_s = jnp.where(a < 1e-12, 1e-12, a)
    hb = ox * dx + oz * dz
    c = ox * ox + oz * oz - r2
    disc = hb * hb - a_s * c
    sq = safe_sqrt(disc)
    t0 = (-hb - sq) / a_s
    t1 = (-hb + sq) / a_s
    side_ok = disc > 0

    def side_valid(t):
        y = oy + dy * t
        return side_ok & (t > 0) & (jnp.abs(y) <= hh)

    # cap discs at y = ±half_h
    dy_s = jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)

    def cap_t(y_plane):
        t = (y_plane - oy) / dy_s
        x = ox + dx * t
        z = oz + dz * t
        valid = cap_on & (t > 0) & (x * x + z * z <= r2)
        return t, valid

    t_top, v_top = cap_t(hh)
    t_bot, v_bot = cap_t(-hh)

    far = jnp.float32(FARAWAY)
    cands = [jnp.where(side_valid(t0), t0, far),
             jnp.where(side_valid(t1), t1, far),
             jnp.where(v_top, t_top, far),
             jnp.where(v_bot, t_bot, far)]
    t = cands[0]
    for cand in cands[1:]:
        t = jnp.minimum(t, cand)

    # orientation from the local normal at the winning hit
    x = ox + dx * t
    y = oy + dy * t
    z = oz + dz * t
    rho_hat = safe_sqrt((x * x + z * z) / r2)
    is_cap = cap_on & (jnp.abs(y) / hh >= rho_hat)
    # N_local . D_local — cap: sign(y) * dy; side: (x, 0, z) . d / rho
    nd = jnp.where(is_cap, jnp.sign(y) * dy, x * dx + z * dz)
    orient = jnp.where(nd < 0, UPWARDS, UPDOWN).astype(jnp.float32)
    return t, orient


def intersect_triangles(O, D, p1, normal, centroid, n31, n12, n23, p2, p3):
    """Triangle intersection via edge-normal inside tests (reference triangle.py:36-66).

    Every intermediate is a 2D (M, N) plane: triangles in sublanes, rays in
    lanes.  The textbook vec3 form creates (M, N, 3) temporaries whose minor
    dim of 3 pads to 128 lanes on TPU — a 42x memory/VPU blowup that capped
    the flat sweep at ~2.7 G tri-tests/s.  Expanding the point-in-edge test
    n·(O + t·D − p) = (n·O − n·p) + t·(n·D) turns the whole sweep into six
    rank-1 dot planes plus a short (M, N) elementwise epilogue.
    """
    Ox, Oy, Oz = O[:, 0][None, :], O[:, 1][None, :], O[:, 2][None, :]
    Dx, Dy, Dz = D[:, 0][None, :], D[:, 1][None, :], D[:, 2][None, :]

    def dots(n):
        """(M, 3) normals -> (O·n, D·n), each (M, N)."""
        nx, ny, nz = n[:, 0][:, None], n[:, 1][:, None], n[:, 2][:, None]
        return nx * Ox + ny * Oy + nz * Oz, nx * Dx + ny * Dy + nz * Dz

    n_dot_o, n_dot_d = dots(normal)
    ndd = jnp.where(n_dot_d == 0.0, n_dot_d + 0.0001, n_dot_d)
    nc = jnp.sum(normal * centroid, axis=-1)[:, None]      # (M, 1)
    ndco = nc - n_dot_o
    t = ndco / ndd

    def edge_ok(n_edge, p_anchor):
        a_o, a_d = dots(n_edge)
        e = jnp.sum(n_edge * p_anchor, axis=-1)[:, None]   # (M, 1)
        return (a_o - e) + t * a_d >= 0

    hit_inside = (edge_ok(n31, p1) & edge_ok(n12, p2) & edge_ok(n23, p3)
                  & (ndco * ndd > 0))
    t = jnp.where(hit_inside, jnp.abs(t), FARAWAY)
    orient = jnp.where(ndd < 0, UPWARDS, UPDOWN).astype(jnp.float32)
    return t, orient


def _tri_tables(geom):
    return (geom.tri_p1, geom.tri_normal, geom.tri_centroid, geom.tri_n31,
            geom.tri_n12, geom.tri_n23, geom.tri_p2, geom.tri_p3)


# --- two-level clustered sweep ---------------------------------------------
# Triangles are permuted into SAH-BVH leaf order at compile time and grouped
# into fixed-size clusters; compile_scene stores one inflated AABB per cluster
# (geom.tri_cl_lo/hi).  The sweep then runs ray-tile x cluster: a cheap slab
# test against the cluster AABB decides (per tile, via lax.cond — a real
# branch under scan on TPU) whether the B x R triangle sweep runs at all.
# Spatially coherent tiles (primary rays are pixel-major; shadow rays point
# at the same light) skip most (tile, cluster) pairs, turning the O(T x N)
# flat sweep into O(touched pairs) — the hierarchy the reference wished for
# (triangle_mesh.py:7-9) in a form the VPU likes: no per-ray stacks, no
# divergence, still 2D lane-friendly planes inside each pair.

TRI_CLUSTER_SIZE = 256     # triangles per cluster (AABB granularity)
# measured knob sweep (20k-tri icosphere, interleaved in-process medians):
# 128: 0.66s  256: 0.66s  512: 0.89s  1024: 0.97s; spread scene 256 == 512
RAY_TILE = 32768           # rays per tile in the clustered sweep
# (8192 measured worse: more cond/launch overhead than extra skips recover)


def _ray_tiles(O, D, aux=None):
    """Reshape rays to (nt, R, 3) tiles; padded rays sit at 1e30 so they miss
    every cluster AABB.  aux (per-ray planes) are tiled alongside, padded 0."""
    n = O.shape[0]
    R = min(RAY_TILE, ((n + 255) // 256) * 256)
    nt = -(-n // R)
    pad = nt * R - n
    if pad:
        O = jnp.concatenate([O, jnp.full((pad, 3), 1e30, O.dtype)])
        D = jnp.concatenate([D, jnp.ones((pad, 3), D.dtype)])
        if aux is not None:
            aux = [jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) for a in aux]
    tiles = (O.reshape(nt, R, 3), D.reshape(nt, R, 3))
    if aux is not None:
        tiles = tiles + tuple(a.reshape(nt, R) for a in aux)
    return tiles, n, R


def _cluster_entry(lo, hi, ox, oy, oz, ix, iy, iz):
    """(C, R) conservative entry distance of every ray into every cluster
    AABB; +inf where the ray misses the box.  All-cluster slab tests cost
    C*R*6 FMAs — noise next to the B*R triangle tests they gate."""
    tmin = jnp.full((lo.shape[0], ox.shape[0]), -jnp.inf, ox.dtype)
    tmax = jnp.full_like(tmin, jnp.inf)
    for axis, (o, i) in enumerate(((ox, ix), (oy, iy), (oz, iz))):
        t0 = (lo[:, axis][:, None] - o[None, :]) * i[None, :]
        t1 = (hi[:, axis][:, None] - o[None, :]) * i[None, :]
        tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
        tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
    live = (tmax >= 0) & (tmin <= tmax)
    return jnp.where(live, jnp.maximum(tmin, 0.0), jnp.inf)


def _safe_inv(d):
    eps = jnp.float32(1e-12)
    return 1.0 / jnp.where(jnp.abs(d) < eps, eps, d)


def _inst_ray_tile(geom, c, O_t, D_t):
    """Pull a ray tile into cluster `c`'s instance space (MeshInstances).

    Instance maps are world = R @ (s x) + t: affine, so the object-space ray
    (R^T (O - t) / s, R^T D / s) preserves the t-parameterization — the
    object-space intersection distance IS the world distance, and nearest-hit
    compares against non-instanced geometry stay valid.  No-op (identity
    trace-time branch) when the scene has no instances."""
    if not geom.inst_rot.shape[0]:
        return O_t, D_t
    ii = geom.tri_cl_inst[c]
    R = jax.lax.dynamic_index_in_dim(geom.inst_rot, ii, 0, keepdims=False)
    tr = jax.lax.dynamic_index_in_dim(geom.inst_trans, ii, 0, keepdims=False)
    si = jax.lax.dynamic_index_in_dim(geom.inst_inv_scale, ii, 0,
                                      keepdims=False)
    # R^T x == x @ R for row-vector batches
    return ((O_t - tr) @ R) * si, (D_t @ R) * si


def _clustered_tri_tables(geom):
    """Flat tables padded by one cluster of degenerate rows (zero normals
    always miss), so the fixed-size dynamic_slice from any cluster start
    stays in bounds.  Clusters are (start, AABB) runs of the SAH leaf order
    (compile.py _cluster_runs); rows a slice picks up past a cluster's end
    are real neighboring triangles or the degenerate padding — retesting
    them is idempotent (winner codes are global row indices)."""
    tabs = _tri_tables(geom)
    T = tabs[0].shape[0]
    B = TRI_CLUSTER_SIZE
    C = geom.tri_cl_lo.shape[0]
    padded = tuple(jnp.pad(x, ((0, B), (0, 0))) for x in tabs)
    return padded, B, C, T


def _clustered_nearest(O, D, geom):
    """(t, packed code) per ray; code = tri_index*2 + (orient < 0), -1 = miss.

    Clusters are visited FRONT-TO-BACK per tile (argsort of each cluster's
    nearest possible entry over the tile's rays), so after the first surface
    is found the `entry < best_t` test retires every cluster behind it —
    the occlusion-culling half of a BVH, without per-ray stacks."""
    padded, B, C, _ = _clustered_tri_tables(geom)
    row2 = (jnp.arange(B, dtype=jnp.int32) * 2)[:, None]
    (Ot, Dt), n, R = _ray_tiles(O, D)

    def tile_body(_, tile):
        O_t, D_t = tile
        ox, oy, oz = O_t[:, 0], O_t[:, 1], O_t[:, 2]
        ix, iy, iz = (_safe_inv(D_t[:, 0]), _safe_inv(D_t[:, 1]),
                      _safe_inv(D_t[:, 2]))
        entry = _cluster_entry(geom.tri_cl_lo, geom.tri_cl_hi,
                               ox, oy, oz, ix, iy, iz)          # (C, R)
        order = jnp.argsort(jnp.min(entry, axis=1))             # (C,)

        def cl_body(state, ci):
            c = order[ci]
            bt, _ = state
            ent = jax.lax.dynamic_index_in_dim(entry, c, 0, keepdims=False)
            live = ent < bt

            def run(s):
                bt, bcode = s
                start = geom.tri_cl_start[c]
                blk = tuple(jax.lax.dynamic_slice(x, (start, 0), (B, 3))
                            for x in padded)
                O_c, D_c = _inst_ray_tile(geom, c, O_t, D_t)
                t, o = intersect_triangles(O_c, D_c, *blk)     # (B, R)
                tm = jnp.min(t, axis=0)
                # winner codes are VIRTUAL object ids (== physical rows when
                # the scene has no MeshInstances)
                code = (geom.tri_cl_virt[c] * 2 + row2) + (o < 0)
                cm = jnp.max(jnp.where(t == tm[None, :], code, -1), axis=0)
                better = tm < bt
                return (jnp.where(better, tm, bt),
                        jnp.where(better, cm, bcode))

            return jax.lax.cond(jnp.any(live), run, lambda s: s, state), None

        init = (jnp.full((R,), FARAWAY, O.dtype),
                jnp.full((R,), -1, jnp.int32))
        state, _ = jax.lax.scan(cl_body, init, jnp.arange(C, dtype=jnp.int32))
        return None, state

    _, (ts, codes) = jax.lax.scan(tile_body, None, (Ot, Dt))
    return ts.reshape(-1)[:n], codes.reshape(-1)[:n]


def _clustered_occluded(O, D, geom, tri_mask, max_dist, hit0):
    """Any-hit over clusters; a cluster is skipped once every ray in the tile
    that could reach it is already occluded (or misses its AABB).  Near
    clusters go first: they occlude the most rays soonest.

    tri_mask is indexed by VIRTUAL triangle id (== physical row when the
    scene has no MeshInstances); each cluster's rows are virtually contiguous
    from tri_cl_virt[c], so one dynamic_slice covers them."""
    padded, B, C, T = _clustered_tri_tables(geom)
    mask = jnp.pad(tri_mask, (0, B))
    (Ot, Dt, mdt, h0t), n, R = _ray_tiles(O, D, aux=[max_dist, hit0])

    def tile_body(_, tile):
        O_t, D_t, md, h0 = tile
        ox, oy, oz = O_t[:, 0], O_t[:, 1], O_t[:, 2]
        ix, iy, iz = (_safe_inv(D_t[:, 0]), _safe_inv(D_t[:, 1]),
                      _safe_inv(D_t[:, 2]))
        entry = _cluster_entry(geom.tri_cl_lo, geom.tri_cl_hi,
                               ox, oy, oz, ix, iy, iz)          # (C, R)
        order = jnp.argsort(jnp.min(entry, axis=1))

        def cl_body(h, ci):
            c = order[ci]
            ent = jax.lax.dynamic_index_in_dim(entry, c, 0, keepdims=False)
            live = (ent < md) & ~h

            def run(h):
                start = geom.tri_cl_start[c]
                blk = tuple(jax.lax.dynamic_slice(x, (start, 0), (B, 3))
                            for x in padded)
                m = jax.lax.dynamic_slice(mask, (geom.tri_cl_virt[c],), (B,))
                O_c, D_c = _inst_ray_tile(geom, c, O_t, D_t)
                t, _ = intersect_triangles(O_c, D_c, *blk)     # (B, R)
                return h | jnp.any((t < md[None, :]) & m[:, None], axis=0)

            return jax.lax.cond(jnp.any(live), run, lambda h: h, h), None

        h, _ = jax.lax.scan(cl_body, h0, jnp.arange(C, dtype=jnp.int32))
        return None, h

    _, hs = jax.lax.scan(tile_body, None, (Ot, Dt, mdt, h0t))
    return hs.reshape(-1)[:n]


def _tri_block_size(n_rays):
    # bound the (block, N) intermediates to ~64M elements: a flat (T, N)
    # sweep at 5k tris x 4M rays would materialize 80+ GB and OOM the chip;
    # keep the block a whole number of 8-row sublane tiles
    return max(128, min(2048, ((1 << 26) // max(n_rays, 1)) & ~7))


def _blocked_tri_scan(O, D, geom, body_reduce, init):
    """lax.scan over triangle blocks; body_reduce((t, o, base), carry).

    Padding rows have zero normals/edges, which fail the ndco*ndd > 0 test
    and therefore always miss.
    """
    tabs = _tri_tables(geom)
    T = tabs[0].shape[0]
    B = _tri_block_size(O.shape[0])
    nb = -(-T // B)
    pad = nb * B - T
    stacked = [jnp.pad(x, ((0, pad), (0, 0))).reshape(nb, B, 3) for x in tabs]

    def body(carry, blk):
        base, state = carry
        t, o = intersect_triangles(O, D, *blk)              # (B, N)
        state = body_reduce(t, o, base, state)
        return (base + B, state), None

    (_, state), _ = jax.lax.scan(body, (jnp.int32(0), init), stacked)
    return state


def _type_blocks(geom, skip_tris=False):
    """Yield (intersect_fn, count) per primitive type, in object-id order."""
    blocks = []
    if geom.sphere_center.shape[0]:
        blocks.append((lambda O, D: intersect_spheres(
            O, D, geom.sphere_center, geom.sphere_radius),
            geom.sphere_center.shape[0]))
    if geom.plane_center.shape[0]:
        blocks.append((lambda O, D: intersect_planes(
            O, D, geom.plane_center, geom.plane_normal, geom.plane_u_axis,
            geom.plane_v_axis, geom.plane_half_w, geom.plane_half_h),
            geom.plane_center.shape[0]))
    if geom.box_basis.shape[0]:
        blocks.append((lambda O, D: intersect_boxes(
            O, D, geom.box_basis, geom.box_lb_local, geom.box_rt_local),
            geom.box_basis.shape[0]))
    # getattr guards: geom-shaped test stubs may predate the disc/cyl tables
    dc = getattr(geom, "disc_center", None)
    if dc is not None and dc.shape[0]:
        blocks.append((lambda O, D: intersect_discs(
            O, D, geom.disc_center, geom.disc_normal, geom.disc_r_out,
            geom.disc_r_in), dc.shape[0]))
    cc = getattr(geom, "cyl_center", None)
    if cc is not None and cc.shape[0]:
        blocks.append((lambda O, D: intersect_cylinders(
            O, D, geom.cyl_center, geom.cyl_axis, geom.cyl_u_axis,
            geom.cyl_v_axis, geom.cyl_radius, geom.cyl_half_h,
            geom.cyl_capped), cc.shape[0]))
    if geom.tri_p1.shape[0] and not skip_tris:
        blocks.append((lambda O, D: intersect_triangles(
            O, D, geom.tri_p1, geom.tri_normal, geom.tri_centroid,
            geom.tri_n31, geom.tri_n12, geom.tri_n23, geom.tri_p2,
            geom.tri_p3), geom.tri_p1.shape[0]))
    return blocks


def nearest_hit(O, D, geom):
    """Fused nearest-hit: (t, orient, obj_id) each (N,).

    Running min across primitive types — never materializes the full
    (num_objects, N) distance matrix (the naive concatenate+argmin costs two
    (O, N) round-trips to HBM per bounce).  Large triangle sets use the
    two-level clustered sweep (tri_cl_* tables).  A per-ray-stack BVH
    traversal was measured >10x slower than the data-parallel sweeps AND
    its while_loop/scatter pattern faults the TPU worker at >=327k tris
    (minimal jnp-only repro: scripts/repro_bvh_minimal.py) — retired.
    """
    n = O.shape[0]
    best_t = jnp.full((n,), FARAWAY, O.dtype)
    best_o = jnp.ones((n,), O.dtype)
    best_id = jnp.zeros((n,), jnp.int32)
    off = 0
    for fn, count in _type_blocks(geom, skip_tris=True):
        t, o = fn(O, D)                           # (M, N)
        am = jnp.argmin(t, axis=0)                # (N,)
        tm = jnp.min(t, axis=0)
        om = jnp.take_along_axis(o, am[None, :], axis=0)[0]
        better = tm < best_t
        best_t = jnp.where(better, tm, best_t)
        best_o = jnp.where(better, om, best_o)
        best_id = jnp.where(better, am.astype(jnp.int32) + off, best_id)
        off += count
    if not geom.tri_p1.shape[0]:
        return best_t, best_o, best_id
    if geom.tri_cl_lo.shape[0]:
        tri_t, tri_code = _clustered_nearest(O, D, geom)
        better = tri_t < best_t
        tri_o = jnp.where(tri_code & 1, UPDOWN, UPWARDS).astype(best_o.dtype)
        best_t = jnp.where(better, tri_t, best_t)
        best_o = jnp.where(better, tri_o, best_o)
        best_id = jnp.where(better, (tri_code >> 1) + off, best_id)
        return best_t, best_o, best_id

    # Winner id + orientation via a packed-code max-reduce over the SAME
    # (B, N) plane the min-reduce consumes.  argmin + take_along_axis here
    # is a per-lane sublane gather that measured 5x slower than the sweep
    # itself (scripts/probe_sweep_parts.py: nearest_hit 4.1 G tests/s vs
    # 21 G for the min-only scan).
    row2 = None

    def reduce_nearest(t, o, base, state):
        nonlocal row2
        if row2 is None:
            row2 = (jnp.arange(t.shape[0], dtype=jnp.int32) * 2)[:, None]
        bt, bcode = state
        tm = jnp.min(t, axis=0)
        code = (base * 2 + row2) + (o < 0)
        cm = jnp.max(jnp.where(t == tm[None, :], code, -1), axis=0)
        better = tm < bt
        return (jnp.where(better, tm, bt), jnp.where(better, cm, bcode))

    tri_t, tri_code = _blocked_tri_scan(
        O, D, geom, reduce_nearest,
        (jnp.full_like(best_t, FARAWAY), jnp.full_like(best_id, -1)))
    better = tri_t < best_t
    tri_o = jnp.where(tri_code & 1, UPDOWN, UPWARDS).astype(best_o.dtype)
    best_t = jnp.where(better, tri_t, best_t)
    best_o = jnp.where(better, tri_o, best_o)
    best_id = jnp.where(better, (tri_code >> 1) + off, best_id)
    return best_t, best_o, best_id


def occluded(O, D, geom, shadow_obj_mask, max_dist):
    """Any-hit test for shadow rays: True where some shadow-casting object
    lies closer than max_dist along D (reference glossy.py:53-59).

    shadow_obj_mask: (num_objects,) bool in global object-id order.
    """
    n = O.shape[0]
    hit = jnp.zeros((n,), bool)
    off = 0
    for fn, count in _type_blocks(geom, skip_tris=True):
        t, _ = fn(O, D)                           # (M, N)
        mask = shadow_obj_mask[off:off + count]
        hit = hit | jnp.any((t < max_dist[None, :]) & mask[:, None], axis=0)
        off += count
    if not geom.tri_p1.shape[0]:
        return hit
    if geom.tri_cl_lo.shape[0]:
        # the triangle portion of the object-id space is VIRTUAL under
        # instancing (longer than the physical tables); it always runs to the
        # end of the mask
        return _clustered_occluded(O, D, geom, shadow_obj_mask[off:],
                                   max_dist, hit)

    B = _tri_block_size(n)
    T = geom.tri_p1.shape[0]
    nb = -(-T // B)
    tri_mask = jnp.pad(shadow_obj_mask[off:off + T], (0, nb * B - T))

    def reduce_occ(t, _o, base, hit):
        m = jax.lax.dynamic_slice(tri_mask, (base,), (B,))
        return hit | jnp.any((t < max_dist[None, :]) & m[:, None], axis=0)

    return _blocked_tri_scan(O, D, geom, reduce_occ, hit)


def intersect_all(O, D, geom):
    """Intersect rays against every object table in `geom`.

    geom is a GeometryTables pytree (core/compile.py).  Returns
    (t, orient), each (num_objects_total, N), with objects ordered
    [spheres, planes, boxes, discs, cylinders, triangles] — the same global
    object ids used by the per-object attribute tables.
    """
    parts_t = []
    parts_o = []
    if geom.sphere_center.shape[0]:
        t, o = intersect_spheres(O, D, geom.sphere_center, geom.sphere_radius)
        parts_t.append(t)
        parts_o.append(o)
    if geom.plane_center.shape[0]:
        t, o = intersect_planes(O, D, geom.plane_center, geom.plane_normal,
                                geom.plane_u_axis, geom.plane_v_axis,
                                geom.plane_half_w, geom.plane_half_h)
        parts_t.append(t)
        parts_o.append(o)
    if geom.box_basis.shape[0]:
        t, o = intersect_boxes(O, D, geom.box_basis, geom.box_lb_local, geom.box_rt_local)
        parts_t.append(t)
        parts_o.append(o)
    dc = getattr(geom, "disc_center", None)
    if dc is not None and dc.shape[0]:
        t, o = intersect_discs(O, D, geom.disc_center, geom.disc_normal,
                               geom.disc_r_out, geom.disc_r_in)
        parts_t.append(t)
        parts_o.append(o)
    cc = getattr(geom, "cyl_center", None)
    if cc is not None and cc.shape[0]:
        t, o = intersect_cylinders(O, D, geom.cyl_center, geom.cyl_axis,
                                   geom.cyl_u_axis, geom.cyl_v_axis,
                                   geom.cyl_radius, geom.cyl_half_h,
                                   geom.cyl_capped)
        parts_t.append(t)
        parts_o.append(o)
    if geom.tri_p1.shape[0]:
        t, o = intersect_triangles(O, D, geom.tri_p1, geom.tri_normal,
                                   geom.tri_centroid, geom.tri_n31,
                                   geom.tri_n12, geom.tri_n23,
                                   geom.tri_p2, geom.tri_p3)
        parts_t.append(t)
        parts_o.append(o)
    if not parts_t:
        n = O.shape[0]
        return (jnp.full((1, n), FARAWAY, O.dtype), jnp.ones((1, n), O.dtype))
    return jnp.concatenate(parts_t, axis=0), jnp.concatenate(parts_o, axis=0)
