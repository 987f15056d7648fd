"""Hit attribute computation: geometric normals and texture uv per hit.

The reference computes these lazily per Hit object (sightpy/ray.py:111-119)
with per-collider virtual methods.  Here the winning object id (from the
nearest-hit reduce) selects into per-type formulas; each present type is
evaluated masked over the whole wavefront and combined with `where` —
fixed shapes, no divergence.

uv computation is gated by SceneStatic.needs_uv: scenes without any texture /
normal map / LUT sampling (e.g. the Cornell box) skip the transcendental-heavy
uv math entirely.

Object-id layout (must match intersect.nearest_hit):
  [0, S)       spheres
  then planes, boxes, discs, cylinders, and triangles LAST (the triangle
  portion of the id space is virtual under MeshInstances and must stay at
  the end — intersect.occluded slices the shadow mask "from the triangle
  offset to the end").
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather(table, idx):
    return jnp.take(table, idx, axis=0, mode="clip")


def sphere_attrs(P, local_id, geom, need_uv):
    """Normal + spherical uv (reference sphere.py:54-64)."""
    c = _gather(geom.sphere_center, local_id)
    r = _gather(geom.sphere_radius, local_id)
    N = (P - c) / r[..., None]
    if not need_uv:
        return N, None
    phi = jnp.arctan2(N[..., 2], N[..., 0])
    theta = jnp.arcsin(jnp.clip(N[..., 1], -1.0, 1.0))
    u = (phi + jnp.pi) / (2.0 * jnp.pi)
    v = (theta + jnp.pi / 2.0) / jnp.pi
    return N, jnp.stack([u, v], axis=-1)


def plane_attrs(P, local_id, geom, need_uv):
    """Normal + planar uv with uv_shift (reference plane.py:98-105)."""
    N = _gather(geom.plane_normal, local_id)
    if not need_uv:
        return N, None
    c = _gather(geom.plane_center, local_id)
    ua = _gather(geom.plane_u_axis, local_id)
    va = _gather(geom.plane_v_axis, local_id)
    w = _gather(geom.plane_half_w, local_id)
    h = _gather(geom.plane_half_h, local_id)
    shift = _gather(geom.plane_uv_shift, local_id)
    M_C = P - c
    u = (jnp.sum(ua * M_C, axis=-1) / w + 1.0) / 2.0 + shift[..., 0]
    v = (jnp.sum(va * M_C, axis=-1) / h + 1.0) / 2.0 + shift[..., 1]
    return N, jnp.stack([u, v], axis=-1)


def box_attrs(P, local_id, geom, need_uv):
    """Face normal via max-|axis| + 4x3 cube-cross uv.

    Reference cuboid.py:142-187.  Note the reference divides every uv term by
    `width` (not height/length) — correct only for cubes, but replicated here
    because the cube-cross layout (and the SkyBox, which is always a cube)
    depends on it.  The final (u/4, v/3) scaling of Cuboid.get_uv /
    SkyBox.get_uv (cuboid.py:29-32, skybox.py:29-32) is applied here.
    """
    basis = _gather(geom.box_basis, local_id)          # (N, 3, 3) rows = axes
    center = _gather(geom.box_center, local_id)
    whl = _gather(geom.box_whl, local_id)              # (N, 3) width/height/length
    M_C = P - center
    # local coordinates of the hit relative to box center
    P_l = jnp.einsum("nij,nj->ni", basis, M_C)
    absP = jnp.abs(P_l) / whl
    Pmax = jnp.max(absP, axis=-1, keepdims=True)
    N_l = jnp.where(Pmax == absP, jnp.sign(P_l), 0.0)
    # local -> world: columns of inverse basis are the axes = basis rows
    N = jnp.einsum("nji,nj->ni", basis, N_l)
    if not need_uv:
        return N, None

    width = whl[..., 0]
    ax_w_d = P_l[..., 0]   # ax_w . M_C
    ax_h_d = P_l[..., 1]
    ax_l_d = P_l[..., 2]
    s = 2.0 * 0.985 / width

    bottom = (N_l[..., 1] == -1.0)
    top = (N_l[..., 1] == 1.0)
    right = (N_l[..., 0] == 1.0)
    left = (N_l[..., 0] == -1.0)
    front = (N_l[..., 2] == 1.0)
    back = (N_l[..., 2] == -1.0)

    u = jnp.select(
        [bottom, top, right, left, front, back],
        [
            (ax_w_d * s + 1.0) / 2.0 + 1.0,
            (ax_w_d * s + 1.0) / 2.0 + 1.0,
            (ax_l_d * s + 1.0) / 2.0 + 2.0,
            (-ax_l_d * s + 1.0) / 2.0 + 0.0,
            (-ax_w_d * s + 1.0) / 2.0 + 3.0,
            (ax_w_d * s + 1.0) / 2.0 + 1.0,
        ],
        default=0.0,
    )
    v = jnp.select(
        [bottom, top, right, left, front, back],
        [
            (-ax_l_d * s + 1.0) / 2.0 + 0.0,
            (ax_l_d * s + 1.0) / 2.0 + 2.0,
            (ax_h_d * s + 1.0) / 2.0 + 1.0,
            (ax_h_d * s + 1.0) / 2.0 + 1.0,
            (ax_h_d * s + 1.0) / 2.0 + 1.0,
            (ax_h_d * s + 1.0) / 2.0 + 1.0,
        ],
        default=0.0,
    )
    return N, jnp.stack([u / 4.0, v / 3.0], axis=-1)


def disc_attrs(P, local_id, geom, need_uv):
    """Disc/annulus: constant normal + planar uv over the bounding square
    (u_axis/v_axis oriented; u, v in [0, 1] at the rim)."""
    N = _gather(geom.disc_normal, local_id)
    if not need_uv:
        return N, None
    c = _gather(geom.disc_center, local_id)
    ua = _gather(geom.disc_u_axis, local_id)
    va = _gather(geom.disc_v_axis, local_id)
    r = _gather(geom.disc_r_out, local_id)
    M_C = P - c
    u = (jnp.sum(ua * M_C, axis=-1) / r + 1.0) / 2.0
    v = (jnp.sum(va * M_C, axis=-1) / r + 1.0) / 2.0
    return N, jnp.stack([u, v], axis=-1)


def cylinder_attrs(P, local_id, geom, need_uv):
    """Cylinder: side normal radial / cap normal axial, classified by the
    scaled local coordinates (cap wins where |y|/half_h >= rho/r — the same
    rule the intersector's orientation uses).  uv: side = (azimuth,
    height); caps = planar (x, z) over the cap square."""
    c = _gather(geom.cyl_center, local_id)
    ax = _gather(geom.cyl_axis, local_id)
    ua = _gather(geom.cyl_u_axis, local_id)
    va = _gather(geom.cyl_v_axis, local_id)
    r = _gather(geom.cyl_radius, local_id)
    hh = _gather(geom.cyl_half_h, local_id)
    capped = _gather(geom.cyl_capped, local_id) > 0.5
    M_C = P - c
    x = jnp.sum(ua * M_C, axis=-1)
    y = jnp.sum(ax * M_C, axis=-1)
    z = jnp.sum(va * M_C, axis=-1)
    rho = jnp.sqrt(jnp.maximum(x * x + z * z, 1e-20))
    is_cap = capped & (jnp.abs(y) / hh >= rho / r)
    N_side = (x[..., None] * ua + z[..., None] * va) / rho[..., None]
    N_cap = jnp.sign(y)[..., None] * ax
    N = jnp.where(is_cap[..., None], N_cap, N_side)
    if not need_uv:
        return N, None
    u_side = (jnp.arctan2(z, x) + jnp.pi) / (2.0 * jnp.pi)
    v_side = (y / hh + 1.0) / 2.0
    u_cap = (x / r + 1.0) / 2.0
    v_cap = (z / r + 1.0) / 2.0
    u = jnp.where(is_cap, u_cap, u_side)
    v = jnp.where(is_cap, v_cap, v_side)
    return N, jnp.stack([u, v], axis=-1)


def triangle_attrs(P, local_id, geom, need_uv):
    """Triangle normal + uv from barycentric coordinates.

    Flat triangles return the constant face normal and (u, v) = barycentric
    weights of p2, p3 (the reference's Triangle_Collider.get_uv is broken —
    refs undefined attributes, triangle.py:79-83 — so this defines the
    contract).  When the scene carries per-corner vertex attributes
    (TriangleMesh with vn/vt records or smooth=True; tri_vn*/tri_uv* tables
    non-empty), the normal is the barycentric blend of the corner normals
    (smooth shading) and uv the blend of the corner uvs; the compiler fills
    flat triangles' corners so the blend reproduces the flat result exactly.

    Under MeshInstances, `local_id` is a VIRTUAL triangle id: it maps to a
    (physical row, instance) pair via tri_virt_row/tri_virt_inst.  The hit
    point is pulled into the instance's object space for the barycentric
    solve (all vertex tables are object-space there) and the resulting
    normal is rotated back to world — a rotation + uniform scale preserves
    normal directions, so no inverse-transpose is needed.
    """
    instanced = geom.tri_virt_row.shape[0] > 0   # static: trace-time branch
    R = None
    if instanced:
        row = _gather(geom.tri_virt_row, local_id)
        inst = _gather(geom.tri_virt_inst, local_id)
        R = _gather(geom.inst_rot, inst)                    # (N, 3, 3)
        tr = _gather(geom.inst_trans, inst)
        inv_s = _gather(geom.inst_inv_scale, inst)
        # world -> object: x @ R == R^T x for row-vector batches
        P = jnp.einsum("nj,nji->ni", P - tr, R) * inv_s[..., None]
    else:
        row = local_id

    def to_world(N_obj):
        return N_obj if R is None else jnp.einsum("nij,nj->ni", R, N_obj)

    N = _gather(geom.tri_normal, row)
    interp = geom.tri_vn1.shape[0] > 0   # static shape: trace-time branch
    if not (need_uv or interp):
        return to_world(N), None
    p1 = _gather(geom.tri_p1, row)
    p2 = _gather(geom.tri_p2, row)
    p3 = _gather(geom.tri_p3, row)
    e1 = p2 - p1
    e2 = p3 - p1
    d = P - p1
    d11 = jnp.sum(e1 * e1, axis=-1)
    d12 = jnp.sum(e1 * e2, axis=-1)
    d22 = jnp.sum(e2 * e2, axis=-1)
    dp1 = jnp.sum(d * e1, axis=-1)
    dp2 = jnp.sum(d * e2, axis=-1)
    det = jnp.maximum(d11 * d22 - d12 * d12, 1e-20)
    u = (d22 * dp1 - d12 * dp2) / det
    v = (d11 * dp2 - d12 * dp1) / det
    if not interp:
        return to_world(N), jnp.stack([u, v], axis=-1)

    from ..core.safemath import safe_norm

    w1 = (1.0 - u - v)[..., None]
    w2 = u[..., None]
    w3 = v[..., None]
    Ns = (w1 * _gather(geom.tri_vn1, row)
          + w2 * _gather(geom.tri_vn2, row)
          + w3 * _gather(geom.tri_vn3, row))
    N = Ns / safe_norm(Ns, keepdims=True)
    if not need_uv:
        return to_world(N), None
    uv = (w1 * _gather(geom.tri_uv1, row)
          + w2 * _gather(geom.tri_uv2, row)
          + w3 * _gather(geom.tri_uv3, row))
    return to_world(N), uv


def hit_attributes(P, obj_id, geom, static, force_uv=False):
    """Geometric normal (N, 3) and uv (N, 2) for each ray's winning object.

    `static` provides the per-type counts (SceneStatic); types not present in
    the scene cost nothing (Python-level skip at trace time).  When
    static.needs_uv is False the returned uv is all-zeros and costs nothing
    (force_uv=True overrides, for callers like first_hit that always want uv).
    """
    S, Pn, B, T = static.n_spheres, static.n_planes, static.n_boxes, static.n_tris
    need_uv = static.needs_uv or force_uv
    normal = jnp.zeros_like(P)
    uv = jnp.zeros(P.shape[:-1] + (2,), P.dtype)

    blocks = [(S, sphere_attrs), (Pn, plane_attrs), (B, box_attrs),
              (static.n_discs, disc_attrs),
              (static.n_cylinders, cylinder_attrs),
              (T, triangle_attrs)]
    off = 0
    for count, fn in blocks:
        if count:
            m = (obj_id >= off) & (obj_id < off + count)
            n_t, uv_t = fn(P, jnp.clip(obj_id - off, 0, count - 1), geom, need_uv)
            normal = jnp.where(m[..., None], n_t, normal)
            if need_uv:
                uv = jnp.where(m[..., None], uv_t, uv)
            off += count
    return normal, uv
