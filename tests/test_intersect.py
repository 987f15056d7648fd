import jax.numpy as jnp
import numpy as np

from raytracer_tpu.geometry import intersect as I
from raytracer_tpu.utils.constants import MISS_THRESHOLD, UPDOWN, UPWARDS


def rays(origins, dirs):
    O = jnp.asarray(origins, jnp.float32)
    D = jnp.asarray(dirs, jnp.float32)
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    return O, D


def test_sphere_closed_form():
    # ray from origin down -z at sphere centered (0,0,-5), r=1 -> t = 4
    O, D = rays([[0, 0, 0], [0, 0, 0]], [[0, 0, -1], [0, 1, 0]])
    c = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    r = jnp.asarray([1.0], jnp.float32)
    t, orient = I.intersect_spheres(O, D, c, r)
    assert np.isclose(float(t[0, 0]), 4.0, atol=1e-5)
    assert float(orient[0, 0]) == UPWARDS        # entering
    assert float(t[0, 1]) >= MISS_THRESHOLD             # pointing away misses


def test_sphere_inside_exit():
    O, D = rays([[0, 0, -5]], [[0, 0, -1]])
    c = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    r = jnp.asarray([1.0], jnp.float32)
    t, orient = I.intersect_spheres(O, D, c, r)
    assert np.isclose(float(t[0, 0]), 1.0, atol=1e-5)
    assert float(orient[0, 0]) == UPDOWN         # exiting


def test_plane_hit_and_bounds():
    O, D = rays([[0, 1, 0], [5, 1, 0]], [[0, -1, 0], [0, -1, 0]])
    t, orient = I.intersect_planes(
        O, D,
        center=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
        normal=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
        u_axis=jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
        v_axis=jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        half_w=jnp.asarray([2.0], jnp.float32),
        half_h=jnp.asarray([2.0], jnp.float32))
    assert np.isclose(float(t[0, 0]), 1.0, atol=1e-6)
    assert float(orient[0, 0]) == UPWARDS        # N.D < 0: front face
    assert float(t[0, 1]) >= MISS_THRESHOLD             # outside the rectangle


def test_box_slab_and_inside():
    basis = jnp.eye(3, dtype=jnp.float32)[None]
    lb = jnp.asarray([[-1.0, -1.0, -1.0]], jnp.float32)
    rt = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    O, D = rays([[0, 0, 5], [0, 0, 0]], [[0, 0, -1], [0, 0, -1]])
    t, orient = I.intersect_boxes(O, D, basis, lb, rt)
    assert np.isclose(float(t[0, 0]), 4.0, atol=1e-5)
    assert float(orient[0, 0]) == UPWARDS
    # origin inside the box: first hit is tmax, flagged as exiting
    assert np.isclose(float(t[0, 1]), 1.0, atol=1e-5)
    assert float(orient[0, 1]) == UPDOWN


def test_box_rotated():
    # box rotated 45 deg about y; ray along -z hits the edge-on corner sooner
    th = np.deg2rad(45)
    Rm = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]])
    basis = jnp.asarray(Rm[None], jnp.float32)   # rows = rotated axes
    lb_w = Rm.T @ np.array([-1.0, -1.0, -1.0])   # world corner of rotated box
    del lb_w
    lb = jnp.asarray([[-1.0, -1.0, -1.0]], jnp.float32)  # local-frame corners
    rt = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    O, D = rays([[0, 0, 5]], [[0, 0, -1]])
    t, _ = I.intersect_boxes(O, D, basis, lb, rt)
    assert np.isclose(float(t[0, 0]), 5.0 - np.sqrt(2.0), atol=1e-4)


def test_triangle_inside_outside():
    p1 = np.array([[-1.0, 0.0, -3.0]])
    p2 = np.array([[1.0, 0.0, -3.0]])
    p3 = np.array([[0.0, 2.0, -3.0]])
    n = np.cross(p2 - p1, p3 - p1)
    n = n / np.linalg.norm(n)
    cen = (p1 + p2 + p3) / 3
    f = lambda a: jnp.asarray(a, jnp.float32)
    args = dict(p1=f(p1), normal=f(n), centroid=f(cen),
                n31=f(np.cross(p3 - p1, n)), n12=f(np.cross(p1 - p2, n)),
                n23=f(np.cross(p2 - p3, n)), p2=f(p2), p3=f(p3))
    O, D = rays([[0, 0.5, 0], [0, 3, 0]], [[0, 0, -1], [0, 0, -1]])
    t, orient = I.intersect_triangles(O, D, **args)
    assert np.isclose(float(t[0, 0]), 3.0, atol=1e-5)
    assert float(t[0, 1]) >= MISS_THRESHOLD


def test_nearest_hit_reduction():
    # two spheres along the same ray: argmin picks the closer
    O, D = rays([[0, 0, 0]], [[0, 0, -1]])
    c = jnp.asarray([[0.0, 0.0, -10.0], [0.0, 0.0, -5.0]], jnp.float32)
    r = jnp.asarray([1.0, 1.0], jnp.float32)
    t, _ = I.intersect_spheres(O, D, c, r)
    obj = int(jnp.argmin(t[:, 0]))
    assert obj == 1
    assert np.isclose(float(jnp.min(t[:, 0])), 4.0, atol=1e-5)


def _tri_geom(p1, p2, p3, clustered=False):
    """Minimal GeometryTables stand-in holding only triangles."""
    n = np.cross(p2 - p1, p3 - p1)
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)

    class G:
        pass

    g = G()
    f = lambda a: jnp.asarray(a, jnp.float32)
    g.tri_p1, g.tri_p2, g.tri_p3 = f(p1), f(p2), f(p3)
    g.tri_normal = f(n)
    g.tri_centroid = f((p1 + p2 + p3) / 3.0)
    g.tri_n31 = f(np.cross(p3 - p1, n))
    g.tri_n12 = f(np.cross(p1 - p2, n))
    g.tri_n23 = f(np.cross(p2 - p3, n))
    g.sphere_center = jnp.zeros((0, 3), jnp.float32)
    g.sphere_radius = jnp.zeros((0,), jnp.float32)
    g.plane_center = g.plane_normal = g.plane_u_axis = g.plane_v_axis = \
        jnp.zeros((0, 3), jnp.float32)
    g.plane_half_w = g.plane_half_h = jnp.zeros((0,), jnp.float32)
    g.box_basis = jnp.zeros((0, 3, 3), jnp.float32)
    g.box_lb_local = g.box_rt_local = jnp.zeros((0, 3), jnp.float32)
    g.tri_cl_lo = g.tri_cl_hi = jnp.zeros((0, 3), jnp.float32)
    g.tri_cl_start = g.tri_cl_virt = jnp.zeros((0,), jnp.int32)
    # no MeshInstances: empty instance/virtual tables (identity behavior)
    g.tri_cl_inst = jnp.zeros((0,), jnp.int32)
    g.tri_virt_row = g.tri_virt_inst = jnp.zeros((0,), jnp.int32)
    g.inst_rot = jnp.zeros((0, 3, 3), jnp.float32)
    g.inst_trans = jnp.zeros((0, 3), jnp.float32)
    g.inst_inv_scale = jnp.zeros((0,), jnp.float32)
    if clustered:
        # treelet-style (start, AABB) clusters over contiguous runs — a
        # valid particular cut (grouping need not be spatial for
        # correctness, only for skip efficiency); uneven final run
        # exercises the overlapping fixed-size slice
        B = I.TRI_CLUSTER_SIZE
        T = len(p1)
        C = -(-T // B)
        starts = np.arange(C) * B      # last slice runs into the degenerate
        # padding rows _clustered_tri_tables appends — exercising that path
        verts = np.stack([p1, p2, p3], axis=1).astype(np.float64)  # (T, 3, 3)
        lo = np.stack([verts[i * B:(i + 1) * B].reshape(-1, 3).min(0)
                       for i in range(C)])
        hi = np.stack([verts[i * B:(i + 1) * B].reshape(-1, 3).max(0)
                       for i in range(C)])
        pad = 1e-4 * (hi - lo + np.abs(lo) + np.abs(hi) + 1.0)
        g.tri_cl_lo, g.tri_cl_hi = f(lo - pad), f(hi + pad)
        g.tri_cl_start = g.tri_cl_virt = jnp.asarray(starts, jnp.int32)
    return g


import pytest


@pytest.mark.parametrize("clustered", [False, True])
def test_blocked_nearest_matches_flat_sweep(clustered):
    """nearest_hit's blocked scan + packed-code reduce (and, parametrized,
    the two-level clustered sweep) vs a float64 brute-force oracle, across a
    >1-block triangle table."""
    rng = np.random.default_rng(7)
    T = 4100                                    # > 2 blocks at B=2048
    v0 = rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    p1 = v0
    p2 = (v0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    p3 = (v0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    g = _tri_geom(p1, p2, p3, clustered=clustered)

    N = 64
    O = jnp.asarray(rng.uniform(-3, 3, (N, 3)).astype(np.float32))
    Dn = rng.normal(size=(N, 3)).astype(np.float32)
    Dn /= np.linalg.norm(Dn, axis=1, keepdims=True)
    D = jnp.asarray(Dn)

    bt, bo, bid = (np.asarray(x) for x in I.nearest_hit(O, D, g))

    # float64 numpy brute-force oracle; f32 XLA programs are only held to it
    # on rays whose winner is unambiguous at f32 precision (clear of edge
    # grazes, near-parallel planes, and photo-finish runner-ups)
    n = np.cross(p2 - p1, p3 - p1).astype(np.float64)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-300)
    cen = (p1 + p2 + p3).astype(np.float64) / 3.0
    O64, D64 = np.asarray(O, np.float64), np.asarray(Dn, np.float64)
    ndd = n @ D64.T                                       # (T, N)
    ndco = np.sum(n * cen, axis=1)[:, None] - n @ O64.T
    tt = ndco / np.where(ndd == 0, 1e-300, ndd)
    P = O64[None] + tt[..., None] * D64[None]             # (T, N, 3)
    edges = np.stack([
        np.einsum("tc,tnc->tn", np.cross(p3 - p1, n), P - p1[:, None]),
        np.einsum("tc,tnc->tn", np.cross(p1 - p2, n), P - p2[:, None]),
        np.einsum("tc,tnc->tn", np.cross(p2 - p3, n), P - p3[:, None])])
    valid = (edges >= 0).all(0) & (ndco * ndd > 0)
    t_or = np.where(valid, np.abs(tt), np.inf)
    win = t_or.argmin(axis=0)
    tmin = t_or.min(axis=0)
    cols = np.arange(len(win))
    second = np.sort(t_or, axis=0)[1]
    robust = (np.isfinite(tmin)
              & (np.where(np.isfinite(second), second, 1e30) - tmin > 1e-3)
              & (edges[:, win, cols].min(0) > 1e-3)
              & (np.abs(ndd[win, cols]) > 1e-3))
    assert robust.mean() > 0.3                  # the test has teeth
    assert np.array_equal(bid[robust], win[robust])
    assert np.allclose(bt[robust], tmin[robust], rtol=1e-4, atol=1e-4)
    oo = np.where(ndd[win, cols] < 0, UPWARDS, UPDOWN)
    assert np.array_equal(bo[robust], oo[robust])
    # no-hit rays report >= MISS_THRESHOLD (grazing rays excluded: a ray
    # within f32 noise of an edge may legitimately differ)
    graze = (np.abs(edges) < 1e-3).any(0) & (np.abs(tt) < 1e3) & (tt > 0)
    clean_miss = ~np.isfinite(tmin) & ~graze.any(0)
    assert np.all(bt[clean_miss] >= MISS_THRESHOLD)


def test_nearest_orientation_backface():
    # single triangle in the z=-3 plane, normal +z; a ray travelling +z hits
    # the back face -> orientation UPDOWN; travelling -z hits front -> UPWARDS
    p1 = np.array([[-1.0, -1.0, -3.0]], np.float32)
    p2 = np.array([[1.0, -1.0, -3.0]], np.float32)
    p3 = np.array([[0.0, 2.0, -3.0]], np.float32)
    g = _tri_geom(p1, p2, p3)
    O, D = rays([[0, 0, -6], [0, 0, 0]], [[0, 0, 1], [0, 0, -1]])
    t, o, tid = I.nearest_hit(O, D, g)
    assert np.allclose(np.asarray(t), 3.0, atol=1e-5)
    assert np.asarray(tid).tolist() == [0, 0]
    assert float(o[0]) == UPDOWN                # back face (D·n > 0)
    assert float(o[1]) == UPWARDS               # front face


def test_clustered_occluded_matches_flat():
    """Clustered any-hit == flat any-hit away from photo-finish distances."""
    rng = np.random.default_rng(11)
    T = 3000
    v0 = rng.uniform(-2, 2, (T, 3)).astype(np.float32)
    p1 = v0
    p2 = (v0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    p3 = (v0 + rng.uniform(-0.5, 0.5, (T, 3))).astype(np.float32)
    g_flat = _tri_geom(p1, p2, p3)
    g_cl = _tri_geom(p1, p2, p3, clustered=True)

    N = 300
    O = jnp.asarray(rng.uniform(-3, 3, (N, 3)).astype(np.float32))
    Dn = rng.normal(size=(N, 3)).astype(np.float32)
    Dn /= np.linalg.norm(Dn, axis=1, keepdims=True)
    D = jnp.asarray(Dn)
    md = jnp.asarray(rng.uniform(0.5, 6.0, (N,)).astype(np.float32))
    mask = jnp.asarray(rng.random(T) < 0.8)

    h_flat = np.asarray(I.occluded(O, D, g_flat, mask, md))
    h_cl = np.asarray(I.occluded(O, D, g_cl, mask, md))

    # exclude rays whose nearest masked hit sits within f32 noise of max_dist
    t_flat, _ = I.intersect_triangles(O, D, g_flat.tri_p1, g_flat.tri_normal,
                                      g_flat.tri_centroid, g_flat.tri_n31,
                                      g_flat.tri_n12, g_flat.tri_n23,
                                      g_flat.tri_p2, g_flat.tri_p3)
    t_near = np.asarray(jnp.min(jnp.where(np.asarray(mask)[:, None], t_flat,
                                          np.float32(np.inf)), axis=0))
    robust = np.abs(t_near - np.asarray(md)) > 1e-3 * np.asarray(md)
    assert robust.mean() > 0.9
    assert np.array_equal(h_flat[robust], h_cl[robust])
    assert h_flat[robust].any() and not h_flat[robust].all()


def test_nearest_tie_is_deterministic():
    # two coincident triangles: the packed-code max-reduce picks the higher
    # id deterministically (documented tie-break; the pre-r2 argmin picked
    # the lower id — no estimator depends on which, only on determinism)
    p = (np.array([[-1.0, -1.0, -3.0]], np.float32),
         np.array([[1.0, -1.0, -3.0]], np.float32),
         np.array([[0.0, 2.0, -3.0]], np.float32))
    g = _tri_geom(*(np.repeat(a, 2, axis=0) for a in p))
    O, D = rays([[0, 0, 0]], [[0, 0, -1]])
    _, _, tid = I.nearest_hit(O, D, g)
    assert int(tid[0]) == 1
