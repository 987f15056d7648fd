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
