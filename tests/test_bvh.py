"""BVH traversal correctness: identical results to flat triangle intersection."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu import Emissive, Scene, TriangleMesh, rgb, vec3
from raytracer_tpu.core.compile import compile_scene
from raytracer_tpu.geometry.bvh import bvh_traverse
from raytracer_tpu.geometry.intersect import intersect_triangles
from raytracer_tpu.utils.constants import MISS_THRESHOLD


def make_sphere_obj(tmp_path, n_seg=12):
    """UV-sphere OBJ with a few hundred triangles."""
    lines = []
    for i in range(n_seg + 1):
        th = np.pi * i / n_seg
        for j in range(n_seg):
            ph = 2 * np.pi * j / n_seg
            lines.append(f"v {np.sin(th)*np.cos(ph):.6f} {np.cos(th):.6f} {np.sin(th)*np.sin(ph):.6f}")
    def vid(i, j):
        return i * n_seg + (j % n_seg) + 1
    for i in range(n_seg):
        for j in range(n_seg):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            lines.append(f"f {a} {b} {d}")
            lines.append(f"f {a} {d} {c}")
    p = tmp_path / "sphere.obj"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_bvh_matches_flat(tmp_path, monkeypatch):
    import raytracer_tpu.core.compile as C
    monkeypatch.setattr(C, "BVH_THRESHOLD", 32)
    obj = make_sphere_obj(tmp_path)
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8)
    mesh = TriangleMesh(obj, center=vec3(0, 0, 0),
                        material=Emissive(color=rgb(1, 1, 1)))
    sc.add(mesh)
    static, data = compile_scene(sc)
    assert static.use_tri_bvh

    rng = np.random.default_rng(0)
    O = jnp.asarray(rng.normal(size=(512, 3)) * 3, jnp.float32)
    D = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)

    t_flat, o_flat = intersect_triangles(
        O, D, data.geom.tri_p1, data.geom.tri_normal, data.geom.tri_centroid,
        data.geom.tri_n31, data.geom.tri_n12, data.geom.tri_n23,
        data.geom.tri_p2, data.geom.tri_p3)
    t_ref = np.asarray(jnp.min(t_flat, axis=0))
    t_bvh, o_bvh, _ = bvh_traverse(O, D, data.geom)
    t_bvh = np.asarray(t_bvh)

    hit_ref = t_ref < MISS_THRESHOLD
    hit_bvh = t_bvh < MISS_THRESHOLD
    assert np.array_equal(hit_ref, hit_bvh)
    assert np.allclose(t_ref[hit_ref], t_bvh[hit_bvh], rtol=1e-4, atol=1e-4)


def test_mesh_render_clustered_matches_flat(tmp_path, monkeypatch):
    """End-to-end: the clustered sweep and the flat sweep render the same
    image (same estimator, same RNG — only the intersection partition
    differs)."""
    import raytracer_tpu.core.compile as C

    obj = make_sphere_obj(tmp_path, n_seg=24)  # 1152 tris -> 3 clusters

    def build():
        sc = Scene()
        sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                      screen_width=16, screen_height=16, field_of_view=45)
        sc.add(TriangleMesh(obj, center=vec3(0, 0, 0),
                            material=Emissive(color=rgb(0.2, 0.9, 0.3))))
        return sc

    monkeypatch.setattr(C, "TRI_CLUSTER_THRESHOLD", 10 ** 9)
    flat = np.asarray(build().render(samples_per_pixel=2, seed=5),
                      np.float32)
    monkeypatch.setattr(C, "TRI_CLUSTER_THRESHOLD", 32)
    sc = build()
    static, data = compile_scene(sc)
    assert data.geom.tri_cl_lo.shape[0] >= 1
    cl = np.asarray(sc.render(samples_per_pixel=2, seed=5), np.float32)
    # identical up to last-ulp shading differences between the two programs
    assert np.abs(cl - flat).max() <= 1.0      # 8-bit output: <= 1 count


def test_mesh_render_with_bvh(tmp_path, monkeypatch):
    import raytracer_tpu.core.compile as C
    monkeypatch.setattr(C, "BVH_THRESHOLD", 32)
    obj = make_sphere_obj(tmp_path)
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                  screen_width=12, screen_height=12, field_of_view=45)
    sc.add(TriangleMesh(obj, center=vec3(0, 0, 0),
                        material=Emissive(color=rgb(0.2, 0.9, 0.3))))
    img = np.asarray(sc.render(samples_per_pixel=2), np.float32) / 255.0
    # sphere visible at center, black corners
    assert img[5:7, 5:7, 1].mean() > 0.5
    assert img[0, 0].max() == 0.0
