"""SAH leaf-order build + clustered-sweep correctness.

The on-device per-ray-stack BVH traversal is RETIRED (round 3): it measured
>10x slower than the data-parallel sweeps and its while_loop/scatter pattern
faults the TPU worker at >=327k triangles — reproduced with NO raytracer
code in scripts/repro_bvh_minimal.py (see core/compile.py retirement note).
The binned-SAH build survives as the compile-time leaf ORDER feeding the
two-level clustered sweep; these tests pin the build's validity and the
clustered sweep's equivalence to the flat sweep.
"""

import numpy as np

from raytracer_tpu import Emissive, Scene, TriangleMesh, rgb, vec3
from raytracer_tpu.core.compile import compile_scene
from raytracer_tpu.native import build_bvh


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


def test_sah_build_is_valid_tree():
    """The native/fallback SAH build emits a valid flat tree: `order` is a
    permutation, leaves partition the triangle range, children stay in
    bounds, and every leaf's triangles sit inside its AABB."""
    rng = np.random.default_rng(3)
    cen = rng.uniform(-4, 4, size=(3000, 1, 3))
    tv = (cen + rng.normal(scale=0.1, size=(3000, 3, 3))).astype(np.float32)
    t = build_bvh(tv)
    n = tv.shape[0]
    assert sorted(t["order"].tolist()) == list(range(n))

    perm = tv[t["order"]]
    lo, hi = t["bbox_lo"], t["bbox_hi"]
    left, right = t["left"], t["right"]
    first, count = t["first"], t["count"]
    n_nodes = lo.shape[0]
    covered = np.zeros(n, bool)
    stack = [0]
    while stack:
        node = stack.pop()
        c = int(count[node])
        if c > 0:
            f = int(first[node])
            assert 0 <= f and f + c <= n
            assert not covered[f:f + c].any()      # leaves don't overlap
            covered[f:f + c] = True
            v = perm[f:f + c].reshape(-1, 3)
            assert (v >= lo[node] - 1e-4).all()
            assert (v <= hi[node] + 1e-4).all()
        else:
            l, r = int(left[node]), int(right[node])
            assert 0 < l < n_nodes and 0 < r < n_nodes
            stack.extend((l, r))
    assert covered.all()                           # leaves cover every tri


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


def test_mesh_render_leaf_ordered(tmp_path, monkeypatch):
    """A leaf-ordered clustered mesh renders correctly end-to-end."""
    import raytracer_tpu.core.compile as C
    monkeypatch.setattr(C, "TRI_CLUSTER_THRESHOLD", 32)
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
