"""Native mesh runtime (C++ OBJ parser + SAH BVH builder) vs Python fallback."""

import numpy as np
import pytest

from raytracer_tpu import native


def test_obj_parse_matches_fallback(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                 "f 1 2 3\nf 2 4 3\nf 1 2 3 4\nf -1 -2 -3\n")
    v, f = native.parse_obj(str(p))
    from raytracer_tpu.geometry.primitive import _parse_obj
    v2, f2 = _parse_obj(str(p))
    assert np.allclose(v, np.asarray(v2))
    assert np.array_equal(f, np.asarray(f2))


def _check_bvh(bvh, tv):
    n = tv.shape[0]
    assert sorted(bvh["order"].tolist()) == list(range(n))
    leaf = bvh["count"] > 0
    assert bvh["count"][leaf].sum() == n
    # every node's box contains its leaf triangles
    lo_t = tv.min(axis=1)
    hi_t = tv.max(axis=1)
    for ni in np.flatnonzero(leaf)[:50]:
        ids = bvh["order"][bvh["first"][ni]:bvh["first"][ni] + bvh["count"][ni]]
        assert np.all(bvh["bbox_lo"][ni] <= lo_t[ids].min(0) + 1e-4)
        assert np.all(bvh["bbox_hi"][ni] >= hi_t[ids].max(0) - 1e-4)
    # internal child links are valid
    for ni in np.flatnonzero(~leaf)[:50]:
        assert 0 <= bvh["left"][ni] < len(bvh["count"])
        assert 0 <= bvh["right"][ni] < len(bvh["count"])


def test_bvh_invariants_python():
    rng = np.random.default_rng(1)
    tv = rng.random((500, 3, 3)).astype(np.float32)
    _check_bvh(native._py_build_bvh(tv), tv)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_bvh_invariants_native():
    rng = np.random.default_rng(1)
    tv = rng.random((500, 3, 3)).astype(np.float32)
    _check_bvh(native.build_bvh(tv), tv)


def test_single_triangle():
    tv = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    bvh = native.build_bvh(tv)
    assert bvh["count"][0] == 1
    assert bvh["order"][0] == 0
