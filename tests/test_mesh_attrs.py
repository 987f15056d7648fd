"""TriangleMesh vertex attributes: smooth shading normals + mesh uvs.

The reference's TriangleMesh is dead code and its parser reads only v/f
records (triangle_mesh.py:12-43); this framework parses vt/vn and
interpolates per-corner normals/uvs barycentrically at the hit
(geometry/attrs.py triangle_attrs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu import Diffuse, Emissive, Scene, TriangleMesh, rgb, vec3
from raytracer_tpu.core.compile import compile_scene, scene_fingerprint
from raytracer_tpu.geometry.attrs import hit_attributes
from raytracer_tpu.geometry.intersect import nearest_hit


def _sphere_obj(path, n_theta=12, n_phi=24, with_vn=True, with_vt=False):
    """Lat-long unit sphere OBJ with analytic vertex normals / uvs.

    The seam column is duplicated (u=0 vs u=1) so uv interpolation never
    runs backwards across the wrap."""
    lines = []
    vid = {}
    for i in range(n_theta + 1):
        th = np.pi * i / n_theta
        for j in range(n_phi + 1):
            ph = 2 * np.pi * (j % n_phi) / n_phi
            x = np.sin(th) * np.cos(ph)
            y = np.cos(th)
            z = np.sin(th) * np.sin(ph)
            vid[(i, j)] = len(vid) + 1
            lines.append(f"v {x} {y} {z}")
            if with_vn:
                lines.append(f"vn {x} {y} {z}")
            if with_vt:
                lines.append(f"vt {j / n_phi} {1 - i / n_theta}")

    def corner(i, j):
        v = vid[(i, j)]
        if with_vn and with_vt:
            return f"{v}/{v}/{v}"
        if with_vn:
            return f"{v}//{v}"
        if with_vt:
            return f"{v}/{v}"
        return str(v)

    for i in range(n_theta):
        for j in range(n_phi):
            a, b = corner(i, j), corner(i, j + 1)
            c, d = corner(i + 1, j + 1), corner(i + 1, j)
            if i == 0:
                lines.append(f"f {a} {c} {d}")
            elif i == n_theta - 1:
                lines.append(f"f {a} {b} {c}")
            else:
                lines.append(f"f {a} {b} {c} {d}")
    path.write_text("\n".join(lines))
    return path


def _first_hit_normals(sc):
    static, data = compile_scene(sc)
    n = 64
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    # rays from a ring on the z=3 plane aimed at the sphere center
    O = np.stack([0.4 * np.cos(ang), 0.4 * np.sin(ang), np.full(n, 3.0)], -1)
    D = np.asarray([[0.0, 0.0, -1.0]] * n)
    O = jnp.asarray(O, jnp.float32)
    D = jnp.asarray(D, jnp.float32)
    t, orient, obj = nearest_hit(O, D, data.geom)
    P = O + t[:, None] * D
    N, uv = hit_attributes(P, obj, data.geom, static, force_uv=True)
    exact = P / jnp.linalg.norm(P, axis=-1, keepdims=True)
    return np.asarray(N), np.asarray(uv), np.asarray(exact), np.asarray(t)


def _mesh_scene(tmp_path, smooth, with_vn=True, with_vt=False, mat=None):
    f = _sphere_obj(tmp_path / "s.obj", with_vn=with_vn, with_vt=with_vt)
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                  screen_width=32, screen_height=32)
    sc.add(TriangleMesh(str(f), center=vec3(0, 0, 0),
                        material=mat or Emissive(color=rgb(1, 1, 1)),
                        smooth=smooth))
    return sc


def test_smooth_normals_match_analytic_sphere(tmp_path):
    """Interpolated vn of a coarse lat-long sphere land within ~2 deg of the
    exact sphere normal; flat face normals are off by many degrees."""
    sc_s = _mesh_scene(tmp_path, smooth=None, with_vn=True)    # honors vn
    sc_f = _mesh_scene(tmp_path, smooth=False, with_vn=True)   # forced flat
    Ns, _, exact, t = _first_hit_normals(sc_s)
    Nf, _, _, _ = _first_hit_normals(sc_f)
    assert (t < 1e30).all()
    cos_s = np.sum(Ns * exact, axis=-1)
    cos_f = np.sum(Nf * exact, axis=-1)
    assert cos_s.min() > np.cos(np.deg2rad(2.0))
    # the coarse tessellation's face normals are visibly off the sphere
    assert np.rad2deg(np.arccos(cos_f.clip(-1, 1))).max() > 4.0


def test_smooth_true_computes_vertex_normals(tmp_path):
    """smooth=True on a vn-less file computes area-weighted vertex normals."""
    sc = _mesh_scene(tmp_path, smooth=True, with_vn=False)
    N, _, exact, t = _first_hit_normals(sc)
    assert (t < 1e30).all()
    cos = np.sum(N * exact, axis=-1)
    assert cos.min() > np.cos(np.deg2rad(3.0))


def test_flat_default_has_empty_tables(tmp_path):
    sc = _mesh_scene(tmp_path, smooth=None, with_vn=False)
    static, data = compile_scene(sc)
    assert not static.tri_interp
    assert data.geom.tri_vn1.shape[0] == 0
    sc2 = _mesh_scene(tmp_path, smooth=True, with_vn=False)
    static2, data2 = compile_scene(sc2)
    assert static2.tri_interp
    assert data2.geom.tri_vn1.shape[0] == static2.n_tris


def test_mesh_uv_interpolation(tmp_path):
    """vt records drive uv: the lat-long sphere's uv at a hit matches the
    analytic equirect parameterization used to emit the vt records."""
    sc = _mesh_scene(tmp_path, smooth=None, with_vn=True, with_vt=True)
    _, uv, exact, t = _first_hit_normals(sc)
    phi = np.arctan2(exact[:, 2], exact[:, 0]) % (2 * np.pi)
    theta = np.arccos(exact[:, 1].clip(-1, 1))
    u_exp = phi / (2 * np.pi)
    v_exp = 1 - theta / np.pi
    # wrap-around seam: compare circularly in u
    du = np.abs(uv[:, 0] - u_exp)
    du = np.minimum(du, 1 - du)
    assert du.max() < 0.02
    assert np.abs(uv[:, 1] - v_exp).max() < 0.02


def test_fingerprint_distinguishes_smooth(tmp_path):
    sc_f = _mesh_scene(tmp_path, smooth=False, with_vn=True)
    sc_s = _mesh_scene(tmp_path, smooth=True, with_vn=True)
    assert scene_fingerprint(sc_f) != scene_fingerprint(sc_s)


def test_smooth_mesh_renders_without_pallas(tmp_path):
    """Vertex-attr scenes route to the jnp wavefront and render finite."""
    from raytracer_tpu import Sphere
    sc = _mesh_scene(tmp_path, smooth=True, with_vn=True,
                     mat=Diffuse(diff_color=rgb(0.7, 0.6, 0.5)))
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, 0), radius=20.0, shadow=False))
    static, _ = compile_scene(sc)
    assert not static.pallas_ok and not static.pallas_tex_ok
    img = sc.render(samples_per_pixel=2, seed=0, output="linear")
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    assert arr.mean() > 0.0


def test_smooth_vs_flat_images_differ(tmp_path):
    mat = lambda: Diffuse(diff_color=rgb(0.7, 0.6, 0.5))  # noqa: E731
    from raytracer_tpu import Sphere
    imgs = []
    for smooth in (False, None):
        sc = _mesh_scene(tmp_path, smooth=smooth, with_vn=True, mat=mat())
        sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                      center=vec3(0, 0, 0), radius=20.0, shadow=False))
        imgs.append(np.asarray(sc.render(samples_per_pixel=2, seed=0,
                                         output="linear")))
    flat, smooth_img = imgs
    assert not np.allclose(flat, smooth_img)


def test_parser_native_matches_python(tmp_path):
    f = tmp_path / "q.obj"
    f.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vt 1 1
vn 0 0 1
f 1/1/1 2/2/1 4/4/1 3/3/1
f -4 -3 -1
""")
    from raytracer_tpu.geometry.primitive import _parse_obj_full
    from raytracer_tpu.native import available, parse_obj_full
    py = _parse_obj_full(f)
    assert py[3].shape == (3, 3)
    assert (py[4][2] == -1).all() and (py[5][2] == -1).all()
    if not available():
        pytest.skip("native library unavailable")
    nat = parse_obj_full(f)
    for a, b in zip(nat, py):
        assert np.allclose(np.asarray(a, np.float64),
                           np.asarray(b, np.float64))


def test_mesh_normal_mapping(tmp_path):
    """A constant normal map on a vt-mapped quad mesh tilts the shading
    normal by the expected angle in the uv-aligned tangent frame."""
    from raytracer_tpu.core.integrator import _apply_normal_maps

    f = tmp_path / "quad.obj"
    f.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vt 1 1
f 1/1 2/2 4/4 3/3
""")
    # texel (0.75, 0.5, 0.75): m = (+0.25, 0, +0.25) -> 45 deg toward +u
    nm = np.full((4, 4, 3), 0.5, np.float32)
    nm[..., 0] = 0.75
    nm[..., 2] = 0.75
    mat = Emissive(color=rgb(1, 1, 1))
    mat.set_normalmap(nm)
    sc = Scene()
    sc.add_Camera(look_from=vec3(0.5, 0.5, 2), look_at=vec3(0.5, 0.5, 0),
                  screen_width=8, screen_height=8)
    sc.add(TriangleMesh(str(f), center=vec3(0, 0, 0), material=mat))
    static, data = compile_scene(sc)
    assert any(r.basis_kind == "tri" for r in static.normal_maps)

    O = jnp.asarray([[0.5, 0.5, 2.0], [0.25, 0.75, 2.0]], jnp.float32)
    D = jnp.asarray([[0.0, 0.0, -1.0]] * 2, jnp.float32)
    t, orient, obj = nearest_hit(O, D, data.geom)
    P = O + t[:, None] * D
    N_geo, uv = hit_attributes(P, obj, data.geom, static, force_uv=True)
    N = np.asarray(_apply_normal_maps(N_geo, P, uv, obj, data, static))
    expected = np.array([1.0, 0.0, 1.0]) / np.sqrt(2.0)
    assert np.abs(N - expected).max() < 1e-3


def test_triangle_normalmap_rejected():
    from raytracer_tpu import Triangle

    mat = Emissive(color=rgb(1, 1, 1))
    mat.set_normalmap(np.full((4, 4, 3), 0.5, np.float32))
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8)
    sc.add(Triangle(material=mat, center=vec3(0, 0, 0), p1=vec3(0, 0, 0),
                    p2=vec3(1, 0, 0), p3=vec3(0, 1, 0)))
    with pytest.raises(ValueError, match="normal maps"):
        compile_scene(sc)


def test_mesh_normalmap_uv_handedness(tmp_path):
    """Mirrored-uv faces keep a consistent tangent frame: a green-channel
    (+v) perturbation tilts the normal toward +dP/dv on BOTH a straight and
    a u-mirrored quad (regression: B = cross(N, T) alone flips the map's
    green channel on mirrored islands)."""
    from raytracer_tpu.core.integrator import _apply_normal_maps

    nm = np.full((4, 4, 3), 0.5, np.float32)
    nm[..., 1] = 0.75   # +0.25 in tangent-space y
    nm[..., 2] = 0.75
    expected = np.array([0.0, 1.0, 1.0]) / np.sqrt(2.0)

    for mirror in (False, True):
        u0, u1 = (1, 0) if mirror else (0, 1)
        f = tmp_path / f"q{mirror}.obj"
        f.write_text(f"""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt {u0} 0
vt {u1} 0
vt {u0} 1
vt {u1} 1
f 1/1 2/2 4/4 3/3
""")
        mat = Emissive(color=rgb(1, 1, 1))
        mat.set_normalmap(nm)
        sc = Scene()
        sc.add_Camera(look_from=vec3(0.5, 0.5, 2), look_at=vec3(0.5, 0.5, 0),
                      screen_width=8, screen_height=8)
        sc.add(TriangleMesh(str(f), center=vec3(0, 0, 0), material=mat))
        static, data = compile_scene(sc)
        O = jnp.asarray([[0.5, 0.5, 2.0]], jnp.float32)
        D = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        t, orient, obj = nearest_hit(O, D, data.geom)
        P = O + t[:, None] * D
        N_geo, uv = hit_attributes(P, obj, data.geom, static, force_uv=True)
        N = np.asarray(_apply_normal_maps(N_geo, P, uv, obj, data, static))
        assert np.abs(N - expected).max() < 1e-3, (mirror, N)


def test_parser_long_face_line(tmp_path):
    """Native parser handles face lines longer than any fixed buffer
    (regression: 1024-byte fgets silently dropped corners)."""
    from raytracer_tpu.geometry.primitive import _parse_obj_full
    from raytracer_tpu.native import available, parse_obj_full

    n = 200
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    lines = [f"v {np.cos(a):.9f} {np.sin(a):.9f} 0.000000000" for a in ang]
    lines.append("f " + " ".join(str(i + 1) for i in range(n)))  # ~800B
    lines.append("f " + " ".join(f"{i + 1}/{i + 1}/{i + 1}"
                                 for i in range(n)))             # ~2.4kB
    f = tmp_path / "poly.obj"
    f.write_text("\n".join(lines) + "\nvt 0 0\n" * 0)
    py = _parse_obj_full(f)
    assert py[3].shape == (2 * (n - 2), 3)
    if not available():
        pytest.skip("native library unavailable")
    nat = parse_obj_full(f)
    for a, b in zip(nat, py):
        assert np.array_equal(np.asarray(a, np.float64),
                              np.asarray(b, np.float64))
