"""MeshInstances: shared object-space mesh tables + per-instance transforms.

True two-level instancing (the reference's mesh support is dead code,
triangle_mesh.py:12-43, and it has no acceleration structure at all): one
object-space copy of the triangle/cluster tables, rays pulled into instance
space per cluster record (geometry/intersect.py _inst_ray_tile), hit
attributes mapped back through virtual object ids (geometry/attrs.py).

The load-bearing oracle is test_instanced_matches_baked: the SAME scene
rendered (a) as MeshInstances through the clustered sweep with per-record
transforms and (b) as host-transformed TriangleMesh copies through the flat
sweep must produce the same image.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu import (Diffuse, Emissive, Glossy, MeshInstances, Plane,
                           Scene, TriangleMesh, image, rgb, vec3)
from raytracer_tpu.core.compile import (compile_scene, compile_scene_cached,
                                        scene_fingerprint)
from raytracer_tpu.core.ray import Ray, first_hit
from raytracer_tpu.geometry.primitive import rotation_matrix


def _icosphere_obj(path, with_vt=False):
    t = (1 + 5 ** 0.5) / 2
    V = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    F = [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]]
    lines = [f"v {v[0]} {v[1]} {v[2]}" for v in V]
    if with_vt:
        for v in V:
            u = (np.arctan2(v[2], v[0]) + np.pi) / (2 * np.pi)
            w = (np.arcsin(np.clip(v[1], -1, 1)) + np.pi / 2) / np.pi
            lines.append(f"vt {u} {w}")
        lines += [f"f {a+1}/{a+1} {b+1}/{b+1} {c+1}/{c+1}" for a, b, c in F]
    else:
        lines += [f"f {a+1} {b+1} {c+1}" for a, b, c in F]
    path.write_text("\n".join(lines))
    return path


XFORMS = [dict(translate=(-1.5, 0, 0), theta=0, axis=(0, 1, 0), scale=0.8),
          dict(translate=(0.0, 0.4, -1.0), theta=40, axis=(0, 1, 0),
               scale=1.1),
          dict(translate=(1.6, -0.2, 0.5), theta=75, axis=(1, 1, 0),
               scale=0.6)]


def _glossy(color):
    return Glossy(diff_color=color, n=vec3(1.3 + 0j, 1.3 + 0j, 1.3 + 0j),
                  roughness=0.3, spec_coeff=0.2, diff_coeff=0.9)


def _scene_base():
    sc = Scene(ambient_color=(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 0.5, 3), look_at=vec3(0, 0, -1),
                  screen_width=80, screen_height=60)
    sc.add_DirectionalLight(Ldir=vec3(1, 1, 1), color=rgb(1, 1, 1))
    sc.add(Plane(material=_glossy(rgb(0.4, 0.4, 0.4)),
                 center=vec3(0, -1.0, -3), width=20, height=20,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    return sc


def _bake(mesh_path, mat, x):
    m = TriangleMesh(str(mesh_path), center=vec3(0, 0, -2), material=mat)
    R = rotation_matrix(x["theta"], x["axis"]) if x["theta"] else np.eye(3)
    c = np.asarray(m.center)
    m.vertices = ((m.vertices - c) * x["scale"]) @ R.T + c \
        + np.asarray(x["translate"])
    return m


def _assert_images_match(img_a, img_b, frac=0.995, mean=0.5):
    d = np.abs(np.asarray(img_a, float) - np.asarray(img_b, float))
    assert d.mean() < mean, f"mean abs diff {d.mean():.3f}"
    assert (d <= 2).mean() > frac, f"only {(d <= 2).mean():.4f} within 2/255"


def test_instanced_matches_baked(tmp_path):
    """Instanced render (clustered sweep + per-record ray transforms) matches
    host-baked copies (flat sweep) — per-instance materials, shadows and the
    glossy floor reflection all agree."""
    p = _icosphere_obj(tmp_path / "ico.obj")
    red, blue = _glossy(rgb(0.8, 0.3, 0.2)), _glossy(rgb(0.2, 0.4, 0.9))

    sc_i = _scene_base()
    grp = MeshInstances(TriangleMesh(str(p), center=vec3(0, 0, -2),
                                     material=red))
    for i, x in enumerate(XFORMS):
        grp.add(material=(blue if i == 1 else None), **x)
    sc_i.add(grp)

    sc_b = _scene_base()
    for i, x in enumerate(XFORMS):
        sc_b.add(_bake(p, blue if i == 1 else red, x))

    img_i = sc_i.render(samples_per_pixel=4, seed=3)
    img_b = sc_b.render(samples_per_pixel=4, seed=3)
    _assert_images_match(img_i, img_b)
    # the instanced scene must route off the Pallas paths
    static, data = compile_scene_cached(sc_i)
    assert not static.pallas_ok and not static.pallas_tex_ok
    assert data.geom.inst_rot.shape[0] == 4        # identity + 3 instances
    assert static.n_tris == 3 * 20                 # virtual ids, not physical


def test_virtual_object_ids_and_materials(tmp_path):
    """first_hit returns a distinct virtual object id per instance, and the
    per-instance material slot resolves through it."""
    p = _icosphere_obj(tmp_path / "ico.obj")
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8)
    grp = MeshInstances(TriangleMesh(str(p), center=vec3(0, 0, 0),
                                     material=Emissive(color=rgb(1, 0, 0))))
    grp.add(translate=(-2, 0, 0))
    grp.add(translate=(2, 0, 0), material=Emissive(color=rgb(0, 1, 0)))
    sc.add(grp)

    O = jnp.asarray([[-2.0, 0, 3], [2.0, 0, 3]], jnp.float32)
    D = jnp.asarray([[0.0, 0, -1]] * 2, jnp.float32)
    hit = first_hit(Ray(origin=O, dir=D), sc)
    t = np.asarray(hit.distance)
    obj = np.asarray(hit.obj_id)
    assert (t < 1e30).all()
    assert 0 <= obj[0] < 20 and 20 <= obj[1] < 40

    img = np.asarray(sc.render(samples_per_pixel=1, seed=0), float)
    left, right = img[:, :img.shape[1] // 2], img[:, img.shape[1] // 2:]
    assert left[..., 0].max() > 100 > left[..., 1].max()
    assert right[..., 1].max() > 100 > right[..., 0].max()


def test_instanced_smooth_normals(tmp_path):
    """Smooth (vertex-normal) shading survives the instance transform: probe
    normals on a rotated+scaled icosphere instance land near the analytic
    transformed-sphere normal."""
    from raytracer_tpu.geometry.attrs import hit_attributes
    from raytracer_tpu.geometry.intersect import nearest_hit

    p = _icosphere_obj(tmp_path / "ico.obj")
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 4), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8)
    grp = MeshInstances(TriangleMesh(str(p), center=vec3(0, 0, 0),
                                     material=Emissive(color=rgb(1, 1, 1)),
                                     smooth=True))
    grp.add(translate=(0.5, 0.25, 0), theta=60, axis=(1, 2, 0), scale=1.5)
    sc.add(grp)
    static, data = compile_scene(sc)

    n = 48
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    O = np.stack([0.5 + 0.5 * np.cos(ang), 0.25 + 0.5 * np.sin(ang),
                  np.full(n, 4.0)], -1)
    D = np.asarray([[0.0, 0.0, -1.0]] * n)
    t, orient, obj = nearest_hit(jnp.asarray(O, jnp.float32),
                                 jnp.asarray(D, jnp.float32), data.geom)
    assert (np.asarray(t) < 1e30).all()
    P = np.asarray(O + np.asarray(t)[:, None] * D)
    N, _ = hit_attributes(jnp.asarray(P, jnp.float32), obj, data.geom, static)
    # analytic: normal of the transformed sphere = direction from the
    # transformed center (uniform scale + rotation preserve sphere-ness)
    center = np.array([0.5, 0.25, 0.0])
    exact = P - center
    exact /= np.linalg.norm(exact, axis=-1, keepdims=True)
    cos = np.sum(np.asarray(N) * exact, axis=-1)
    # a 20-face icosphere's interpolated normals are coarse; 12 deg beats the
    # flat-face error (~21 deg here) decisively and catches any wrong frame
    assert cos.min() > np.cos(np.deg2rad(12.0))
    flat_cos = float(np.cos(np.deg2rad(21.0)))
    assert cos.mean() > flat_cos


def test_instanced_texture_uvs(tmp_path):
    """Mesh texture uvs ride the virtual->physical row mapping: a textured
    instanced mesh matches its baked twin."""
    p = _icosphere_obj(tmp_path / "ico.obj", with_vt=True)
    tex = np.zeros((8, 16, 3), np.float32)
    tex[:, :8] = [1.0, 0.1, 0.1]
    tex[:, 8:] = [0.1, 0.1, 1.0]
    mat = Diffuse(diff_color=image(tex), diffuse_rays=1)

    sc_i = _scene_base()
    grp = MeshInstances(TriangleMesh(str(p), center=vec3(0, 0, -2),
                                     material=mat))
    grp.add(**XFORMS[1])
    sc_i.add(grp)
    sc_b = _scene_base()
    sc_b.add(_bake(p, mat, XFORMS[1]))

    img_i = sc_i.render(samples_per_pixel=4, seed=7)
    img_b = sc_b.render(samples_per_pixel=4, seed=7)
    _assert_images_match(img_i, img_b)


def test_fingerprint_tracks_instance_edits(tmp_path):
    """Moving/adding an instance changes the scene fingerprint (so the
    compile cache can never serve stale tables)."""
    p = _icosphere_obj(tmp_path / "ico.obj")
    sc = _scene_base()
    grp = MeshInstances(TriangleMesh(str(p), center=vec3(0, 0, -2),
                                     material=_glossy(rgb(0.7, 0.7, 0.7))))
    grp.add(translate=(0, 0, 0))
    sc.add(grp)
    fp0 = scene_fingerprint(sc)
    grp.instances[0] = (grp.instances[0][0],
                        grp.instances[0][1] + np.array([0.5, 0, 0]),
                        grp.instances[0][2], grp.instances[0][3])
    fp1 = scene_fingerprint(sc)
    assert fp0 != fp1
    grp.add(translate=(3, 0, 0), scale=0.5)
    assert scene_fingerprint(sc) != fp1


def test_instanced_aovs(tmp_path):
    """AOV planes work through instancing: coverage marks the instances,
    obj ids are per-instance virtual ids."""
    p = _icosphere_obj(tmp_path / "ico.obj")
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 4), look_at=vec3(0, 0, 0),
                  screen_width=24, screen_height=16)
    grp = MeshInstances(TriangleMesh(str(p), center=vec3(0, 0, 0),
                                     material=Emissive(color=rgb(1, 1, 1))))
    grp.add(translate=(-1.5, 0, 0), scale=0.9)
    grp.add(translate=(1.5, 0, 0), scale=0.9)
    sc.add(grp)
    aovs = sc.render_aovs(samples_per_pixel=2)
    cov = np.asarray(aovs["coverage"])
    assert cov[:, :8].max() > 0.5 and cov[:, -8:].max() > 0.5
    assert cov[:, 11:13].max() < 0.5       # gap between the instances
    oid = np.asarray(aovs["obj_id"])
    ids = set(np.unique(oid[cov > 0.5].astype(int)))
    assert ids and all(0 <= i < 40 for i in ids)
    assert any(i < 20 for i in ids) and any(i >= 20 for i in ids)


def test_instances_validation(tmp_path):
    p = _icosphere_obj(tmp_path / "ico.obj")
    mesh = TriangleMesh(str(p), center=vec3(0, 0, 0),
                        material=Emissive(color=rgb(1, 1, 1)))
    grp = MeshInstances(mesh)
    with pytest.raises(ValueError):
        grp.add(scale=0.0)
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                  screen_width=4, screen_height=4)
    sc.add(grp)    # no instances added
    with pytest.raises(ValueError):
        compile_scene(sc)


def test_instanced_normal_map(tmp_path):
    """Tangent-space normal maps ride the instance transform: the perturbed
    normal of a rotated instance is the rotation of the unrotated one."""
    from raytracer_tpu import Emissive
    from raytracer_tpu.core.integrator import _apply_normal_maps
    from raytracer_tpu.geometry.attrs import hit_attributes
    from raytracer_tpu.geometry.intersect import nearest_hit

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
    nm = np.full((4, 4, 3), 0.5, np.float32)
    nm[..., 0] = 0.75    # +0.25 toward +u in tangent space
    nm[..., 2] = 0.75
    mat = Emissive(color=rgb(1, 1, 1))
    mat.set_normalmap(nm)
    sc = Scene()
    sc.add_Camera(look_from=vec3(-0.5, 0.5, 2), look_at=vec3(-0.5, 0.5, 0),
                  screen_width=8, screen_height=8)
    grp = MeshInstances(TriangleMesh(str(f), center=vec3(0, 0, 0),
                                     material=mat))
    grp.add(theta=90, axis=(0, 0, 1))     # x^ -> y^ about the mesh center
    sc.add(grp)
    static, data = compile_scene(sc)
    assert any(r.basis_kind == "tri" for r in static.normal_maps)

    O = jnp.asarray([[-0.5, 0.5, 2.0]], jnp.float32)
    D = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    t, orient, obj = nearest_hit(O, D, data.geom)
    assert float(t[0]) < 1e30
    P = O + t[:, None] * D
    N_geo, uv = hit_attributes(P, obj, data.geom, static, force_uv=True)
    N = np.asarray(_apply_normal_maps(N_geo, P, uv, obj, data, static))
    # unrotated answer is (1, 0, 1)/sqrt(2); the instance rotation maps it
    # to (0, 1, 1)/sqrt(2)
    expected = np.array([0.0, 1.0, 1.0]) / np.sqrt(2.0)
    assert np.abs(N[0] - expected).max() < 1e-3, N


def test_instanced_normal_map_validation(tmp_path):
    from raytracer_tpu import Emissive

    # no vt records -> tangent basis impossible
    p = _icosphere_obj(tmp_path / "ico.obj")
    mat = Emissive(color=rgb(1, 1, 1))
    mat.set_normalmap(np.full((4, 4, 3), 0.5, np.float32))
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                  screen_width=4, screen_height=4)
    grp = MeshInstances(TriangleMesh(str(p), center=vec3(0, 0, 0),
                                     material=mat))
    grp.add()
    sc.add(grp)
    with pytest.raises(ValueError, match="vt"):
        compile_scene(sc)

    # instances disagreeing on the map -> one slot table can't serve both
    p2 = _icosphere_obj(tmp_path / "ico2.obj", with_vt=True)
    mat2 = Emissive(color=rgb(1, 1, 1))
    mat2.set_normalmap(np.full((4, 4, 3), 0.6, np.float32))
    sc2 = Scene()
    sc2.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                   screen_width=4, screen_height=4)
    m = Emissive(color=rgb(1, 1, 1))
    m.set_normalmap(np.full((4, 4, 3), 0.5, np.float32))
    grp2 = MeshInstances(TriangleMesh(str(p2), center=vec3(0, 0, 0),
                                      material=m))
    grp2.add()
    grp2.add(translate=(2, 0, 0), material=mat2)
    sc2.add(grp2)
    with pytest.raises(ValueError, match="share one"):
        compile_scene(sc2)


def test_instanced_sharded_matches_single(tmp_path):
    """Instanced scenes render through the sharded (shard_map + psum) path:
    an 8-virtual-device sharded render matches the single-device image."""
    from raytracer_tpu.parallel.sharded import make_mesh, render_sharded

    p = _icosphere_obj(tmp_path / "ico.obj")
    sc = _scene_base()
    grp = MeshInstances(TriangleMesh(str(p), center=vec3(0, 0, -2),
                                     material=_glossy(rgb(0.8, 0.3, 0.2))))
    for x in XFORMS:
        grp.add(**x)
    sc.add(grp)
    # render_sharded returns the (H, W, 3) sRGB float array in [0, 1]
    a = np.asarray(render_sharded(sc, samples_per_pixel=8, mesh=make_mesh(8)),
                   float)
    b = np.asarray(sc.render(samples_per_pixel=8, seed=0), float) / 255.0
    # different sample partitions -> statistically equal, not bit-equal
    assert abs(a.mean() - b.mean()) < 2.0 / 255.0
    assert np.abs(a.mean(axis=(0, 1)) - b.mean(axis=(0, 1))).max() < 3.0 / 255.0
