"""compile_scene_cached: hits skip recompilation, any mutation invalidates.

The fingerprint must cover EVERY input compile_scene reads (the cache can
never serve stale tables after in-place mutation — the animation API mutates
scene objects between frames, reference animation.py:27-31).
"""

import numpy as np

from raytracer_tpu import (Cuboid, Diffuse, Emissive, Glossy, Plane, Scene,
                           Sphere, rgb, vec3)
from raytracer_tpu.core.compile import (compile_scene_cached,
                                        scene_fingerprint)


def build():
    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add_DirectionalLight(Ldir=vec3(0.5, 0.8, 0.3), color=rgb(0.5, 0.5, 0.5))
    sc.add(Sphere(material=Glossy(diff_color=rgb(1, 0.5, 0.2),
                                  n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.2 + 0.3j),
                                  roughness=0.2, spec_coeff=0.3, diff_coeff=0.7),
                  center=vec3(0, 0, -3), radius=1.0))
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.6, 0.6, 0.6)),
                 center=vec3(0, -1, 0), width=10, height=10,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Cuboid(material=Emissive(color=rgb(2, 2, 2)),
                  center=vec3(2, 2, -3), width=1, height=1, length=1))
    return sc


def test_cache_hits_and_is_reused():
    sc = build()
    s1, d1 = compile_scene_cached(sc)
    s2, d2 = compile_scene_cached(sc)
    assert s1 is s2 and d1 is d2           # identity: no rebuild, no upload


def test_every_mutation_invalidates():
    sc = build()
    base = scene_fingerprint(sc)
    assert scene_fingerprint(sc) == base   # deterministic

    sphere, plane, box = sc.scene_primitives
    mutations = [
        lambda: sphere.center.__setitem__(0, sphere.center[0] + 0.5),
        lambda: setattr(sphere, "radius", 1.5),
        lambda: setattr(sphere.material, "roughness", 0.9),
        lambda: setattr(sphere.material.diff_texture, "color",
                        np.asarray([0.1, 0.9, 0.1])),
        lambda: setattr(plane.material, "ambient_weight", 0.9),
        lambda: box.rotate(θ=30, u=vec3(0, 1, 0)),
        lambda: setattr(sc.Light_list[0], "color",
                        np.asarray([0.9, 0.1, 0.1])),
        lambda: setattr(sc, "ambient_color", np.asarray([0.2, 0.2, 0.2])),
        lambda: sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                              center=vec3(-2, 0, -3), radius=0.5)),
        lambda: setattr(sphere, "shadow", False),
        lambda: setattr(sphere, "max_ray_depth", 7),
    ]
    prev = base
    for i, mutate in enumerate(mutations):
        mutate()
        fp = scene_fingerprint(sc)
        assert fp != prev, f"mutation #{i} did not change the fingerprint"
        prev = fp


def test_mutated_scene_rerenders():
    # end-to-end: move the emissive box between renders; the cached compile
    # must be discarded and the image must change
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=16, screen_height=16)
    # (a Sphere: its center is read directly at compile; a Cuboid's local
    # corners are precomputed at construction — mutating its center alone
    # moves nothing, same as the reference's Cuboid_Collider)
    ball = Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(-0.8, 0, -3), radius=0.5)
    sc.add(ball)
    a = np.asarray(sc.render(samples_per_pixel=1, seed=0), np.float32)
    ball.center[0] += 1.6
    b = np.asarray(sc.render(samples_per_pixel=1, seed=0), np.float32)
    assert not np.allclose(a, b)
    # bright region must have moved from left to right
    assert a[:, :8].sum() > a[:, 8:].sum()
    assert b[:, 8:].sum() > b[:, :8].sum()


def test_triangle_mesh_rotation_invalidates(tmp_path):
    from raytracer_tpu import TriangleMesh

    obj = tmp_path / "t.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=4, screen_height=4)
    mesh = TriangleMesh(str(obj), center=vec3(0, 0, 0),
                        material=Emissive(color=rgb(1, 1, 1)))
    sc.add(mesh)
    fp0 = scene_fingerprint(sc)
    mesh.rotate(θ=45, u=vec3(0, 1, 0))
    assert scene_fingerprint(sc) != fp0
