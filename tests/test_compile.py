import numpy as np

from raytracer_tpu import (Cuboid, Diffuse, Emissive, Glossy, Plane,
                           Refractive, Scene, Sphere, rgb, vec3)
from raytracer_tpu.core.compile import compile_scene
from raytracer_tpu.materials.base import (MAT_DIFFUSE, MAT_EMISSIVE,
                                          MAT_GLOSSY, MAT_REFRACTIVE)


def small_scene():
    sc = Scene(ambient_color=rgb(0.1, 0.2, 0.3))
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    g = Glossy(diff_color=rgb(1, 0, 0), n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j),
               roughness=0.2, spec_coeff=0.3, diff_coeff=0.9)
    d = Diffuse(diff_color=rgb(0.7, 0.7, 0.7))
    e = Emissive(color=rgb(15, 15, 15))
    r = Refractive(n=vec3(1.5 + 4e-8j, 1.5, 1.5))
    sc.add(Sphere(material=g, center=vec3(0, 0, -3), radius=1.0, max_ray_depth=3))
    sc.add(Sphere(material=r, center=vec3(2, 0, -3), radius=0.5, shadow=False, mc=True))
    sc.add(Plane(material=e, center=vec3(0, 2, -3), width=1.0, height=1.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, 1)), importance_sampled=True)
    sc.add(Cuboid(material=d, center=vec3(-2, 0, -3), width=1, height=2, length=1))
    return sc


def test_counts_and_layout():
    static, data = compile_scene(small_scene())
    assert (static.n_spheres, static.n_planes, static.n_boxes, static.n_tris) == (2, 1, 1, 0)
    assert static.n_objects == 4
    # object order: spheres, planes, boxes
    mt = np.asarray(data.obj.mat_type)
    assert mt.tolist() == [MAT_GLOSSY, MAT_REFRACTIVE, MAT_EMISSIVE, MAT_DIFFUSE]
    assert np.asarray(data.obj.shadow).tolist() == [True, False, True, True]
    assert np.asarray(data.obj.mc).tolist() == [False, True, False, False]
    assert np.asarray(data.obj.max_depth).tolist() == [3, 5, 5, 5]


def test_material_tables():
    static, data = compile_scene(small_scene())
    assert np.allclose(np.asarray(data.mats.emissive_color)[0], [15, 15, 15])
    assert np.allclose(np.asarray(data.mats.glossy_n_im)[0], [0.3, 0.3, 0.3])
    assert np.allclose(np.asarray(data.mats.refr_n_re)[0], [1.5, 1.5, 1.5])
    assert np.allclose(np.asarray(data.ambient_color), [0.1, 0.2, 0.3])


def test_importance_targets():
    static, data = compile_scene(small_scene())
    assert static.n_is_targets == 1
    # bounded sphere radius of a 1x1 plane = sqrt(0.5)
    assert np.isclose(float(data.is_radius[0]), np.sqrt(0.5), atol=1e-5)


def test_shared_material_one_slot():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=4, screen_height=4)
    d = Diffuse(diff_color=rgb(0.5, 0.5, 0.5))
    sc.add(Sphere(material=d, center=vec3(0, 0, -3), radius=1.0))
    sc.add(Sphere(material=d, center=vec3(2, 0, -3), radius=1.0))
    static, data = compile_scene(sc)
    assert data.mats.diffuse_color.shape[0] == 1
    assert np.asarray(data.obj.mat_slot).tolist() == [0, 0]


def test_rotation_lowering():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=4, screen_height=4)
    d = Diffuse(diff_color=rgb(0.5, 0.5, 0.5))
    cb = Cuboid(material=d, center=vec3(0, 0, 0), width=2, height=2, length=2)
    cb.rotate(θ=90, u=vec3(0, 1, 0))
    sc.add(cb)
    static, data = compile_scene(sc)
    basis = np.asarray(data.geom.box_basis)[0]
    # rows are rotated axes; 90 deg about y maps x -> -z
    assert np.allclose(basis[0], [0, 0, -1], atol=1e-6)
    assert np.allclose(basis @ basis.T, np.eye(3), atol=1e-6)


def test_pallas_gate_bounds_shading_groups():
    # The compiler wall is the number of unrolled shading BLOCKS: ~46+
    # blocks kill the TPU compiler subprocess (scripts/probe_obj_cap.py).
    # Since R4.11 the solid kernel compiles one block per MERGED group
    # (kind x depth x mc), and since R5 the gate counts those — so 46
    # spheres with 46 distinct same-kind materials (2 merged groups) now
    # RIDE the kernel, while 46 distinct MERGED keys (max_ray_depth varied
    # per object) still route to the wavefront.
    from raytracer_tpu import Emissive, Sphere
    from raytracer_tpu.materials.base import Diffuse as DiffuseMat

    def build(n_materials, vary_depth=False):
        sc = Scene()
        sc.add_Camera(look_from=vec3(0, 0, 5), look_at=vec3(0, 0, 0),
                      screen_width=8, screen_height=8)
        mats = [DiffuseMat(diff_color=rgb(0.1 + 0.01 * i, 0.5, 0.5),
                           diffuse_rays=1) for i in range(n_materials)]
        for i in range(46):
            sc.add(Sphere(material=mats[i % n_materials],
                          center=vec3(i * 1.0, 0, 0), radius=0.4,
                          max_ray_depth=2 + (i if vary_depth else 0)))
        sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                      center=vec3(0, 0, 0), radius=200.0, shadow=False))
        return sc

    static_many, _ = compile_scene(build(46))     # 47 slots, 2 merged
    assert static_many.pallas_ok                  # R5 widened gate
    static_deep, _ = compile_scene(build(46, vary_depth=True))  # 47 merged
    assert not static_deep.pallas_ok and not static_deep.pallas_tex_ok
    static_few, _ = compile_scene(build(4))       # 6 groups either way
    assert static_few.pallas_ok
