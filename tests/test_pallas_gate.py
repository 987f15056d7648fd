"""Round-3 Pallas-gate widening: projections, spot lights, disc/cylinder.

Each feature here previously forced the jnp wavefront (core/compile.py gate /
scene.py projection check); now it routes through the kernels.  Tests assert
BOTH that the gate admits the scene (static.pallas_ok / pallas_tex_ok) and
that the kernel render matches the wavefront (same R2 sample set, so solid
scenes agree to float tolerance; the angular projections use the kernels'
polynomial atan2 and agree to ~1e-3).
"""

import numpy as np
import pytest

from raytracer_tpu import (Cylinder, Diffuse, Disc, Emissive, Glossy, Plane,
                           RenderSettings, Scene, Sphere, rgb, vec3)
from raytracer_tpu.core.compile import compile_scene


def both_linear(build, spp, seed=5):
    sc = build()
    sc.settings = RenderSettings(use_pallas="never")
    a = np.asarray(sc.render(samples_per_pixel=spp, seed=seed,
                             output="linear"))
    sc = build()
    sc.settings = RenderSettings(use_pallas="always")
    b = np.asarray(sc.render(samples_per_pixel=spp, seed=seed,
                             output="linear"))
    return a, b


def _tex_mat():
    from raytracer_tpu.textures import image

    tex = np.tile(np.linspace(0.1, 1.0, 16, dtype=np.float32)[None, :, None],
                  (16, 1, 3))
    return Diffuse(diff_color=image(tex))


# ---------------------------------------------------------------------------
# projections through the kernels
# ---------------------------------------------------------------------------


def _proj_scene(projection, textured):
    def build():
        sc = Scene(ambient_color=(0.05, 0.05, 0.05))
        mat = _tex_mat() if textured else Diffuse(diff_color=rgb(0.7, 0.3, 0.2))
        sc.add(Sphere(material=mat, center=vec3(0, 0, -2), radius=0.8))
        sc.add(Sphere(material=Emissive(color=rgb(4, 4, 4)),
                      center=vec3(1.5, 1.5, -1), radius=0.5))
        sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -2),
                      screen_width=24, screen_height=16,
                      projection=projection)
        return sc
    return build


@pytest.mark.parametrize("projection", ["fisheye", "orthographic", "equirect"])
@pytest.mark.parametrize("textured", [False, True])
def test_projection_routes_through_kernel(projection, textured):
    build = _proj_scene(projection, textured)
    static, _ = compile_scene(build())
    assert static.pallas_tex_ok if textured else static.pallas_ok
    a, b = both_linear(build, 32)
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 2e-3, rel


# ---------------------------------------------------------------------------
# spot lights in the kernels' glossy block
# ---------------------------------------------------------------------------


def _spot_scene(textured):
    def build():
        sc = Scene(ambient_color=(0.02, 0.02, 0.02))
        gmat = Glossy(diff_color=rgb(0.6, 0.6, 0.9), roughness=0.2,
                      spec_coeff=0.3, diff_coeff=0.7, n=(1.5 + 0.1j))
        if textured:
            from raytracer_tpu.textures import image

            tex = np.tile(np.linspace(0.2, 1.0, 16,
                                      dtype=np.float32)[None, :, None],
                          (16, 1, 3))
            gmat = Glossy(diff_color=image(tex), roughness=0.2,
                          spec_coeff=0.3, diff_coeff=0.7, n=(1.5 + 0.1j))
        sc.add(Plane(material=gmat, center=vec3(0, -1, -2), width=6, height=6,
                     u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
        sc.add(Sphere(material=Diffuse(diff_color=rgb(0.8, 0.2, 0.2)),
                      center=vec3(0, 0, -2), radius=0.6))
        sc.add_SpotLight(pos=vec3(0, 3, -2), direction=vec3(0, -1, 0),
                         color=rgb(8, 8, 8), angle=35.0, inner_angle=20.0)
        sc.add_PointLight(pos=vec3(2, 2, 0), color=rgb(2, 2, 2))
        sc.add_Camera(look_from=vec3(0, 0.5, 1.5), look_at=vec3(0, 0, -2),
                      screen_width=24, screen_height=16)
        return sc
    return build


@pytest.mark.parametrize("textured", [False, True])
def test_spotlight_routes_through_kernel(textured):
    build = _spot_scene(textured)
    static, _ = compile_scene(build())
    assert static.n_spot_lights == 1
    assert static.pallas_tex_ok if textured else static.pallas_ok
    a, b = both_linear(build, 48)
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 2e-3, rel


# ---------------------------------------------------------------------------
# disc / cylinder intersectors in the kernels
# ---------------------------------------------------------------------------


def _disc_cyl_scene(textured):
    def build():
        sc = Scene(ambient_color=(0.05, 0.05, 0.05))
        dmat = _tex_mat() if textured else Diffuse(diff_color=rgb(0.7, 0.3, 0.2))
        sc.add(Disc(material=dmat, center=vec3(0, -0.5, -2),
                    normal=vec3(0, 1, 0), radius=1.5, inner_radius=0.2))
        sc.add(Cylinder(material=Glossy(diff_color=rgb(0.3, 0.5, 0.8),
                                        roughness=0.3, spec_coeff=0.2,
                                        diff_coeff=0.8, n=(1.4 + 0.2j)),
                        center=vec3(0.8, 0.1, -2.2), axis=vec3(0, 1, 0),
                        radius=0.3, height=1.0, capped=True))
        sc.add(Sphere(material=Emissive(color=rgb(4, 4, 4)),
                      center=vec3(1.5, 2, -1), radius=0.5))
        sc.add_PointLight(pos=vec3(-2, 2, 0), color=rgb(3, 3, 3))
        sc.add_Camera(look_from=vec3(0, 0.8, 1.5), look_at=vec3(0, 0, -2),
                      screen_width=24, screen_height=16)
        return sc
    return build


@pytest.mark.parametrize("textured", [False, True])
def test_disc_cylinder_route_through_kernel(textured):
    build = _disc_cyl_scene(textured)
    static, _ = compile_scene(build())
    assert static.n_discs == 1 and static.n_cylinders == 1
    assert static.pallas_tex_ok if textured else static.pallas_ok
    a, b = both_linear(build, 48)
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 2e-3, rel


# ---------------------------------------------------------------------------
# R5: post-merge group gate — many distinct materials of few KINDS ride the
# solid kernel (the kernel compiles one block per merged group since R4.11;
# the gate now counts merged groups, core/compile.py).  Reference analogue:
# arbitrarily many materials in the collider loop (ray.py:131-146).
# ---------------------------------------------------------------------------


def _many_material_scene(n_spheres=40):
    # diffuse-only (no glossy): a glossy group would sweep 40 shadow
    # objects per light per bounce — minutes in the Pallas interpreter;
    # the gate logic under test is the same either way
    def build():
        sc = Scene(ambient_color=(0.03, 0.03, 0.03))
        rng = np.random.default_rng(11)
        for i in range(n_spheres):
            c = rng.uniform(0.2, 0.9, 3)
            x = (i % 8 - 3.5) * 0.9
            z = 0.1 * (i % 3)
            # every sphere gets its OWN material instance: 40 distinct
            # slots, but only 2 merged groups (diffuse + emissive)
            mat = Diffuse(diff_color=rgb(*c), diffuse_rays=1)
            sc.add(Sphere(material=mat,
                          center=vec3(x, (i // 8 - 2.0) * 0.9, -4 + z),
                          radius=0.4, max_ray_depth=1))
        sc.add(Sphere(material=Emissive(color=rgb(2, 2, 2.2)),
                      center=vec3(0, 0, 0), radius=40.0, shadow=False))
        sc.add_Camera(look_from=vec3(0, 1.5, 2), look_at=vec3(0, 0, -4),
                      screen_width=16, screen_height=12)
        return sc
    return build


def test_many_materials_route_through_solid_kernel():
    build = _many_material_scene()
    static, _ = compile_scene(build())
    # 41 per-slot groups (> the 36 cap) but only 2 merged groups
    n_slot = len({(r.mat_type, r.mat_slot, r.max_depth, r.mc)
                  for r in static.obj_records})
    assert n_slot > 36, n_slot
    assert static.pallas_ok
    # spp 32 still traces ONE interpreter tile (16x12x32 < 16384 lanes);
    # the second diffuse bounce draws from per-path streams, so the
    # kernel/wavefront difference is MC noise ~1/sqrt(spp)
    a, b = both_linear(build, 32)
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 3e-3, rel


def test_many_slot_groups_still_gate_record_kernel():
    # the record kernel keeps per-slot blocks — a textured scene past the
    # per-slot cap must stay on the wavefront even though its merged count
    # is tiny
    def build():
        sc = Scene(ambient_color=(0.03, 0.03, 0.03))
        rng = np.random.default_rng(3)
        from raytracer_tpu.textures import image
        tex = np.tile(np.linspace(0.1, 1.0, 8, dtype=np.float32)[None, :, None],
                      (8, 1, 3))
        sc.add(Sphere(material=Diffuse(diff_color=image(tex)),
                      center=vec3(0, 0, -3), radius=0.5))
        for i in range(38):
            c = rng.uniform(0.2, 0.9, 3)
            sc.add(Sphere(material=Diffuse(diff_color=rgb(*c), diffuse_rays=1),
                          center=vec3((i % 8 - 3.5) * 0.9, 1.5, -4),
                          radius=0.3, max_ray_depth=2))
        sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -3),
                      screen_width=16, screen_height=12)
        return sc
    static, _ = compile_scene(build())
    n_slot = len({(r.mat_type, r.mat_slot, r.max_depth, r.mc)
                  for r in static.obj_records})
    assert n_slot > 36, n_slot
    assert not static.pallas_ok          # texture => solid kernel ineligible
    assert not static.pallas_tex_ok      # per-slot blocks past the wall
