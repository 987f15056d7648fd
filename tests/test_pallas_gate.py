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
