"""Camera projections beyond the reference's pinhole + thin lens
(sightpy/camera.py:8-49): orthographic (parallel rays) and circular
equidistant fisheye.  The equirect 360 camera has its own suite
(test_equirect.py).
"""

import numpy as np
import pytest

from raytracer_tpu import Emissive, Scene, Sphere, rgb, vec3
from raytracer_tpu.core.camera import Camera, projection_mask


def scene_with(projection, W=64, H=48, fov=90.0, spheres=(),
               look_from=(0, 0, 0), look_at=(0, 0, -1)):
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(*look_from), look_at=vec3(*look_at),
                  screen_width=W, screen_height=H, field_of_view=fov,
                  projection=projection)
    for center, radius in spheres:
        sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                      center=vec3(*center), radius=radius))
    return sc


def lit_mask(img, thresh=30):
    return np.asarray(img).sum(-1) > thresh


# -- orthographic ------------------------------------------------------------

def test_orthographic_translation_invariant_along_axis():
    # parallel rays: moving the camera along fwd must not change the image
    spheres = [((0.4, 0.1, -6.0), 0.5), ((-0.8, -0.3, -9.0), 0.7)]
    a = scene_with("orthographic", spheres=spheres,
                   look_from=(0, 0, 0)).render(2, seed=0)
    b = scene_with("orthographic", spheres=spheres,
                   look_from=(0, 0, 3), look_at=(0, 0, 2)).render(2, seed=0)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_orthographic_no_perspective_shrink():
    # a sphere twice as far subtends the SAME pixel area under orthographic
    # projection, and roughly half the width under pinhole
    near = scene_with("orthographic", spheres=[((0, 0, -4), 0.5)],
                      fov=60).render(2, seed=0)
    far = scene_with("orthographic", spheres=[((0, 0, -8), 0.5)],
                     fov=60).render(2, seed=0)
    n_near = lit_mask(near).sum()
    n_far = lit_mask(far).sum()
    assert n_near > 20
    assert abs(n_near - n_far) <= 0.1 * n_near
    pin_near = lit_mask(scene_with("pinhole", spheres=[((0, 0, -4), 0.5)],
                                   fov=60).render(2, seed=0)).sum()
    pin_far = lit_mask(scene_with("pinhole", spheres=[((0, 0, -8), 0.5)],
                                  fov=60).render(2, seed=0)).sum()
    assert pin_far < 0.5 * pin_near


def test_orthographic_footprint_matches_focal_plane():
    # fov=90, focal=1 -> the film spans tan(45)*2 = 2 world units; a
    # radius-0.5 sphere (diameter 1) covers ~W/2 pixels of the middle row
    W, H = 64, 64
    sc = scene_with("orthographic", W=W, H=H, fov=90,
                    spheres=[((0, 0, -5), 0.5)])
    img = sc.render(2, seed=0)
    cols = lit_mask(img)[H // 2]
    width_px = cols.sum()
    assert abs(width_px - W / 2) <= 3


# -- fisheye -----------------------------------------------------------------

def test_fisheye_center_looks_forward():
    img = scene_with("fisheye", W=64, H=64, fov=180,
                     spheres=[((0, 0, -4), 0.4)]).render(2, seed=0)
    m = lit_mask(img)
    assert m[28:36, 28:36].any()


def test_fisheye_90deg_object_lands_on_circle_edge():
    # fov=180: a sphere at +90 deg azimuth (straight right) maps to the
    # right edge of the image circle, at the vertical center
    W = H = 64
    img = scene_with("fisheye", W=W, H=H, fov=180,
                     spheres=[((4.0, 0, 0), 0.5)]).render(2, seed=0)
    m = lit_mask(img)
    ys, xs = np.nonzero(m)
    assert m.any()
    assert abs(ys.mean() - (H - 1) / 2) < 3       # vertical center
    assert xs.mean() > W - 12                     # at the right rim


def test_fisheye_equidistant_radius():
    # fov=180: a sphere 45 deg off-axis sits at r ~ 0.5 of the image circle
    W = H = 96
    img = scene_with("fisheye", W=W, H=H, fov=180,
                     spheres=[((3.0, 0, -3.0), 0.3)]).render(2, seed=0)
    m = lit_mask(img)
    ys, xs = np.nonzero(m)
    r = np.hypot(xs.mean() - (W - 1) / 2, ys.mean() - (H - 1) / 2) / (W / 2)
    assert abs(r - 0.5) < 0.06


def test_fisheye_mask_blacks_corners():
    # even under a sky-bright background the corners stay black
    sc = scene_with("fisheye", W=48, H=48, fov=180)
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, 0), radius=50.0))   # enclosing emitter
    a = np.asarray(sc.render(2, seed=0))
    assert a[0, 0].sum() == 0 and a[-1, -1].sum() == 0
    assert a[24, 24].sum() > 100                        # center lit
    mask = projection_mask("fisheye", 48, 48).reshape(48, 48)
    assert (a.sum(-1)[mask == 0] == 0).all()
    assert projection_mask("pinhole", 48, 48) is None


def test_fisheye_mask_applies_to_linear_and_variance():
    sc = scene_with("fisheye", W=32, H=32, fov=180)
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, 0), radius=50.0))
    lin, var = sc.render(2, seed=0, output="linear", with_variance=True)
    mask = projection_mask("fisheye", 32, 32).reshape(32, 32)
    assert (lin[mask == 0] == 0).all()
    assert (var[mask == 0] == 0).all()
    assert lin[16, 16].sum() > 0.5


def test_fisheye_motion_blur_linear_masked():
    # render_motion_blur(output="linear") applies the same image-circle
    # mask as every other entry point
    from raytracer_tpu import render_motion_blur

    sc = scene_with("fisheye", W=24, H=24, fov=180)
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, 0), radius=50.0))

    def update(scene, t):
        pass

    lin = render_motion_blur(sc, 2, update, slices=2, output="linear")
    mask = projection_mask("fisheye", 24, 24).reshape(24, 24)
    assert (lin[mask == 0] == 0).all()
    assert lin[12, 12].sum() > 0.5


def test_fisheye_adaptive_ignores_masked_pixels():
    # adaptive sampling runs (nanquantile path) and output stays masked
    sc = scene_with("fisheye", W=24, H=24, fov=180,
                    spheres=[((0, 0, -3), 1.0)])
    img = np.asarray(sc.render(8, seed=0, batch_size=2, target_noise=0.5))
    assert img[0, 0].sum() == 0 and img[-1, -1].sum() == 0


def test_duck_typed_lights_still_compile():
    # 0.4.0 contract: light-like objects appended directly to Light_list
    # (with .pos/.color or .Ldir/.color) feed the light tables
    class MyLight:
        pos = np.asarray([0.0, 2.0, -1.0], np.float32)
        color = np.asarray([0.5, 0.5, 0.5], np.float32)

    from raytracer_tpu import Glossy
    from raytracer_tpu.core.compile import compile_scene

    sc = scene_with("pinhole", spheres=())
    from raytracer_tpu import Plane
    sc.add(Plane(material=Glossy(diff_color=rgb(1, 1, 1),
                                 n=vec3(1.5, 1.5, 1.5), roughness=0.0,
                                 diff_coeff=1.0, spec_coeff=0.0),
                 center=vec3(0, -0.5, -2), width=8, height=8,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.Light_list.append(MyLight())
    static, _ = compile_scene(sc)
    assert static.n_point_lights == 1 and static.n_spot_lights == 0
    img = np.asarray(sc.render(2, seed=0))
    assert img.max() > 30


def test_unknown_projection_rejected():
    with pytest.raises(ValueError, match="projection"):
        Camera(look_from=(0, 0, 0), look_at=(0, 0, -1), projection="cylinder")
