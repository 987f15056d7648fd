"""TPU-first animation: frame-axis sharding + pipelined encode
(raytracer_tpu/animation.py vs reference sightpy/animation.py:6-54)."""

import numpy as np
import pytest

from raytracer_tpu import Emissive, Plane, Scene, Sphere, rgb, vec3
from raytracer_tpu.animation import (create_animation, render_frames)


def moving_sphere_scene():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=24, screen_height=16)
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(-0.8, 0, -1), radius=0.3))
    return sc


def slide(scene, t):
    scene.scene_primitives[0].center = np.asarray([-0.8 + 1.6 * t, 0.0, -1.0],
                                                  np.float32)


def test_render_frames_motion_and_shape():
    sc = moving_sphere_scene()
    times = [i / 9 for i in range(10)]        # 10 frames over 8 devices
    frames = list(render_frames(sc, samples_per_pixel=2, times=times,
                                update_scene=slide))
    assert len(frames) == 10
    assert frames[0].shape == (16, 24, 3) and frames[0].dtype == np.uint8
    # the bright blob must sweep left -> right across frames
    def centroid_x(f):
        ys, xs = np.where(f.sum(-1) > 100)
        return xs.mean()
    cx = [centroid_x(f) for f in frames]
    assert cx[0] < cx[4] < cx[9]
    assert cx[9] - cx[0] > 4


def test_render_frames_matches_scene_render():
    # frame 0 uses key fold_in(seed, 0) — the SAME stream Scene.render's
    # first chunk uses — so its pixels must match bit-for-bit; later frames
    # draw different AA jitter, so only silhouette pixels may differ
    sc = moving_sphere_scene()
    times = [0.0, 0.5]
    frames = list(render_frames(sc, samples_per_pixel=2, times=times,
                                update_scene=slide))
    slide(sc, times[0])
    ref0 = np.asarray(sc.render(samples_per_pixel=2))
    assert np.array_equal(frames[0], ref0)
    slide(sc, times[1])
    ref1 = np.asarray(sc.render(samples_per_pixel=2))
    # same blob, jitter-level edge differences only
    assert abs(int((frames[1].sum(-1) > 100).sum())
               - int((ref1.sum(-1) > 100).sum())) <= 2


def test_create_animation_writes_frames(tmp_path):
    sc = moving_sphere_scene()
    fps = create_animation(sc, samples_per_pixel=1, fps=4, start_time=0.0,
                           final_time=1.0, update_scene=slide, name="clip",
                           frames_dir=str(tmp_path))
    assert fps > 0
    files = sorted(tmp_path.glob("clip_*.png"))
    assert len(files) == 4


def test_structure_change_rejected():
    sc = moving_sphere_scene()

    def mutate(scene, t):
        if t > 0 and len(scene.scene_primitives) == 1:
            scene.add(Plane(material=Emissive(color=rgb(1, 0, 0)),
                            center=vec3(0, 0, -3), width=10.0, height=10.0,
                            u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))

    with pytest.raises(ValueError, match="STRUCTURE"):
        list(render_frames(sc, samples_per_pixel=1, times=[0.0, 1.0],
                           update_scene=mutate))


def test_motion_blur_streak_and_mean():
    """A sphere sweeping across the shutter leaves a streak whose horizontal
    support covers the whole path; total emitted energy matches the
    per-instant renders' average (the shutter integral)."""
    from raytracer_tpu.animation import render_motion_blur

    sc = moving_sphere_scene()
    img = np.asarray(render_motion_blur(sc, samples_per_pixel=16,
                                        update_scene=slide, slices=8),
                     float)
    assert img.shape == (16, 24, 3)
    lit = img.sum(-1) > 30
    xs = np.where(lit.any(axis=0))[0]
    # the streak must span clearly more columns than the instantaneous
    # sphere footprint (the 1.6-unit sweep covers ~6 px at this camera)
    slide(sc, 0.5)
    inst = np.asarray(sc.render(samples_per_pixel=4, seed=1), float)
    ixs = np.where((inst.sum(-1) > 30).any(axis=0))[0]
    assert xs.max() - xs.min() >= (ixs.max() - ixs.min()) + 4, (xs, ixs)
    # energy check in LINEAR radiance vs the average of per-slice instant
    # renders (the shutter integral); the blur quadrature on this tiny
    # frame wanders a few percent seed-to-seed, never more
    lin = render_motion_blur(sc, samples_per_pixel=64, update_scene=slide,
                             slices=8, seed=1, output="linear")
    insts = []
    for j in range(8):
        slide(sc, (j + 0.5) / 8)
        insts.append(np.asarray(
            sc.render(samples_per_pixel=32, seed=7, output="linear")))
    ref = np.mean(insts, axis=0)
    assert abs(lin.mean() - ref.mean()) / max(ref.mean(), 1e-9) < 0.06


def test_motion_blur_static_matches_render():
    """With a no-op update the blur is just a render: statistically equal to
    Scene.render at the same spp."""
    from raytracer_tpu.animation import render_motion_blur

    sc = moving_sphere_scene()
    img = np.asarray(render_motion_blur(sc, samples_per_pixel=8,
                                        update_scene=lambda s, t: None,
                                        slices=4), float)
    ref = np.asarray(sc.render(samples_per_pixel=8, seed=0), float)
    assert abs(img.mean() - ref.mean()) < 2.0
    # same silhouette up to AA jitter
    assert (np.abs((img.sum(-1) > 100).astype(int)
                   - (ref.sum(-1) > 100).astype(int)).sum()) <= 4


def test_motion_blur_structure_change_rejected():
    from raytracer_tpu.animation import render_motion_blur

    sc = moving_sphere_scene()

    def mutate(scene, t):
        if t > 0.5 and len(scene.scene_primitives) == 1:
            scene.add(Sphere(material=Emissive(color=rgb(1, 0, 0)),
                             center=vec3(0, 0, -4), radius=0.2))

    with pytest.raises(ValueError, match="STRUCTURE"):
        render_motion_blur(sc, samples_per_pixel=4, update_scene=mutate,
                           slices=8)
