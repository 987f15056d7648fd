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
