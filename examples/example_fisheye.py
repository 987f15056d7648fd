"""Circular 180-degree fisheye of the motion-blur still life.

`Camera(projection="fisheye")` is an equidistant fisheye: the angle off the
view axis is linear in distance from the image center, and the image circle
(touching the smaller frame dimension) spans `field_of_view` across its
diameter — 180 here, a full hemisphere in one frame.  Pixels outside the
circle are black.  The reference camera is pinhole-only
(sightpy/camera.py:8-49).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403
import example_motion_blur  # noqa: E402


def build_scene(width=400, height=400):
    sc = example_motion_blur.build_scene()
    sc.camera = Camera(look_from=vec3(0, 0.45, 0.9), look_at=vec3(0, 0.2, -1),
                       screen_width=width, screen_height=height,
                       field_of_view=180.0, projection="fisheye")
    return sc


Sc = build_scene()

if __name__ == "__main__":
    img = Sc.render(samples_per_pixel=64, progress_bar=True)
    img.save("EXAMPLE_FISHEYE.png")
