"""Stereo 360 (omni-directional stereo) frame of a small interior scene.

`render_ods` renders one equirect frame per eye with each ray's origin
displaced half the interpupillary distance along the horizontal tangent of
its azimuth — the ODS projection VR-video players expect.  The default
top/bottom layout (left eye on top) plays directly as stereo 360 video.
The reference camera is pinhole-only (sightpy/camera.py:8-49).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403


def build_scene(width=512, height=256):
    sc = Scene(ambient_color=(0.02, 0.02, 0.02))
    sc.add_Camera(look_from=vec3(0.0, 0.1, 0.0), look_at=vec3(1.0, 0.1, 0.0),
                  screen_width=width, screen_height=height,
                  projection="equirect")
    # floor + ceiling, and near/far markers at distinct azimuths so the
    # stereo disparity is easy to inspect (near objects shift between eyes)
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.7, 0.7, 0.7)),
                 center=vec3(0, -0.5, 0), width=20.0, height=20.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, 1)))
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.9, 0.25, 0.2)),
                  center=vec3(1.2, 0.0, 0.0), radius=0.35))      # near, +x
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.2, 0.4, 0.9)),
                  center=vec3(0.0, 0.0, 1.5), radius=0.4))       # near, +z
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.3, 0.8, 0.3)),
                  center=vec3(-6.0, 0.5, 0.0), radius=1.0))      # far, -x
    sc.add(Sphere(material=Emissive(color=rgb(6, 6, 6)),
                  center=vec3(0, 4.0, -2.0), radius=1.0),
           importance_sampled=True)
    return sc


Sc = build_scene()

if __name__ == "__main__":
    img = render_ods(Sc, samples_per_pixel=32, ipd=0.2)
    img.save("EXAMPLE_VR.png")
