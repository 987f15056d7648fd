"""360x180 panorama render: the motion-blur still life seen all around.

`Camera(projection="equirect")` maps the image to azimuth x elevation — one
render produces a full spherical panorama (viewable in any 360 viewer, or
usable as an environment map: `Scene.render_environment` bakes the same
thing in the env-fetch storage convention so another scene can use it as
`add_Background(spherical=True, linear=True)`).  The reference's camera is
pinhole-only (sightpy/camera.py:8-49).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403
import example_motion_blur  # noqa: E402


# named build_scene so the CLI's --width/--height overrides rebuild THIS
# camera (not the imported pinhole scene's)
def build_scene(width=512, height=256):
    sc = example_motion_blur.build_scene()
    sc.camera = Camera(look_from=vec3(0, 0.35, 0.6), look_at=vec3(0, 0.3, -1),
                       screen_width=width, screen_height=height,
                       projection="equirect")
    return sc


build_panorama = build_scene
Sc = build_scene()

if __name__ == "__main__":
    img = Sc.render(samples_per_pixel=64, progress_bar=True)
    img.save("EXAMPLE_PANORAMA.png")
