"""The extended primitive palette: Disc (annulus) and Cylinder.

Both are beyond the reference (sightpy's geometry is sphere / rectangle /
cuboid / triangle only).  A brushed-metal ring stands behind a glass
cylinder and a matte open tube on a checkered floor.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from raytracer_tpu import *  # noqa: E402,F401,F403


def _checker(n=256, sq=32):
    t = (np.indices((n, n)).sum(axis=0) // sq) % 2
    return (0.25 + 0.65 * t)[..., None].repeat(3, -1).astype(np.float32)


def build_scene(width=400, height=300):
    sc = Scene(ambient_color=rgb(0.03, 0.03, 0.035))
    sc.add_Camera(look_from=vec3(0, 0.9, 2.6), look_at=vec3(0, 0.15, -2.2),
                  screen_width=width, screen_height=height, field_of_view=55)
    sc.add_DirectionalLight(Ldir=vec3(0.45, 0.6, 0.4),
                            color=rgb(0.25, 0.25, 0.24))
    sc.add_SpotLight(pos=vec3(-1.8, 2.6, -0.6),
                     direction=vec3(0.55, -1.0, -0.55),
                     color=rgb(0.05, 0.05, 0.05), angle=26, inner_angle=16)

    floor = Glossy(diff_color=image(_checker(), repeat=4),
                   n=vec3(1.4, 1.4, 1.4), roughness=0.25,
                   diff_coeff=0.9, spec_coeff=0.1)
    sc.add(Plane(material=floor, center=vec3(0, -0.5, -2.2), width=14,
                 height=14, u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))

    gold = Glossy(diff_color=rgb(1.0, 0.572, 0.184),
                  n=vec3(0.15 + 3.58j, 0.4 + 2.37j, 1.54 + 1.91j),
                  roughness=0.0, diff_coeff=0.35, spec_coeff=0.65)
    ring = Disc(material=gold, center=vec3(-0.05, 0.35, -3.1), radius=0.8,
                inner_radius=0.5, normal=vec3(0.1, 0.15, 1.0))
    sc.add(ring)

    glass = Refractive(n=vec3(1.5 + 0j, 1.52 + 0j, 1.54 + 0j))
    sc.add(Cylinder(material=glass, center=vec3(0.75, 0.05, -2.2),
                    radius=0.35, height=1.1, max_ray_depth=5))

    matte = Diffuse(diff_color=rgb(0.85, 0.3, 0.25), diffuse_rays=8)
    tube = Cylinder(material=matte, center=vec3(-1.1, -0.1, -1.9),
                    radius=0.28, height=0.8, capped=False)
    tube.rotate(25, vec3(0, 0, 1))
    sc.add(tube)
    return sc


Sc = build_scene()

if __name__ == "__main__":
    img = Sc.render(samples_per_pixel=64, progress_bar=True)
    img.save("EXAMPLE_PRIMITIVES.png")
