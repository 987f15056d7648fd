"""Spectral dispersion: a BK7-ish glass sphere splitting white light.

The reference cannot render this — its Refractive averages the per-channel
IoRs for the refraction direction ("Spectrum dispersion is not implemented",
refractive.py:76).  `Refractive(dispersion=True)` switches transmitted
paths to hero-wavelength sampling (materials/shade.py): chromatic fringes
appear wherever refraction displaces the background differently per channel.

Run: python examples/example_dispersion.py [--quick]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import (Diffuse, Emissive, Plane, Refractive, Scene,
                           Sphere, rgb, vec3)


def build_scene(W=400, H=300, exaggerate=3.0):
    """exaggerate scales the channel spread (1.0 = real BK7 at 630/555/475
    nm; the default 3x makes the fringes obvious at screen resolution)."""
    n0 = 1.5168
    dr, dg, db = -0.0062, -0.0013, 0.0067     # BK7 spread about n_d
    k = exaggerate
    n = vec3(n0 + k * dr + 1e-8j, n0 + k * dg + 1e-8j, n0 + k * db + 1e-8j)

    sc = Scene(ambient_color=rgb(0.02, 0.02, 0.02))
    sc.add_Camera(look_from=vec3(0.0, 0.1, 1.8), look_at=vec3(0, 0, -1),
                  screen_width=W, screen_height=H, field_of_view=40)
    sc.add(Sphere(material=Refractive(n=n, dispersion=True),
                  center=vec3(0, 0, -0.2), radius=0.55, shadow=False,
                  max_ray_depth=4))
    # high-contrast backdrop: thin bright bars on dark — displacement per
    # channel reads as rainbow fringing on every bar edge
    bars = Plane(material=Emissive(color=rgb(4.0, 4.0, 4.0)),
                 center=vec3(0, 0, -4.0), width=0.12, height=6.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0))
    sc.add(bars)
    for dx in (-1.0, -0.5, 0.5, 1.0):
        sc.add(Plane(material=Emissive(color=rgb(4.0, 4.0, 4.0)),
                     center=vec3(dx, 0, -4.0), width=0.12, height=6.0,
                     u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.05, 0.05, 0.06)),
                 center=vec3(0, 0, -4.01), width=40.0, height=40.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    sc.add(Sphere(material=Emissive(color=rgb(0.35, 0.35, 0.4)),
                  center=vec3(0, 0, 0), radius=30.0, shadow=False))
    return sc


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    sc = build_scene(120 if quick else 400, 90 if quick else 300)
    img = sc.render(samples_per_pixel=16 if quick else 256,
                    progress_bar=True)
    img.save("EXAMPLE_DISPERSION.png")
    print("wrote EXAMPLE_DISPERSION.png")
