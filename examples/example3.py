"""Rotated glass cuboid on a checkered floor (reference example3.py)."""
from _assets import background_for, floor_texture

from raytracer_tpu import *

floor = Glossy(diff_color=floor_texture(repeat=2.0),
               roughness=0.2, spec_coeff=0.3, diff_coeff=0.7,
               n=vec3(2.2, 2.2, 2.2))
green_glass = Refractive(n=vec3(1.5 + 4e-8j, 1.5 + 0.0j, 1.5 + 4e-8j))

Sc = Scene()
Sc.add_Camera(look_from=vec3(0.0, 0.25, 1.0), look_at=vec3(0.0, 0.25, -3.0),
              screen_width=400, screen_height=300)
Sc.add_DirectionalLight(Ldir=vec3(0.0, 0.5, 0.5), color=rgb(0.5, 0.5, 0.5))
Sc.add(Plane(material=floor, center=vec3(0, -0.5, -3.0), width=6.0, height=6.0,
             u_axis=vec3(1.0, 0, 0), v_axis=vec3(0, 0, -1.0), max_ray_depth=5))
cb = Cuboid(material=green_glass, center=vec3(0.00, 0.0001, -0.8),
            width=0.9, height=1.0, length=0.4, shadow=False, max_ray_depth=5)
cb.rotate(θ=30, u=vec3(0, 1, 0))
Sc.add(cb)
background_for(Sc, "stormydays.png")

if __name__ == "__main__":
    img = Sc.render(samples_per_pixel=64, progress_bar=True)
    img.save("EXAMPLE3.png")
