"""Three colored glass spheres (reference example2.py)."""
from _assets import background_for, floor_texture

from raytracer_tpu import *

blue_glass = Refractive(n=vec3(1.5 + 4e-8j, 1.5 + 4e-8j, 1.5 + 0.0j))
green_glass = Refractive(n=vec3(1.5 + 4e-8j, 1.5 + 0.0j, 1.5 + 4e-8j))
red_glass = Refractive(n=vec3(1.5 + 0.0j, 1.5 + 5e-8j, 1.5 + 5e-8j))
floor = Glossy(diff_color=floor_texture(repeat=80.0),
               n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j),
               roughness=0.2, spec_coeff=0.3, diff_coeff=0.9)

Sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
angle = np.pi / 2 * 0.3
Sc.add_Camera(look_from=vec3(2.5 * np.sin(angle), 0.25, 2.5 * np.cos(angle) - 1.5),
              look_at=vec3(0.0, 0.25, -1.5), screen_width=400, screen_height=300)
Sc.add_DirectionalLight(Ldir=vec3(0.52, 0.45, -0.5), color=rgb(0.15, 0.15, 0.15))
for mat, x in ((blue_glass, -1.2), (green_glass, 0.0), (red_glass, 1.2)):
    Sc.add(Sphere(material=mat, center=vec3(x, 0.0, -1.5), radius=0.5,
                  shadow=False, max_ray_depth=3))
Sc.add(Plane(material=floor, center=vec3(0, -0.5, -3.0), width=120.0, height=120.0,
             u_axis=vec3(1.0, 0, 0), v_axis=vec3(0, 0, -1.0), max_ray_depth=3))
background_for(Sc, "miramar.jpeg")

if __name__ == "__main__":
    img = Sc.render(samples_per_pixel=64, progress_bar=True)
    img.save("EXAMPLE2.png")
