"""Thin-film soap bubble against a blurred lake skybox (reference example4.py)."""
from _assets import background_for

from raytracer_tpu import *

Sc = Scene(ambient_color=rgb(0.01, 0.01, 0.01))
angle = -np.pi * 0.5
Sc.add_Camera(screen_height=300, screen_width=400,
              look_from=vec3(4.0 * np.sin(angle), 0.00, 4.0 * np.cos(angle)),
              look_at=vec3(0.0, 0.05, 0.0))
soap_bubble = ThinFilmInterference(thickness=330, noise=60.0)
Sc.add(Sphere(material=soap_bubble, center=vec3(1.0, 0.0, 1.5), radius=1.7,
              shadow=False, max_ray_depth=5))
background_for(Sc, "lake.png", light_intensity=5.0, blur=10.0)

if __name__ == "__main__":
    img = Sc.render(samples_per_pixel=64, progress_bar=True)
    img.save("EXAMPLE4.png")
