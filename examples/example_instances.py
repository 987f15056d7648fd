"""Mesh instancing showcase: 48 copies of one icosphere, one set of tables.

The reference cannot render meshes at all (its TriangleMesh is dead code,
sightpy/geometry/triangle_mesh.py:40) — and even a working port would store
and sweep every copy.  `MeshInstances` compiles the 1,280-triangle icosphere
ONCE in object space; each of the 48 instances is just a rotation +
translation + uniform scale on a cluster record, so the scene holds 61k
virtual triangles in the memory and host-compile cost of 1.3k, and rays are
pulled into instance space per cluster inside the clustered sweep
(geometry/intersect.py).
"""

import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403
from example_mesh import write_icosphere_obj  # noqa: E402

obj_path = os.path.join(tempfile.gettempdir(), "icosphere3.obj")
n_faces = write_icosphere_obj(obj_path, subdiv=3)

palette = [
    Glossy(diff_color=rgb(0.75, 0.35, 0.20),
           n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j),
           roughness=0.25, spec_coeff=0.4, diff_coeff=0.8),
    Glossy(diff_color=rgb(0.25, 0.45, 0.75),
           n=vec3(1.3 + 0.1j, 1.3 + 0.1j, 1.3 + 0.1j),
           roughness=0.15, spec_coeff=0.35, diff_coeff=0.85),
    Glossy(diff_color=rgb(0.30, 0.65, 0.35),
           n=vec3(1.25 + 0.2j, 1.25 + 0.2j, 1.25 + 0.2j),
           roughness=0.35, spec_coeff=0.3, diff_coeff=0.85),
    Glossy(diff_color=rgb(0.8, 0.75, 0.45),
           n=vec3(1.4 + 0.4j, 1.35 + 0.4j, 1.2 + 0.4j),
           roughness=0.1, spec_coeff=0.5, diff_coeff=0.7),
]

floor = Glossy(diff_color=rgb(0.3, 0.3, 0.35),
               n=vec3(1.1 + 0.2j, 1.1 + 0.2j, 1.1 + 0.2j),
               roughness=0.0, spec_coeff=0.2, diff_coeff=0.8)

Sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
Sc.add_Camera(look_from=vec3(0, 2.2, 9.0), look_at=vec3(0, -0.2, 0),
              screen_width=400, screen_height=300, field_of_view=36)
Sc.add_DirectionalLight(Ldir=vec3(0.5, 0.8, 0.3), color=rgb(0.6, 0.6, 0.6))

mesh = TriangleMesh(obj_path, center=vec3(0, 0, 0), material=palette[0],
                    max_ray_depth=2, smooth=True)
field = MeshInstances(mesh)
rng = np.random.default_rng(7)
for i in range(48):
    gx, gz = i % 8, i // 8
    x = (gx - 3.5) * 1.7 + rng.uniform(-0.35, 0.35)
    z = (gz - 2.5) * 1.7 + rng.uniform(-0.35, 0.35)
    s = rng.uniform(0.35, 0.85)
    field.add(translate=(x, -1.2 + s, z),
              theta=float(rng.uniform(0, 360)), axis=(0, 1, 0), scale=s,
              material=palette[i % len(palette)])
Sc.add(field)

Sc.add(Plane(material=floor, center=vec3(0, -1.2, 0), width=60.0, height=60.0,
             u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1), max_ray_depth=2))
Sc.add(Sphere(material=Emissive(color=rgb(0.7, 0.8, 0.95)),
              center=vec3(0, 0, 0), radius=80.0, shadow=False))

if __name__ == "__main__":
    print(f"{n_faces} physical triangles x 48 instances "
          f"= {48 * n_faces} virtual")
    img = Sc.render(samples_per_pixel=16, progress_bar=True)
    img.save("EXAMPLE_INSTANCES.png")
