"""Triangle-mesh showcase: a 5,120-face icosphere OBJ over a glossy floor.

The reference ships a TriangleMesh loader that cannot run (NameError at
sightpy/geometry/triangle_mesh.py:40, and its header estimates ~200
triangles ≈ 3 minutes, triangle_mesh.py:7-9).  Here the OBJ loads through
the native C++ parser, the compiler builds SAH clusters, and the clustered
sweep renders 25x more triangles in well under a second per frame on one
TPU chip (scripts/bench_mesh.py for the measured walls).

The OBJ file is generated procedurally so the example needs no assets.
"""

import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403


def write_icosphere_obj(path, subdiv=4):
    """Unit icosphere as a v/f OBJ (the subset the reference parses too)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts = [tuple(v) for v in verts]
    index = {v: i for i, v in enumerate(verts)}

    def mid(a, b):
        m = tuple(np.asarray(verts[a], np.float64) / 2
                  + np.asarray(verts[b], np.float64) / 2)
        m = tuple(np.asarray(m) / np.linalg.norm(m))
        if m not in index:
            index[m] = len(verts)
            verts.append(m)
        return index[m]

    for _ in range(subdiv):
        nxt = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nxt += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = nxt
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")
    return len(faces)


obj_path = os.path.join(tempfile.gettempdir(), "icosphere4.obj")
n_faces = write_icosphere_obj(obj_path, subdiv=4)

copper = Glossy(diff_color=rgb(0.7, 0.4, 0.2),
                n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j),
                roughness=0.3, spec_coeff=0.4, diff_coeff=0.8)
floor = Glossy(diff_color=rgb(0.3, 0.3, 0.35),
               n=vec3(1.1 + 0.2j, 1.1 + 0.2j, 1.1 + 0.2j),
               roughness=0.0, spec_coeff=0.2, diff_coeff=0.8)

Sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
Sc.add_Camera(look_from=vec3(0, 0.6, 4.6), look_at=vec3(0, -0.1, 0),
              screen_width=400, screen_height=300, field_of_view=32)
Sc.add_DirectionalLight(Ldir=vec3(0.5, 0.8, 0.3), color=rgb(0.6, 0.6, 0.6))
mesh = TriangleMesh(obj_path, center=vec3(0, 0, 0), material=copper,
                    max_ray_depth=2, smooth=True)  # area-weighted vertex
#                   normals, interpolated at the hit (no vn in the file)
mesh.rotate(θ=20, u=vec3(0, 1, 0))
Sc.add(mesh)
Sc.add(Plane(material=floor, center=vec3(0, -1.2, 0), width=40.0, height=40.0,
             u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1), max_ray_depth=2))
Sc.add(Sphere(material=Emissive(color=rgb(0.7, 0.8, 0.95)),
              center=vec3(0, 0, 0), radius=60.0, shadow=False))

if __name__ == "__main__":
    print(f"{n_faces} triangles")
    img = Sc.render(samples_per_pixel=16, progress_bar=True)
    img.save("EXAMPLE_MESH.png")
