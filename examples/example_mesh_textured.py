"""Textured + smooth-shaded triangle mesh: a beach-ball UV sphere.

Shows the OBJ vertex-attribute pipeline end to end: the lat-long sphere
carries `vt` texture coordinates and `vn` vertex normals; the material's
image texture is fetched through the barycentrically interpolated uv and
the shading normal is the interpolated vertex normal (smooth shading from
a coarse 36x18 tessellation).  The reference's mesh loader is dead code
and parses only v/f records (triangle_mesh.py:12-43), so neither
capability exists there.

Everything is generated procedurally — no assets needed.
"""

import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403
from raytracer_tpu import image  # noqa: E402


def write_uv_sphere_obj(path, n_theta=18, n_phi=36):
    """Lat-long unit sphere with analytic vt/vn records.

    The seam column is emitted twice (same position/normal, u=0 vs u=1) so
    uv interpolation never runs backwards across the wrap."""
    lines = []
    for i in range(n_theta + 1):
        th = np.pi * i / n_theta
        for j in range(n_phi + 1):
            ph = 2 * np.pi * (j % n_phi) / n_phi
            x, y, z = (np.sin(th) * np.cos(ph), np.cos(th),
                       np.sin(th) * np.sin(ph))
            lines.append(f"v {x:.6f} {y:.6f} {z:.6f}")
            lines.append(f"vn {x:.6f} {y:.6f} {z:.6f}")
            lines.append(f"vt {j / n_phi:.6f} {1 - i / n_theta:.6f}")

    def c(i, j):
        v = i * (n_phi + 1) + j + 1
        return f"{v}/{v}/{v}"

    faces = 0
    for i in range(n_theta):
        for j in range(n_phi):
            a, b2 = c(i, j), c(i, j + 1)
            d, e = c(i + 1, j + 1), c(i + 1, j)
            if i == 0:
                lines.append(f"f {a} {d} {e}")
                faces += 1
            elif i == n_theta - 1:
                lines.append(f"f {a} {b2} {d}")
                faces += 1
            else:
                lines.append(f"f {a} {b2} {d} {e}")
                faces += 2
    Path(path).write_text("\n".join(lines))
    return faces


def beach_ball_texture(w=512, h=256, stripes=6):
    """Linear-space stripe texture with polar caps."""
    u = np.linspace(0, 1, w, endpoint=False)[None, :]
    v = np.linspace(0, 1, h, endpoint=False)[:, None]
    palette = np.array([[0.85, 0.12, 0.10], [0.92, 0.88, 0.80],
                        [0.10, 0.35, 0.75], [0.92, 0.88, 0.80],
                        [0.95, 0.65, 0.10], [0.92, 0.88, 0.80]])
    seg = (u * stripes).astype(int) % len(palette)
    tex = palette[seg].repeat(h, axis=0).reshape(h, w, 3)
    cap = (v < 0.08) | (v > 0.92)
    tex[np.broadcast_to(cap, (h, w))] = [0.92, 0.88, 0.80]
    return tex.astype(np.float32)


obj_path = os.path.join(tempfile.gettempdir(), "beachball.obj")
n_faces = write_uv_sphere_obj(obj_path)

ball = Glossy(diff_color=image(beach_ball_texture(), filter="bilinear"),
              n=vec3(1.3 + 0j, 1.3 + 0j, 1.3 + 0j),
              roughness=0.15, spec_coeff=0.25, diff_coeff=0.9)
floor = Glossy(diff_color=rgb(0.35, 0.32, 0.28),
               n=vec3(1.1 + 0.2j, 1.1 + 0.2j, 1.1 + 0.2j),
               roughness=0.0, spec_coeff=0.15, diff_coeff=0.9)

Sc = Scene(ambient_color=rgb(0.06, 0.06, 0.07))
Sc.add_Camera(look_from=vec3(0, 0.8, 4.5), look_at=vec3(0, -0.05, 0),
              screen_width=400, screen_height=300, field_of_view=35)
Sc.add_DirectionalLight(Ldir=vec3(0.6, 0.9, 0.4), color=rgb(0.8, 0.8, 0.78))
mesh = TriangleMesh(obj_path, center=vec3(0, 0, 0), material=ball,
                    max_ray_depth=2)   # smooth=None honors the file's vn
mesh.rotate(θ=25, u=vec3(0, 1, 0))
Sc.add(mesh)
Sc.add(Plane(material=floor, center=vec3(0, -1.0, 0), width=40.0,
             height=40.0, u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1),
             max_ray_depth=2))
Sc.add(Sphere(material=Emissive(color=rgb(0.75, 0.82, 0.95)),
              center=vec3(0, 0, 0), radius=60.0, shadow=False))

if __name__ == "__main__":
    print(f"{n_faces} textured smooth-shaded triangles")
    img = Sc.render(samples_per_pixel=16, progress_bar=True)
    img.save("EXAMPLE_MESH_TEXTURED.png")
    print("wrote EXAMPLE_MESH_TEXTURED.png")
