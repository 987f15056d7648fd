#!/usr/bin/env python
"""Mesh-scene benchmark: time a ~5k-triangle render on the current backend.

Scene: an icosphere tessellation (procedural, no assets) with a glossy
material over a ground plane and an emissive sky — the reference's one
quantified pain point is ~200 triangles ~ 3 min/frame
(sightpy/geometry/triangle_mesh.py:8-9).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def icosphere(subdiv=4):
    """Return (T, 3, 3) float32 triangle vertices of a unit icosphere."""
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
    tris = [tuple(verts[i] for i in f) for f in faces]
    for _ in range(subdiv):
        nxt = []
        for a, b, c in tris:
            ab = (a + b) / 2; bc = (b + c) / 2; ca = (c + a) / 2
            ab /= np.linalg.norm(ab); bc /= np.linalg.norm(bc)
            ca /= np.linalg.norm(ca)
            nxt += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        tris = nxt
    return np.asarray(tris, np.float32)


def build_spread_scene(subdiv=4, grid=3):
    """grid x grid icospheres spaced over a ground plane, camera pulled back:
    each sphere covers a small screen region, so most (ray-tile, cluster)
    pairs of the clustered sweep skip — the realistic many-objects case, vs
    build_scene's adversarial single frame-filling sphere."""
    from raytracer_tpu import (Emissive, Glossy, Plane, Scene, Sphere,
                               Triangle, rgb, vec3)

    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 3.0, 12), look_at=vec3(0, 0, 0),
                  screen_width=400, screen_height=300, field_of_view=40)
    sc.add_DirectionalLight(Ldir=vec3(0.5, 0.8, 0.3), color=rgb(0.6, 0.6, 0.6))
    tris = icosphere(subdiv)
    n_tri = 0
    for gi in range(grid):
        for gj in range(grid):
            cx = (gi - (grid - 1) / 2) * 3.0
            cz = (gj - (grid - 1) / 2) * 3.0
            hue = (gi * grid + gj) / (grid * grid)
            mat = Glossy(diff_color=rgb(0.3 + 0.6 * hue, 0.4, 0.8 - 0.6 * hue),
                         roughness=0.3, spec_coeff=0.4, diff_coeff=0.8,
                         n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j))
            for p1, p2, p3 in tris:
                sc.add(Triangle(material=mat, center=vec3(0, 0, 0),
                                p1=vec3(p1[0] + cx, p1[1], p1[2] + cz),
                                p2=vec3(p2[0] + cx, p2[1], p2[2] + cz),
                                p3=vec3(p3[0] + cx, p3[1], p3[2] + cz),
                                max_ray_depth=2))
                n_tri += 1
    sc.add(Plane(material=Glossy(diff_color=rgb(0.3, 0.3, 0.35),
                                 roughness=0.0, spec_coeff=0.2, diff_coeff=0.8,
                                 n=vec3(1.1 + 0.2j, 1.1 + 0.2j, 1.1 + 0.2j)),
                 center=vec3(0, -1.2, 0), width=80.0, height=80.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1), max_ray_depth=2))
    sc.add(Sphere(material=Emissive(color=rgb(0.7, 0.8, 0.95)),
                  center=vec3(0, 0, 0), radius=120.0, shadow=False))
    print(f"triangles: {n_tri} ({grid}x{grid} spheres)", flush=True)
    return sc


def build_scene(subdiv=4):
    from raytracer_tpu import (Emissive, Glossy, Plane, Scene, Sphere,
                               Triangle, rgb, vec3)

    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 0.4, 3), look_at=vec3(0, 0, 0),
                  screen_width=400, screen_height=300, field_of_view=30)
    sc.add_DirectionalLight(Ldir=vec3(0.5, 0.8, 0.3), color=rgb(0.6, 0.6, 0.6))
    mat = Glossy(diff_color=rgb(0.7, 0.4, 0.2), roughness=0.3,
                 spec_coeff=0.4, diff_coeff=0.8,
                 n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j))
    tris = icosphere(subdiv)
    for p1, p2, p3 in tris:
        sc.add(Triangle(material=mat, center=vec3(0, 0, 0),
                        p1=vec3(*p1), p2=vec3(*p2), p3=vec3(*p3),
                        max_ray_depth=2))
    sc.add(Plane(material=Glossy(diff_color=rgb(0.3, 0.3, 0.35),
                                 roughness=0.0, spec_coeff=0.2, diff_coeff=0.8,
                                 n=vec3(1.1 + 0.2j, 1.1 + 0.2j, 1.1 + 0.2j)),
                 center=vec3(0, -1.2, 0), width=40.0, height=40.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1), max_ray_depth=2))
    sc.add(Sphere(material=Emissive(color=rgb(0.7, 0.8, 0.95)),
                  center=vec3(0, 0, 0), radius=60.0, shadow=False))
    print(f"triangles: {len(tris)}", flush=True)
    return sc


def main(subdiv=4, spp=4, spread=False):
    sc = build_spread_scene(subdiv) if spread else build_scene(subdiv)
    from raytracer_tpu.core.compile import compile_scene

    static, _ = compile_scene(sc)
    print(f"objects={static.n_objects} pallas_ok={static.pallas_ok} "
          f"mesh_tris={getattr(static, 'n_mesh_tris', 'n/a')}", flush=True)
    img, st = sc.render(samples_per_pixel=spp, return_stats=True)  # compile
    best = float("inf")
    for rep in range(2):
        t0 = time.time()
        img, st = sc.render(samples_per_pixel=spp, seed=rep + 1,
                            return_stats=True)
        np.asarray(img)
        best = min(best, time.time() - t0)
    img.save("/tmp/mesh_bench.png")
    print(f"spp={spp} wall={best:.2f}s rays={st['rays_traced']} "
          f"mrays/s={st['rays_traced'] / best / 1e6:.1f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4,
         spread="--spread" in sys.argv)
