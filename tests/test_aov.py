"""AOV rendering (core/aov.py): first-hit feature planes.

The reference's sole diagnostic is a normalized depth map
(sightpy/scene.py:142-166); render_aovs generalizes it to the standard
denoiser feature set.  These tests pin the geometric semantics against
closed-form scenes.
"""

import numpy as np

from raytracer_tpu import (Diffuse, Emissive, Plane, Refractive, Scene,
                           Sphere, rgb, vec3)


def _sphere_front_scene(color=rgb(0.8, 0.2, 0.1)):
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 5), look_at=vec3(0, 0, 0),
                  screen_width=32, screen_height=32, field_of_view=30)
    sc.add(Sphere(material=Diffuse(diff_color=color),
                  center=vec3(0, 0, 0), radius=1.0))
    return sc


def test_aov_depth_normal_albedo_center():
    sc = _sphere_front_scene()
    aov = sc.render_aovs(samples_per_pixel=1)
    c = 16  # center pixel: sphere front point (0, 0, 1), 4 away from camera
    assert abs(aov["depth"][c, c] - 4.0) < 0.05
    assert np.allclose(aov["normal"][c, c], [0, 0, 1], atol=0.1)
    assert np.allclose(aov["albedo"][c, c], [0.8, 0.2, 0.1], atol=1e-5)
    assert np.allclose(aov["position"][c, c], [0, 0, 1], atol=0.1)
    assert aov["coverage"][c, c] == 1.0
    assert aov["obj_id"][c, c] == 0
    # unit normals everywhere something was hit
    nlen = np.linalg.norm(aov["normal"], axis=-1)
    hit = aov["coverage"] > 0
    assert np.allclose(nlen[hit], 1.0, atol=1e-4)


def test_aov_miss_pixels():
    sc = _sphere_front_scene()
    aov = sc.render_aovs(samples_per_pixel=1)
    # corner rays miss the unit sphere at fov 30
    assert aov["coverage"][0, 0] == 0.0
    assert aov["obj_id"][0, 0] == -1
    assert aov["depth"][0, 0] == 0.0
    assert np.all(aov["normal"][0, 0] == 0.0)
    assert np.all(aov["albedo"][0, 0] == 0.0)


def test_aov_specular_albedo_white_and_ids():
    # glass sphere in front of an emissive backdrop: specular albedo is white,
    # backdrop albedo is its emission color, ids distinguish the objects
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 5), look_at=vec3(0, 0, 0),
                  screen_width=16, screen_height=16, field_of_view=30)
    sc.add(Sphere(material=Refractive(n=vec3(1.5, 1.5, 1.5)),
                  center=vec3(0, 0, 0), radius=1.0))
    sc.add(Plane(material=Emissive(color=rgb(0.2, 0.9, 0.3)),
                 center=vec3(0, 0, -3), width=50.0, height=50.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    aov = sc.render_aovs(samples_per_pixel=1)
    c = 8
    assert np.allclose(aov["albedo"][c, c], [1, 1, 1])       # glass -> white
    assert np.allclose(aov["albedo"][0, 0], [0.2, 0.9, 0.3], atol=1e-5)
    assert aov["obj_id"][c, c] != aov["obj_id"][0, 0]
    assert aov["coverage"].min() == 1.0                      # backdrop covers


def test_aov_antialias_spp():
    # multi-sample AOVs: edge pixels get fractional coverage, interior stays 1
    sc = _sphere_front_scene()
    aov = sc.render_aovs(samples_per_pixel=16, seed=3)
    cov = aov["coverage"]
    assert cov[16, 16] == 1.0
    assert cov[0, 0] == 0.0
    frac = (cov > 0.0) & (cov < 1.0)
    assert frac.sum() > 0  # silhouette pixels are partially covered


def _mesh_scene(mat=None):
    # icosphere as raw Triangle primitives (the bench_mesh construction),
    # >= the 1024-triangle clustered-sweep threshold is NOT needed — the
    # point is routing AOVs through the triangle tables
    import sys
    from pathlib import Path

    from raytracer_tpu import Triangle

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from bench_mesh import icosphere

    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 4), look_at=vec3(0, 0, 0),
                  screen_width=24, screen_height=24, field_of_view=35)
    mat = mat or Diffuse(diff_color=rgb(0.5, 0.6, 0.7))
    for p1, p2, p3 in icosphere(2):        # 320 triangles
        sc.add(Triangle(material=mat, center=vec3(0, 0, 0),
                        p1=vec3(*p1), p2=vec3(*p2), p3=vec3(*p3)))
    return sc


def test_aov_mesh_scene():
    # AOVs over a triangle-soup scene: the first-hit pass must route through
    # the same triangle intersection the integrator uses, and the planes
    # must be geometrically sane (depth finite at hits, unit normals,
    # obj ids within range, coverage matching the silhouette)
    sc = _mesh_scene()
    aovs = sc.render_aovs(2, seed=1)
    cov = aovs["coverage"]
    hit = cov > 0.5
    assert hit[10:14, 10:14].all()         # sphere covers the center
    assert not hit[0, 0] and not hit[-1, -1]
    d = aovs["depth"][hit]
    assert np.isfinite(d).all() and (2.0 < d).all() and (d < 4.5).all()
    n = aovs["normal"][hit]
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=2e-2)
    # center normal faces the camera (+z)
    assert aovs["normal"][12, 12, 2] > 0.9
    assert (aovs["obj_id"][hit] >= 0).all()


def test_denoise_mesh_scene():
    # the denoiser consumes mesh-scene AOVs end-to-end
    sc = _mesh_scene()
    sc.add(Sphere(material=Emissive(color=rgb(1.5, 1.5, 1.5)),
                  center=vec3(0, 0, 0), radius=20.0, shadow=False))
    img = sc.render_denoised(2, seed=4)
    arr = np.asarray(img)
    assert arr.shape == (24, 24, 3) and arr.dtype == np.uint8
    assert arr.mean() > 10          # lit scene, nothing blacked out


def test_ao_plane():
    # a sphere resting on a floor: the contact region is occluded, open
    # floor is not, and the sphere's top sees the whole sky
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 3.0, 0.001), look_at=vec3(0, 0, -0.1),
                  screen_width=32, screen_height=32, field_of_view=70)
    m = Diffuse(diff_color=rgb(0.8, 0.8, 0.8), diffuse_rays=1)
    sc.add(Plane(material=m, center=vec3(0, 0, 0), width=40, height=40,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Sphere(material=m, center=vec3(0, 0.5, 0), radius=0.5))
    aovs = sc.render_aovs(2, seed=0, ao_samples=16)
    ao = aovs["ao"]
    assert ao.shape == (32, 32)
    assert (0.0 <= ao).all() and (ao <= 1.0).all()
    # top-down view: image center = sphere top (fully open sky)
    assert ao[16, 16] > 0.9
    # the floor ring hugging the silhouette is the darkest region
    ring = min(ao[16, 19:22].min(), ao[16, 11:14].min())
    assert ring < 0.8
    assert ao[16, 29:31].min() > 0.88    # open floor at the image edge
    # far corner floor: nearly open
    assert ao[1, 1] > 0.85
    # bounded radius shrinks the darkened band to a contact shadow
    aovs_r = sc.render_aovs(2, seed=0, ao_samples=16, ao_radius=0.2)
    assert aovs_r["ao"][1, 1] > 0.98
    assert aovs_r["ao"].mean() >= ao.mean()
    # plane absent without ao_samples
    assert "ao" not in sc.render_aovs(1, seed=0)
