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
