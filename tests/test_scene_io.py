"""Declarative JSON scene format (raytracer_tpu/scene_io.py).

The reference describes scenes only as Python code; here a JSON document
builds the same Scene the equivalent Python would, and the CLI renders
.json files directly.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from raytracer_tpu import (Diffuse, Emissive, Glossy, Refractive, Scene,
                           Sphere, Plane, load_scene_file, rgb,
                           scene_from_dict, vec3)

REPO = Path(__file__).resolve().parent.parent

MINIMAL = {
    "camera": {"look_from": [0, 0, 1], "look_at": [0, 0, -1],
               "width": 24, "height": 16},
    "objects": [
        {"type": "sphere", "center": [0, 0, -3], "radius": 1.2,
         "material": {"type": "emissive", "color": [1.0, 0.6, 0.3]}}
    ],
}


def python_twin():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=24, screen_height=16)
    sc.add(Sphere(material=Emissive(color=rgb(1.0, 0.6, 0.3)),
                  center=vec3(0, 0, -3), radius=1.2))
    return sc


def test_json_matches_python_twin():
    a = np.asarray(scene_from_dict(MINIMAL).render(2, seed=0))
    b = np.asarray(python_twin().render(2, seed=0))
    assert np.array_equal(a, b)


def test_resolution_override():
    sc = scene_from_dict(MINIMAL, width=40, height=30)
    assert sc.camera.screen_width == 40 and sc.camera.screen_height == 30


def test_materials_lights_and_rotation():
    cfg = {
        "camera": {"look_from": [0, 0.4, 1.2], "look_at": [0, 0, -2],
                   "width": 32, "height": 24, "field_of_view": 70},
        "ambient_color": [0.02, 0.02, 0.02],
        "n": 1.0,
        "lights": [
            {"type": "directional", "Ldir": [0.4, 0.6, -0.4],
             "color": [0.2, 0.2, 0.2]},
            {"type": "point", "pos": [0, 2, -1], "color": [0.5, 0.5, 0.5]},
            {"type": "spot", "pos": [1, 2, -1], "direction": [-0.4, -1, -0.4],
             "color": [0.1, 0.1, 0.1], "angle": 25},
        ],
        "objects": [
            {"type": "plane", "center": [0, -0.5, -3], "width": 20,
             "height": 20, "u_axis": [1, 0, 0], "v_axis": [0, 0, -1],
             "material": {"type": "glossy", "diff_color": [0.8, 0.8, 0.8],
                          "n": [1.5, 0.1], "roughness": 0.2,
                          "spec_coeff": 0.2, "diff_coeff": 0.8}},
            {"type": "sphere", "center": [0, 0, -2], "radius": 0.5,
             "max_ray_depth": 3, "importance_sampled": True,
             "material": {"type": "refractive",
                          "n": [[1.5, 0], [1.51, 0], [1.52, 0]]}},
            {"type": "cuboid", "center": [1.2, -0.2, -2.5], "width": 0.5,
             "height": 0.5, "length": 0.5,
             "rotate": {"theta": 0.6, "axis": [0, 1, 0]},
             "material": {"type": "diffuse", "diff_color": [0.3, 0.5, 0.9],
                          "diffuse_rays": 4}},
        ],
    }
    sc = scene_from_dict(cfg)
    assert len(sc.Light_list) == 3
    assert len(sc.scene_primitives) == 3
    assert sc.importance_sampled_list == [sc.scene_primitives[1]]
    refr = sc.scene_primitives[1].material
    assert isinstance(refr, Refractive)
    assert complex(np.asarray(refr.n)[2]) == complex(1.52, 0)
    assert sc.scene_primitives[2].material.diffuse_rays == 4
    img = np.asarray(sc.render(2, seed=0))
    assert img.max() > 40          # renders something sensible


def test_texture_spec(tmp_path):
    import PIL.Image

    tex = tmp_path / "t.png"
    a = np.zeros((4, 4, 3), np.uint8)
    a[::2, ::2] = 255
    PIL.Image.fromarray(a).save(tex)
    cfg = dict(MINIMAL)
    cfg["objects"] = [
        {"type": "sphere", "center": [0, 0, -3], "radius": 1.2,
         "material": {"type": "diffuse",
                      "diff_color": {"image": str(tex), "repeat": 2.0}}}
    ]
    sc = scene_from_dict(cfg)
    m = sc.scene_primitives[0].material
    assert m.diff_texture.repeat == 2.0
    assert m.diff_texture.img.shape == (4, 4, 3)


def test_example_scene_json_loads_and_renders():
    sc = load_scene_file(REPO / "examples" / "example_scene.json",
                         width=48, height=36)
    assert len(sc.scene_primitives) == 4 and len(sc.Light_list) == 2
    img = np.asarray(sc.render(2, seed=0))
    assert img.shape == (36, 48, 3) and img.max() > 30


def test_cli_renders_json(tmp_path, capsys):
    from PIL import Image

    from raytracer_tpu.cli import main

    p = tmp_path / "scene.json"
    p.write_text(json.dumps(MINIMAL))
    out = tmp_path / "img.png"
    main(["render", str(p), "--spp", "2", "-o", str(out)])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["out"] == str(out)
    assert np.asarray(Image.open(out)).max() > 100


# -- export / round trip -----------------------------------------------------

def rich_scene(tex_path):
    from raytracer_tpu import (Cuboid, Cylinder, Disc, Glossy, Refractive,
                               ThinFilmInterference, image)

    sc = Scene(ambient_color=rgb(0.02, 0.02, 0.03), n=(1.0, 1.0, 1.0))
    sc.add_Camera(look_from=vec3(0, 0.4, 1.2), look_at=vec3(0, 0, -2),
                  screen_width=40, screen_height=30, field_of_view=70,
                  aperture=0.02, focal_distance=2.5)
    sc.add_DirectionalLight(Ldir=vec3(0.4, 0.6, -0.4),
                            color=rgb(0.2, 0.2, 0.19))
    sc.add_PointLight(pos=vec3(0, 2, -1), color=rgb(0.4, 0.4, 0.4))
    sc.add_SpotLight(pos=vec3(1, 2, -1), direction=vec3(-0.4, -1, -0.4),
                     color=rgb(0.1, 0.1, 0.1), angle=25, inner_angle=15)
    sc.add(Plane(material=Diffuse(diff_color=image(str(tex_path), repeat=2.0),
                                  diffuse_rays=4),
                 center=vec3(0, -0.5, -2), width=12, height=12,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Sphere(material=Emissive(color=rgb(4, 4, 4)),
                  center=vec3(0, 2, -2), radius=0.3, shadow=False),
           importance_sampled=True)
    box = Cuboid(material=Refractive(n=vec3(1.5, 1.51, 1.52)),
                 center=vec3(0.8, 0, -2.2), width=0.5, height=0.5,
                 length=0.5, max_ray_depth=4, mc=True)
    box.rotate(30, vec3(0, 1, 0)).rotate(10, vec3(1, 0, 0))
    sc.add(box)
    sc.add(Disc(material=Glossy(diff_color=rgb(0.9, 0.7, 0.3),
                                n=vec3(0.2 + 3.0j, 0.4 + 2.4j, 1.5 + 1.9j),
                                roughness=0.1, spec_coeff=0.5,
                                diff_coeff=0.5),
                center=vec3(-0.8, 0.2, -2.5), radius=0.6, inner_radius=0.3,
                normal=vec3(0.2, 0.3, 1.0)))
    sc.add(Cylinder(material=ThinFilmInterference(thickness=360, noise=0.2),
                    center=vec3(0, 0, -3), radius=0.3, height=0.8,
                    capped=False))
    return sc


def test_export_round_trip_is_exact(tmp_path):
    import PIL.Image

    from raytracer_tpu import save_scene_file

    tex = tmp_path / "t.png"
    a = np.zeros((4, 4, 3), np.uint8)
    a[::2, ::2] = 200
    PIL.Image.fromarray(a).save(tex)

    sc = rich_scene(tex)
    p = tmp_path / "scene.json"
    save_scene_file(sc, p)
    sc2 = load_scene_file(p)
    # every geometric/light attribute reconstructs bitwise (constructors'
    # normalizations are fixed points — geometry.primitive.stable_unit);
    # note scene_fingerprint itself hashes OBJECT IDENTITIES as dedup keys,
    # so it cannot compare across Scene instances — attribute + render
    # equality is the cross-instance oracle
    for a, b in zip(sc.scene_primitives, sc2.scene_primitives):
        assert type(a) is type(b)
        for attr in ("center", "radius", "u_axis", "v_axis", "normal",
                     "axis", "basis", "lb", "rt", "p1", "p2", "p3",
                     "vertices"):
            va, vb = getattr(a, attr, None), getattr(b, attr, None)
            assert (va is None) == (vb is None)
            if va is not None:
                assert np.array_equal(np.asarray(va), np.asarray(vb)), attr
    for a, b in zip(sc.Light_list, sc2.Light_list):
        for attr in ("pos", "Ldir", "direction", "color", "cos_inner",
                     "cos_outer"):
            va, vb = getattr(a, attr, None), getattr(b, attr, None)
            if va is not None:
                assert np.array_equal(np.asarray(va), np.asarray(vb)), attr
    assert sc2.camera.aperture == sc.camera.aperture
    assert len(sc2.importance_sampled_list) == 1
    # and the renders are bit-identical
    ia = np.asarray(sc.render(2, seed=0))
    ib = np.asarray(sc2.render(2, seed=0))
    assert np.array_equal(ia, ib)


def test_export_background_round_trip(tmp_path):
    import PIL.Image

    from raytracer_tpu import add_asset_root, scene_from_dict, scene_to_dict

    env = tmp_path / "sky_pan.png"
    a = np.zeros((8, 16, 3), np.uint8)
    a[:4] = (40, 80, 200)
    a[4:] = (60, 50, 40)
    PIL.Image.fromarray(a).save(env)
    add_asset_root(str(tmp_path))

    sc = scene_from_dict({**MINIMAL,
                          "background": {"image": str(env),
                                         "spherical": True, "blur": 1.0}})
    d = scene_to_dict(sc)
    assert d["background"]["spherical"] is True
    assert d["background"]["blur"] == 1.0
    sc2 = scene_from_dict(d)
    assert np.array_equal(np.asarray(sc.render(2, seed=0)),
                          np.asarray(sc2.render(2, seed=0)))


def test_export_rejects_unexportable(tmp_path):
    from raytracer_tpu import image, save_scene_file

    sc = scene_from_dict(MINIMAL)
    arr_tex = image(np.ones((2, 2, 3), np.float32))
    sc.add(Sphere(material=Diffuse(diff_color=arr_tex),
                  center=vec3(1, 0, -3), radius=0.5))
    with pytest.raises(ValueError, match="ndarray-backed"):
        save_scene_file(sc, tmp_path / "x.json")


def test_cli_convert(tmp_path, capsys):
    from raytracer_tpu.cli import main

    p = tmp_path / "scene.py"
    p.write_text("""
from raytracer_tpu import *
Sc = Scene()
Sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
              screen_width=24, screen_height=16)
Sc.add(Sphere(material=Emissive(color=rgb(1.0, 0.6, 0.3)),
              center=vec3(0, 0, -3), radius=1.2))
""")
    out = tmp_path / "scene.json"
    main(["convert", str(p), "-o", str(out)])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["objects"] == 1
    sc2 = load_scene_file(out)
    img = np.asarray(sc2.render(2, seed=0))
    assert img.max() > 100


def test_errors_are_located():
    with pytest.raises(ValueError, match="camera"):
        scene_from_dict({"objects": []})
    bad = dict(MINIMAL)
    bad["objects"] = [{"type": "klein_bottle", "material":
                       {"type": "emissive", "color": [1, 1, 1]}}]
    with pytest.raises(ValueError, match=r"objects\[0\].*klein_bottle"):
        scene_from_dict(bad)
    bad["objects"] = [{"type": "sphere", "center": [0, 0, -3], "radius": 1,
                       "material": {"type": "velvet"}}]
    with pytest.raises(ValueError, match="velvet"):
        scene_from_dict(bad)
    bad["objects"] = [{"type": "sphere", "center": [0, 0, -3], "radius": 1,
                       "wobble": 3,
                       "material": {"type": "emissive", "color": [1, 1, 1]}}]
    with pytest.raises(ValueError, match=r"objects\[0\]"):
        scene_from_dict(bad)
    with pytest.raises(ValueError, match="n"):
        scene_from_dict({**MINIMAL, "n": [1, 2, 3, 4]})
    # malformed rotate specs get a located ValueError, not a raw KeyError
    bad["objects"] = [{"type": "cuboid", "center": [0, 0, -3], "width": 1,
                       "height": 1, "length": 1,
                       "rotate": {"angle": 30, "axis": [0, 1, 0]},
                       "material": {"type": "emissive", "color": [1, 1, 1]}}]
    with pytest.raises(ValueError, match=r"objects\[0\]\.rotate"):
        scene_from_dict(bad)
