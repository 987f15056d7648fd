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
