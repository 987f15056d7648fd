"""Declarative JSON scene format.

The reference's only scene description is Python code (example1.py etc.);
here any render can also be described as data — a JSON document the CLI
renders directly (``python -m raytracer_tpu render scene.json``) and
libraries load with :func:`load_scene_file` / :func:`scene_from_dict`.

Schema (all vectors are 3-lists; complex numbers are ``[re, im]`` pairs,
and a per-channel complex triple is a 3-list of numbers or pairs)::

    {
      "camera":  {"look_from": [0,0,1], "look_at": [0,0,-1],
                  "width": 400, "height": 300, "field_of_view": 90,
                  "aperture": 0, "focal_distance": 1,
                  "projection": "pinhole"},
      "ambient_color": [0.05, 0.05, 0.05],
      "n": 1.0,                                  # scene medium IoR
      "lights": [
        {"type": "directional", "Ldir": [0.5,0.5,-0.5], "color": [0.2,0.2,0.2]},
        {"type": "point", "pos": [0,2,-1], "color": [1,1,1]},
        {"type": "spot",  "pos": [0,2,-1], "direction": [0,-1,0],
         "color": [1,1,1], "angle": 30, "inner_angle": 20}
      ],
      "background": {"image": "stormydays.png", "spherical": false,
                     "light_intensity": 0.0, "blur": 0.0},
      "objects": [
        {"type": "sphere", "center": [-0.75,0.1,-3], "radius": 0.6,
         "max_ray_depth": 3, "importance_sampled": false,
         "material": {"type": "glossy", "diff_color": [1,0.57,0.18],
                      "n": [[0.15,3.58],[0.4,2.37],[1.54,1.91]],
                      "roughness": 0, "spec_coeff": 0.2, "diff_coeff": 0.8}},
        {"type": "plane", "center": [0,-0.5,-3], "width": 12, "height": 12,
         "u_axis": [1,0,0], "v_axis": [0,0,-1],
         "material": {"type": "diffuse",
                      "diff_color": {"image": "checker.png", "repeat": 2}}},
        {"type": "cuboid", "center": [1,0,-3], "width": 1, "height": 1,
         "length": 1, "rotate": {"theta": 30, "axis": [0,1,0]},  # degrees
         "material": {"type": "refractive", "n": [1.5, 0]}},
        {"type": "disc", "center": [0,1,-2], "radius": 0.8,
         "inner_radius": 0.3, "normal": [0,0,1], "material": ...},
        {"type": "cylinder", "center": [0,0,-2], "radius": 0.3,
         "height": 1.0, "axis": [0,1,0], "capped": true, "material": ...},
        {"type": "triangle", "center": [0,0,0], "p1": [...], "p2": [...],
         "p3": [...], "material": ...},
        {"type": "mesh", "filename": "bunny.obj", "center": [0,0,-3],
         "scale": 2.0, "material": ...}
      ]
    }

Material ``type``: ``emissive`` (color), ``diffuse`` (diff_color,
diffuse_rays, ambient_weight), ``glossy`` (diff_color, roughness,
spec_coeff, diff_coeff, n), ``refractive`` (n, dispersion), ``thinfilm``
(thickness, noise, film_n).  Color-valued fields accept a 3-list (solid
color) or ``{"image": "file.png", "repeat": 1.0, "filter": "nearest"}``.
Every other key maps 1:1 onto the Python constructor kwarg of the same
name, so the API reference (docs/API.md) doubles as the schema reference.
"""

from __future__ import annotations

import json
from pathlib import Path

from .core.scene import Scene
from .geometry.primitive import (Cuboid, Cylinder, Disc, Plane, Sphere,
                                 Triangle, TriangleMesh)
from .materials.base import (Diffuse, Emissive, Glossy, Refractive,
                             ThinFilmInterference)
from .textures.texture import image as image_texture

_MATERIALS = {
    "emissive": Emissive,
    "diffuse": Diffuse,
    "glossy": Glossy,
    "refractive": Refractive,
    "thinfilm": ThinFilmInterference,
}

# material keys that take a color OR a texture spec
_COLOR_KEYS = ("color", "diff_color")


def _c1(v, where):
    """A JSON complex scalar: number or [re, im]."""
    if isinstance(v, (int, float)):
        return complex(float(v), 0.0)
    if isinstance(v, (list, tuple)) and len(v) == 2 \
            and all(isinstance(x, (int, float)) for x in v):
        return complex(float(v[0]), float(v[1]))
    raise ValueError(f"{where}: expected a number or [re, im], got {v!r}")


def _c3(v, where):
    """A per-channel complex triple: scalar, [re, im], or 3-list of those."""
    if isinstance(v, (int, float)):
        return _c1(v, where)
    if isinstance(v, (list, tuple)):
        if len(v) == 2 and all(isinstance(x, (int, float)) for x in v):
            return _c1(v, where)
        if len(v) == 3:
            return tuple(_c1(x, where) for x in v)
    raise ValueError(
        f"{where}: expected a number, [re, im], or 3 of those, got {v!r}")


def _color_or_texture(v, where):
    if isinstance(v, dict):
        d = dict(v)
        try:
            img = d.pop("image")
        except KeyError:
            raise ValueError(f"{where}: a texture spec needs an 'image' key")
        return image_texture(img, **d)
    return v        # 3-list solid color; validated by as_texture downstream


def _material(spec, where):
    if not isinstance(spec, dict) or "type" not in spec:
        raise ValueError(f"{where}: material must be an object with a 'type'")
    d = dict(spec)
    t = d.pop("type")
    cls = _MATERIALS.get(t)
    if cls is None:
        raise ValueError(f"{where}: unknown material type {t!r} "
                         f"(valid: {sorted(_MATERIALS)})")
    for k in _COLOR_KEYS:
        if k in d:
            d[k] = _color_or_texture(d[k], f"{where}.{k}")
    if "n" in d:
        d["n"] = _c3(d["n"], f"{where}.n")
    return cls(**d)


def _build_object(spec, index):
    where = f"objects[{index}]"
    if not isinstance(spec, dict) or "type" not in spec:
        raise ValueError(f"{where}: must be an object with a 'type'")
    d = dict(spec)
    t = d.pop("type")
    importance = bool(d.pop("importance_sampled", False))
    rotate = d.pop("rotate", None)
    d["material"] = _material(d.pop("material", None), f"{where}.material")
    try:
        if t == "sphere":
            prim = Sphere(**d)
        elif t == "plane":
            prim = Plane(**d)
        elif t == "cuboid":
            prim = Cuboid(**d)
        elif t == "disc":
            prim = Disc(**d)
        elif t == "cylinder":
            prim = Cylinder(**d)
        elif t == "triangle":
            prim = Triangle(**d)
        elif t == "mesh":
            prim = TriangleMesh(**d)
        else:
            raise ValueError(
                f"{where}: unknown object type {t!r} (valid: sphere, plane, "
                "cuboid, disc, cylinder, triangle, mesh)")
    except TypeError as e:
        raise ValueError(f"{where}: {e}") from None
    if rotate is not None:
        steps = rotate if isinstance(rotate, list) else [rotate]
        for r in steps:
            if not isinstance(r, dict) or "theta" not in r or "axis" not in r:
                raise ValueError(
                    f"{where}.rotate: expected {{'theta': degrees, "
                    f"'axis': [x,y,z]}}, got {r!r}")
            prim.rotate(float(r["theta"]), r["axis"])
    return prim, importance


def _build_light(scene, spec, index):
    where = f"lights[{index}]"
    if not isinstance(spec, dict) or "type" not in spec:
        raise ValueError(f"{where}: must be an object with a 'type'")
    d = dict(spec)
    t = d.pop("type")
    try:
        if t == "point":
            scene.add_PointLight(**d)
        elif t == "directional":
            scene.add_DirectionalLight(**d)
        elif t == "spot":
            scene.add_SpotLight(**d)
        else:
            raise ValueError(f"{where}: unknown light type {t!r} "
                             "(valid: point, directional, spot)")
    except TypeError as e:
        raise ValueError(f"{where}: {e}") from None


def scene_from_dict(cfg, width=None, height=None):
    """Build a :class:`Scene` from a schema dict (see module docstring).

    `width`/`height` override the camera resolution (the CLI's
    ``--width/--height`` route here).
    """
    if not isinstance(cfg, dict) or "camera" not in cfg:
        raise ValueError("scene document must be an object with a 'camera'")
    kwargs = {}
    if "ambient_color" in cfg:
        kwargs["ambient_color"] = cfg["ambient_color"]
    if "n" in cfg:
        kwargs["n"] = _c3(cfg["n"], "n")
    sc = Scene(**kwargs)

    cam = dict(cfg["camera"])
    for src, dst in (("width", "screen_width"), ("height", "screen_height")):
        if src in cam:
            cam[dst] = cam.pop(src)
    if width is not None:
        cam["screen_width"] = width
    if height is not None:
        cam["screen_height"] = height
    try:
        sc.add_Camera(**cam)
    except TypeError as e:
        raise ValueError(f"camera: {e}") from None

    for i, l in enumerate(cfg.get("lights", [])):
        _build_light(sc, l, i)

    bg = cfg.get("background")
    if bg is not None:
        d = dict(bg) if isinstance(bg, dict) else {"image": bg}
        try:
            img = d.pop("image")
        except KeyError:
            raise ValueError("background: needs an 'image' key")
        sc.add_Background(img, **d)

    for i, o in enumerate(cfg.get("objects", [])):
        prim, importance = _build_object(o, i)
        sc.add(prim, importance_sampled=importance)
    return sc


def load_scene_file(path, width=None, height=None):
    """Load a ``.json`` scene document into a :class:`Scene`."""
    text = Path(path).read_text()
    try:
        cfg = json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"{path}: invalid JSON — {e}") from None
    return scene_from_dict(cfg, width=width, height=height)
