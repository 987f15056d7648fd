"""raytracer_tpu — a TPU-native rebuild of sightpy (lmondada/Python-Raytracer).

Public API mirrors the reference's flat star-import surface
(sightpy/__init__.py:1-12): `from raytracer_tpu import *` provides Scene,
Camera, vec3/rgb, all primitives, materials, textures, lights and the
animation helpers.  `np` is re-exported because the reference examples rely
on it leaking through the star import (e.g. example1.py:33).

Under the hood everything renders through a jit-compiled JAX wavefront path
tracer (core/integrator.py) designed for TPU: flat SoA scene tables, masked
fixed-shape execution, threefry RNG, shard_map multi-chip scaling
(parallel/).
"""

import os as _os

import numpy as np

# Persistent XLA compilation cache: TPU compiles of the wavefront program take
# minutes (remote-compile tunnel); caching them across processes makes every
# re-run after the first instant.  Opt out with RAYTRACER_TPU_NO_CACHE=1.
#
# CPU-forced runs (tests, bench_sharded, dryrun_multichip, the parity
# report — they all export JAX_PLATFORMS=cpu before importing this package)
# use a HOST-FINGERPRINT-KEYED directory: XLA:CPU AOT executables embed the
# build host's machine features, and loading an entry cached on a different
# host segfaults the process (observed: the full test suite dying inside
# compilation_cache.get_executable_and_time with cpu_aot_loader "machine
# type ... doesn't match" warnings, R3.13).  Keying the directory by
# (machine, jax version, cpu model+flags) means a new VM starts a fresh
# cache instead of crashing on the old one — and repeat CPU renders skip
# XLA:CPU's multi-minute wavefront compiles, which measured as ~98% of the
# cold example1 CPU wall (scripts/triage_cpu_example1.py, VERDICT r3 #4).


def _cpu_host_fingerprint():
    import hashlib
    import platform

    import jax as _j

    # x86 exposes "model name"/"flags"; ARM "CPU implementer"/"CPU part"/
    # "Features".  If nothing matches (unknown /proc layout), fall back to
    # platform.processor() so the fingerprint never degenerates to just
    # (machine, jax version) — two hosts sharing a home dir with that blob
    # would share AOT executables and re-create the R3.13 segfault.
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith(("model name", "flags", "CPU implementer",
                                  "CPU part", "Features")):
                    lines.append(ln.strip())
                if len(lines) >= 2:
                    break
    except OSError:
        pass
    if not lines:
        lines.append(platform.processor())
    blob = "|".join([platform.machine(), _j.__version__] + lines)
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


def _cpu_is_forced():
    """True when this process is pinned to XLA:CPU.

    When jax is already imported, its config value is authoritative — the
    axon sitecustomize OVERRIDES the JAX_PLATFORMS env var, so a process
    with the env set but actually running on TPU must NOT key its cache
    into the per-host CPU directory (it would bypass the shared TPU cache
    and recompile for minutes).  The env var is only consulted before jax
    import, where it is the best available guess; the documented way to
    force CPU is jax.config.update("jax_platforms", "cpu"), which the
    config check sees (R3.13 / ADVICE r4)."""
    import sys as _sys

    _j = _sys.modules.get("jax")
    if _j is not None:
        try:
            return (_j.config.jax_platforms or "").strip().lower() == "cpu"
        except Exception:
            pass
    return _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"


def _set_cache_dir(cpu_forced):
    import jax as _jax

    cache_dir = _os.environ.get(
        "RAYTRACER_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      "raytracer_tpu_xla_cpu_" + _cpu_host_fingerprint()
                      if cpu_forced else "raytracer_tpu_xla"))
    try:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


def _ensure_cache_matches_backend():
    """Re-point the persistent cache if the backend diverged from the
    import-time guess (jax.config.update("jax_platforms", "cpu") AFTER
    importing this package).  Called from compile_scene — i.e. before the
    first scene program is built — so a late CPU pin still lands in the
    fingerprint-keyed CPU directory."""
    if _os.environ.get("RAYTRACER_TPU_NO_CACHE"):
        return
    global _cpu_forced
    forced = _cpu_is_forced()
    if forced != _cpu_forced:
        _cpu_forced = forced
        _set_cache_dir(forced)


_cpu_forced = _cpu_is_forced()
if not _os.environ.get("RAYTRACER_TPU_NO_CACHE"):
    _set_cache_dir(_cpu_forced)

from .animation import (create_animation,
                        create_animation_using_opencv, render_motion_blur)
from .backgrounds.environment import Panorama, SkyBox, procedural_sky
from .core.camera import Camera
from .core.integrator import RenderSettings
from .core.aov import render_aovs
from .core.ray import Hit, Ray, first_hit, get_distances, get_raycolor
from .denoise import denoise
from .core.scene import Scene
from .core.vec import array_to_vec3, extract, rgb, vec3
from .lights import Light
# reference constants, star-exported there (sightpy/utils/constants.py);
# FARAWAY here is the float32-safe 1e30 (the reference's 1e39 overflows f32)
from .utils.constants import FARAWAY, SKYBOX_DISTANCE, UPDOWN, UPWARDS
from .utils.random import (PDF, cosine_pdf, hemisphere_pdf, mixed_pdf,
                           random_in_unit_disk, random_in_unit_sphere,
                           random_in_unit_spherical_cap,
                           random_in_unit_spherical_caps, spherical_caps_pdf)
from .geometry.primitive import (Cuboid, Cylinder, Disc, MeshInstances,
                                 Plane, Primitive, Sphere, Surface, Triangle,
                                 TriangleMesh)
from .lights import DirectionalLight, PointLight, SpotLight
from .materials.base import (CustomMaterial, Diffuse, Emissive, Glossy,
                             Material, Refractive, ThinFilmInterference)
from .materials.shade import ShadeOut, default_shade_out
from .textures.texture import image, solid_color, texture
from .backgrounds.blur import blur_skybox, blur_skybox_array
from .utils.colour import srgb_linear_to_srgb, srgb_to_srgb_linear
from .scene_io import (load_scene_file, save_scene_file, scene_from_dict,
                       scene_to_dict)
from .utils.image_io import (add_asset_root, load_hdr, load_image,
                             load_image_as_linear_srgb, load_image_with_blur,
                             save_hdr)
from .vr import render_ods

# the reference star-exports these exact (camelCase) names
# (sightpy/utils/colour_functions.py, image_functions.py, and
# blur_background.py's blur_skybox); user scripts call them verbatim
sRGB_linear_to_sRGB = srgb_linear_to_srgb
sRGB_to_sRGB_linear = srgb_to_srgb_linear
load_image_as_linear_sRGB = load_image_as_linear_srgb

__version__ = "0.8.0"

__all__ = [
    "Scene", "Camera", "vec3", "rgb", "np", "Ray", "Hit", "get_raycolor",
    "get_distances", "first_hit", "render_aovs", "denoise",
    "PDF", "hemisphere_pdf", "cosine_pdf", "spherical_caps_pdf", "mixed_pdf",
    "random_in_unit_disk", "random_in_unit_sphere",
    "random_in_unit_spherical_cap", "random_in_unit_spherical_caps",
    "Sphere", "Plane", "Cuboid", "Disc", "Cylinder", "Triangle",
    "TriangleMesh", "MeshInstances", "Primitive", "Surface",
    "Diffuse", "Glossy", "Refractive", "Emissive", "ThinFilmInterference",
    "Material", "CustomMaterial", "ShadeOut", "default_shade_out",
    "texture", "image", "solid_color",
    "PointLight", "DirectionalLight", "SpotLight",
    "SkyBox", "Panorama", "procedural_sky",
    "create_animation", "create_animation_using_opencv",
    "render_motion_blur", "render_ods",
    "RenderSettings", "add_asset_root",
    "load_scene_file", "scene_from_dict", "save_scene_file", "scene_to_dict",
    "load_image", "load_image_as_linear_srgb", "load_image_with_blur",
    "save_hdr", "load_hdr",
    "srgb_linear_to_srgb", "srgb_to_srgb_linear",
    "sRGB_linear_to_sRGB", "sRGB_to_sRGB_linear", "load_image_as_linear_sRGB",
    "blur_skybox", "blur_skybox_array",
    "extract", "array_to_vec3", "Light",
    "FARAWAY", "UPWARDS", "UPDOWN", "SKYBOX_DISTANCE",
]
