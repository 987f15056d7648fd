"""Material description classes (host side).

These mirror the reference material constructors kwarg-for-kwarg
(sightpy/materials/*.py) but hold only parameters; the shading math lives in
materials/shade.py as wavefront kernels, dispatched by material type id.
"""

from __future__ import annotations

import numpy as np

from ..core.vec import as_complex3
from ..textures.texture import as_texture
from ..utils.image_io import load_image

# material type ids used by the compiled dispatch tables
MAT_NONE = 0
MAT_EMISSIVE = 1
MAT_GLOSSY = 2
MAT_DIFFUSE = 3
MAT_REFRACTIVE = 4
MAT_THINFILM = 5
MAT_ENV = 6          # skybox / panorama environment material
MAT_CUSTOM = 7       # user-defined wavefront shading hook (CustomMaterial)

MAT_TYPE_NAMES = {
    MAT_NONE: "none", MAT_EMISSIVE: "emissive", MAT_GLOSSY: "glossy",
    MAT_DIFFUSE: "diffuse", MAT_REFRACTIVE: "refractive",
    MAT_THINFILM: "thinfilm", MAT_ENV: "env", MAT_CUSTOM: "custom",
}


class Material:
    """Base: optional tangent-space normal map (reference material.py:11-40)."""

    mat_type = MAT_NONE

    def __init__(self, normalmap=None):
        self.normalmap = None
        self.normalmap_repeat = 1.0
        self.normalmap_bilinear = False
        if normalmap is not None:
            self.set_normalmap(normalmap)
        self.assigned_primitive = None

    def set_normalmap(self, normalmap, repeat=1.0, filter="nearest"):
        if isinstance(normalmap, np.ndarray):
            self.normalmap = np.asarray(normalmap, dtype=np.float32)
        else:
            self.normalmap = load_image(normalmap, subdir_hint="normalmaps")
        self.normalmap_repeat = float(repeat)
        if filter not in ("nearest", "bilinear"):
            raise ValueError(f"filter must be 'nearest' or 'bilinear', got {filter!r}")
        self.normalmap_bilinear = filter == "bilinear"


class CustomMaterial(Material):
    """User-defined material: subclass and implement `shade(ctx) -> ShadeOut`.

    The reference's extensibility story is subclassing Material and writing a
    recursive numpy `get_color(scene, ray, hit)` (sightpy/materials/
    material.py:11-44).  The TPU-native equivalent is a *wavefront hook*:
    `shade` receives a ShadeCtx (core/integrator.py) describing the hit state
    of the WHOLE ray wavefront — positions `ctx.P`, shading normals `ctx.N`,
    uv `ctx.uv`, incoming directions `ctx.D`, a per-call PRNG key `ctx.key` —
    and returns a ShadeOut (materials/shade.py) with the local radiance
    (`add`), throughput multiplier (`beta_mult`) and continuation ray.  Write
    it in jax.numpy over `(N, ...)` arrays; the integrator masks the result
    to the rays that actually hit this material and jit-compiles everything.

    Parameters the shader uses should be stored as instance attributes and
    read inside shade(); plain-python parameters (numbers, strings, flat
    tuples) are change-detected by the compile/jit caches, so mutating them
    re-traces correctly.  Arrays and other objects are keyed by IDENTITY —
    assign a NEW array (never mutate one in place) to change such a
    parameter.

    Image textures: close over the array and sample it with
    `materials.shade.fetch_texture(my_array, ctx.uv, repeat)` — the array
    is baked into the compiled program as a constant, which is the right
    trade for small/medium textures (the built-ins' shared device atlas
    only exists for the Pallas record path, which custom scenes never use).

    Scenes containing a CustomMaterial always render through the jnp
    wavefront path (never the Pallas kernels).
    """

    mat_type = MAT_CUSTOM

    def shade(self, ctx):
        raise NotImplementedError(
            "subclass CustomMaterial and implement shade(ctx) -> ShadeOut")


class Emissive(Material):
    """Area-light surface; terminates paths (reference emissive.py:11-23)."""

    mat_type = MAT_EMISSIVE

    def __init__(self, color, **kwargs):
        super().__init__(**kwargs)
        self.texture_color = as_texture(color)


class Glossy(Material):
    """Lambert + Schlick-Fresnel/Blinn-Phong + mirror recursion
    (reference glossy.py:11-110)."""

    mat_type = MAT_GLOSSY

    def __init__(self, diff_color, roughness, spec_coeff, diff_coeff, n, **kwargs):
        super().__init__(**kwargs)
        self.diff_texture = as_texture(diff_color)
        self.roughness = float(roughness)
        self.spec_coeff = float(spec_coeff)
        self.diff_coeff = float(diff_coeff)
        self.n = as_complex3(n, "n")


class Diffuse(Material):
    """Monte-Carlo Lambertian with cosine/light-cap importance mixture
    (reference diffuse.py:12-124)."""

    mat_type = MAT_DIFFUSE

    def __init__(self, diff_color, diffuse_rays=20, ambient_weight=0.5, **kwargs):
        super().__init__(**kwargs)
        self.diff_texture = as_texture(diff_color)
        # `diffuse_rays` is the reference's first-bounce branching factor
        # (diffuse.py:34-83).  The wavefront integrator traces one diffuse
        # continuation per path; Scene.render multiplies the effective
        # samples-per-pixel by the scene's max diffuse_rays instead
        # (Scene._diffuse_fan, core/scene.py) — identical total sample
        # counts, unbiased for the same integral.
        self.diffuse_rays = int(diffuse_rays)
        self.max_diffuse_reflections = 2
        self.ambient_weight = float(ambient_weight)


class Refractive(Material):
    """Complex-IoR Fresnel dielectric with Beer-Lambert absorption
    (reference refractive.py:10-123).

    dispersion=True enables spectral dispersion — per-channel Snell
    refraction via hero-wavelength sampling (each transmitted path refracts
    at ONE randomly-chosen channel's IoR with 3x single-channel throughput;
    unbiased per channel).  The reference explicitly does not implement
    this (refractive.py:76 "Spectrum dispersion is not implemented", it
    averages the channel IoRs); give n a per-channel spread (e.g. BK7
    (1.527, 1.531, 1.539)) to see chromatic fringes.  Dispersive scenes
    render on the jnp wavefront path.
    """

    mat_type = MAT_REFRACTIVE

    def __init__(self, n, dispersion=False, **kwargs):
        super().__init__(**kwargs)
        self.n = as_complex3(n, "n")
        self.dispersion = bool(dispersion)


class ThinFilmInterference(Material):
    """Thin-film coating: reflectance from a (cos-theta, thickness) LUT
    (reference thin_film_interference.py:11-115).

    The reference reads a precomputed PNG LUT; by default we *compute* the
    LUT analytically from Airy-summation thin-film optics (utils/thin_film.py)
    for the given film index, which matches the reference tables without
    shipping their assets.  A custom LUT array can be passed instead.
    """

    mat_type = MAT_THINFILM

    def __init__(self, thickness, noise=0.0, film_n=1.4, lut=None,
                 noise_texture=None, **kwargs):
        super().__init__(**kwargs)
        self.thickness = float(thickness)
        self.noise_factor = float(noise)
        self.film_n = float(film_n)
        # array LUTs/noise cannot be spelled in the JSON schema (scene_io)
        self.custom_tables = lut is not None or noise_texture is not None
        if lut is not None:
            self.lut = np.asarray(lut, dtype=np.float32)
        else:
            # prefer the reference's shipped LUT when the asset root has it
            # (thin_film_interference.py:17-19 — raw PNG values /256, NOT
            # linearized) so film colors match the reference's renders
            # bit-close; the analytic Airy table is the no-asset fallback.
            try:
                from PIL import Image

                from ..utils.image_io import resolve_asset
                p = resolve_asset(f"thin_film_interference_n={film_n:g}.png",
                                  subdir_hint="textures")
                self.lut = (np.asarray(Image.open(p), dtype=np.float32)
                            / 256.0)[..., :3]
            except FileNotFoundError:
                from ..utils.thin_film import thin_film_lut
                self.lut = thin_film_lut(film_n)
        if noise_texture is not None:
            self.noise_texture = np.asarray(noise_texture, dtype=np.float32)
        else:
            # prefer the reference's shipped jitter asset when the asset
            # root provides it (thin_film_interference.py:20-22 reads
            # sightpy/textures/noise.png channel 0) so thickness patterns
            # match the reference's renders; procedural fallback otherwise
            try:
                from ..utils.image_io import load_image
                self.noise_texture = np.ascontiguousarray(
                    load_image("noise.png", subdir_hint="textures")[..., 0])
            except FileNotFoundError:
                from ..utils.thin_film import default_noise_texture
                self.noise_texture = default_noise_texture()
