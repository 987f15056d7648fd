"""Texture descriptions (host side).

Reference: sightpy/textures/texture.py:9-39.  `image` loads the file eagerly
(linearized sRGB) into a numpy array; the compiled scene ships it to device
memory once, and the shading kernels fetch it with wrap-around
nearest-neighbour gathers replicating the reference indexing exactly
(texture.py:32-39, including the negated v axis).
"""

from __future__ import annotations

import numpy as np

from ..core.vec import as_float3, vec3
from ..utils.image_io import load_image_as_linear_srgb


class texture:
    pass


class solid_color(texture):
    def __init__(self, color):
        self.color = as_float3(color, "color")


class image(texture):
    """Image texture.  filter="nearest" replicates the reference's fetch
    (texture.py:32-39); "bilinear" wrap-interpolates the four neighbours
    (beyond the reference; such scenes render on the jnp wavefront)."""

    def __init__(self, img, repeat=1.0, filter="nearest"):
        if isinstance(img, np.ndarray):
            self.img = np.asarray(img, dtype=np.float32)
            self.source = None
        else:
            self.img = load_image_as_linear_srgb(img, subdir_hint="textures")
            self.source = str(img)      # filename, for scene export
        self.repeat = float(repeat)
        if filter not in ("nearest", "bilinear"):
            raise ValueError(f"filter must be 'nearest' or 'bilinear', got {filter!r}")
        self.bilinear = filter == "bilinear"


def as_texture(value, name="color"):
    """Accept a vec3/sequence (solid color) or a texture instance."""
    if isinstance(value, texture):
        return value
    return solid_color(as_float3(value, name))


__all__ = ["texture", "solid_color", "image", "as_texture", "vec3"]
