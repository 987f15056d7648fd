"""sRGB transfer functions (device + host).

Matches the reference's sightpy/utils/colour_functions.py:4-28 semantics,
including the highlight-preserving intensity clip (scaling a pixel so its
max channel is <= 1 instead of clipping channels independently).

The forward transform runs on-device inside jit; channel axis is the LAST
axis (shape (..., 3)) — the TPU-friendly layout used everywhere in this
framework.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _srgb_encode(x):
    """Pure sRGB EOTF (piecewise knee at 0.00304, reference
    colour_functions.py:4-12); no highlight handling."""
    return jnp.where(
        x <= 0.00304,
        12.92 * x,
        1.055 * jnp.power(jnp.maximum(x, 1e-30), 1.0 / 2.4) - 0.055,
    )


def srgb_linear_to_srgb(rgb_linear):
    """Linear -> sRGB EOTF with highlight-preserving intensity scaling.

    rgb_linear: (..., 3) array. Reference: colour_functions.py:4-18 (there the
    channel axis is axis 0; here it is the last axis).
    """
    srgb = _srgb_encode(rgb_linear)
    rgb_max = jnp.max(srgb, axis=-1, keepdims=True) + 0.00001
    intensity_cutoff = 1.0
    return jnp.where(rgb_max > intensity_cutoff, srgb * intensity_cutoff / rgb_max, srgb)


def aces_film(rgb_linear):
    """Narkowicz 2015 ACES filmic fit; linear radiance -> display-linear [0,1].

    y = x(2.51x + 0.03) / (x(2.43x + 0.59) + 0.14), clipped.  A soft
    shoulder that rolls highlights off smoothly instead of the reference's
    hard intensity clip — encode with the sRGB EOTF afterwards.
    """
    x = rgb_linear
    y = x * (2.51 * x + 0.03) / (x * (2.43 * x + 0.59) + 0.14)
    return jnp.clip(y, 0.0, 1.0)


def reinhard(rgb_linear, white=4.0):
    """Extended Reinhard, per channel: y = x(1 + x/w^2) / (1 + x).

    Maps x = `white` to 1.0 exactly and compresses above; display-linear
    output in [0, 1] (clipped past the white point).
    """
    x = rgb_linear
    y = x * (1.0 + x / (white * white)) / (1.0 + x)
    return jnp.clip(y, 0.0, 1.0)


TONEMAP_OPERATORS = ("srgb", "aces", "reinhard")


def tonemap_display(rgb_linear, operator="srgb", exposure_scale=1.0):
    """Linear radiance -> display sRGB in [0, 1].

    operator: "srgb" (the reference pipeline — sRGB EOTF with the
    highlight-preserving intensity clip, colour_functions.py:4-18), "aces"
    (Narkowicz filmic fit + sRGB EOTF), or "reinhard" (extended Reinhard,
    white point 4, + sRGB EOTF).  exposure_scale multiplies the linear
    radiance first (2**stops); 1.0 is exact (multiplying by 1.0 is bitwise
    identity in IEEE float, so the default path matches the goldens).
    """
    x = rgb_linear * exposure_scale
    if operator == "srgb":
        return srgb_linear_to_srgb(x)
    if operator == "aces":
        return _srgb_encode(aces_film(x))
    if operator == "reinhard":
        return _srgb_encode(reinhard(x))
    raise ValueError(
        f"tonemap must be one of {TONEMAP_OPERATORS}, got {operator!r}")


def srgb_to_srgb_linear(srgb):
    """sRGB -> linear (host-side, numpy; used for texture preprocessing).

    Reference: colour_functions.py:21-28.
    """
    srgb = np.asarray(srgb)
    return np.where(
        srgb <= 0.03928,
        srgb / 12.92,
        np.power((srgb + 0.055) / 1.055, 2.4),
    )
