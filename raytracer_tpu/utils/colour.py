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


def srgb_linear_to_srgb(rgb_linear):
    """Linear -> sRGB EOTF with highlight-preserving intensity scaling.

    rgb_linear: (..., 3) array. Reference: colour_functions.py:4-18 (there the
    channel axis is axis 0; here it is the last axis).
    """
    x = rgb_linear
    srgb = jnp.where(
        x <= 0.00304,
        12.92 * x,
        1.055 * jnp.power(jnp.maximum(x, 1e-30), 1.0 / 2.4) - 0.055,
    )
    rgb_max = jnp.max(srgb, axis=-1, keepdims=True) + 0.00001
    intensity_cutoff = 1.0
    return jnp.where(rgb_max > intensity_cutoff, srgb * intensity_cutoff / rgb_max, srgb)


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
