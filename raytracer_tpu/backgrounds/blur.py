"""Skybox blur preprocessing (host side).

Analogue of the reference's per-face blur with neighbour stitching
(sightpy/backgrounds/util/blur_background.py:17-132).  The cubemap is the
standard 4x3 cross; before blurring we fill the six empty cross cells by
replicating the edges of adjacent faces so the Gaussian does not bleed black
into face borders, then blur the whole canvas once.
"""

from __future__ import annotations

import numpy as np

from ..utils.colour import srgb_to_srgb_linear

# cross cells present in a 4x3 cubemap: (col, row) with row 0 = bottom strip
_FILLED = {(1, 0), (0, 1), (1, 1), (2, 1), (3, 1), (1, 2)}


def _fill_empty_cells(img):
    """Replicate adjacent-face edges into the empty cross cells."""
    H, W = img.shape[:2]
    ch, cw = H // 3, W // 4
    out = img.copy()
    for col in range(4):
        for row in range(3):
            if (col, row) in _FILLED:
                continue
            y0, y1 = row * ch, (row + 1) * ch
            x0, x1 = col * cw, (col + 1) * cw
            # prefer horizontal neighbour, else vertical neighbour
            if (col - 1, row) in _FILLED:
                out[y0:y1, x0:x1] = img[y0:y1, x0 - 1:x0][:, :1]
            elif (col + 1, row) in _FILLED:
                out[y0:y1, x0:x1] = img[y0:y1, x1:x1 + 1][:, :1]
            elif (col, row - 1) in _FILLED:
                out[y0:y1, x0:x1] = img[y0 - 1:y0, x0:x1][:1, :]
            elif (col, row + 1) in _FILLED:
                out[y0:y1, x0:x1] = img[y1:y1 + 1, x0:x1][:1, :]
    return out


def blur_skybox(img_array, blur, cubemap=None):
    """Reference-exact signature (blur_background.py:17).  The third
    argument is only a progress-print label there; ignored here."""
    return blur_skybox_array(img_array, blur)


def blur_skybox_array(img, blur_radius):
    """Gaussian-blur a [0,1] float cubemap cross and return *linear* sRGB.

    Matches the contract of the reference blur_skybox (blur_background.py:17):
    input is the raw [0,1] texture; output is linearized.
    """
    from PIL import Image, ImageFilter

    padded = _fill_empty_cells(np.asarray(img, dtype=np.float32))
    pil = Image.fromarray((np.clip(padded, 0, 1) * 255).astype(np.uint8))
    blurred = pil.filter(ImageFilter.GaussianBlur(radius=blur_radius))
    arr = np.asarray(blurred, dtype=np.float32)[..., :3] / 255.0
    return srgb_to_srgb_linear(arr).astype(np.float32)
