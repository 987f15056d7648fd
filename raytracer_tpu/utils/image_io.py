"""Host-side image loading / saving.

Replaces sightpy/utils/image_functions.py:7-33.  Differences (deliberate,
documented reference defects we do not replicate — SURVEY.md §5):

* images are normalized by 255.0, not 256.0 (the reference divides by 256,
  slightly darkening every texture, image_functions.py:9);
* asset paths are resolved against an explicit search path instead of
  hard-coded cwd-relative strings ("sightpy/textures/...", texture.py:29).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from .colour import srgb_to_srgb_linear

# Asset search path.  Scenes refer to textures by bare filename (matching the
# reference API, e.g. image("checkered_floor.png")); files are looked up in
# each root and its textures/ backgrounds/ normalmaps/ subdirectories.
_DEFAULT_ROOTS = [
    Path(__file__).resolve().parent.parent / "assets",
]
if os.environ.get("SIGHTPY_ASSETS"):
    _DEFAULT_ROOTS.insert(0, Path(os.environ["SIGHTPY_ASSETS"]))

_SUBDIRS = ("", "textures", "backgrounds", "normalmaps", "backgrounds/lightmaps")


def add_asset_root(path):
    """Prepend a directory to the asset search path."""
    _DEFAULT_ROOTS.insert(0, Path(path))


def resolve_asset(name, subdir_hint=None):
    """Find an asset file by name (or return the path unchanged if absolute)."""
    p = Path(name)
    if p.is_absolute() or p.exists():
        return p
    subdirs = ([subdir_hint] if subdir_hint else []) + list(_SUBDIRS)
    for root in _DEFAULT_ROOTS:
        for sub in subdirs:
            cand = root / sub / name
            if cand.exists():
                return cand
    raise FileNotFoundError(
        f"asset {name!r} not found under roots {[str(r) for r in _DEFAULT_ROOTS]}; "
        "set SIGHTPY_ASSETS or call add_asset_root()"
    )


def load_image(path, subdir_hint=None, blur=0.0):
    """Load an image as a float array in [0, 1], shape (H, W, C)."""
    from PIL import Image, ImageFilter

    img = Image.open(resolve_asset(path, subdir_hint))
    if blur != 0.0:
        img = img.filter(ImageFilter.GaussianBlur(radius=blur))
    a = np.asarray(img, dtype=np.float32) / 255.0
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    return a[..., :3]


def load_image_with_blur(path, blur=0.0, subdir_hint=None):
    return load_image(path, subdir_hint=subdir_hint, blur=blur)


def load_image_as_linear_srgb(path, blur=0.0, subdir_hint=None):
    """Load an image and linearize it (reference image_functions.py:19-33)."""
    return srgb_to_srgb_linear(load_image(path, subdir_hint=subdir_hint, blur=blur)).astype(np.float32)


def save_image(array, path):
    """Save a (H, W, 3) float [0,1] array as PNG."""
    from PIL import Image

    a = np.clip(np.asarray(array), 0.0, 1.0)
    Image.fromarray((a * 255).astype(np.uint8), "RGB").save(path)


def array_to_pil(array):
    """Convert a (H, W, 3) float [0,1] array to a PIL RGB image."""
    from PIL import Image

    a = np.clip(np.asarray(array), 0.0, 1.0)
    return Image.fromarray((a * 255).astype(np.uint8), "RGB")
