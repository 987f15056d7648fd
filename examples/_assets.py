"""Asset resolution shared by the example scenes.

If the original sightpy assets are available (env SIGHTPY_ASSETS, or the
reference checkout at /root/reference/sightpy), the examples use them so the
output matches the reference images; otherwise they fall back to procedural
textures from raytracer_tpu.textures.procedural.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import add_asset_root  # noqa: E402
from raytracer_tpu.utils.image_io import resolve_asset  # noqa: E402

_REF = Path(os.environ.get("SIGHTPY_ASSETS", "/root/reference/sightpy"))
if _REF.exists():
    add_asset_root(_REF)


def have(name):
    try:
        resolve_asset(name)
        return True
    except FileNotFoundError:
        return False


def floor_texture(repeat=80.0):
    from raytracer_tpu import image
    from raytracer_tpu.textures.procedural import checkerboard
    if have("checkered_floor.png"):
        return image("checkered_floor.png", repeat=repeat)
    return image(checkerboard(), repeat=repeat)


def background_for(scene, name, **kwargs):
    from raytracer_tpu.backgrounds.environment import procedural_sky
    if have(name):
        scene.add_Background(name, **kwargs)
    else:
        scene.add_Background(procedural_sky(), **kwargs)
