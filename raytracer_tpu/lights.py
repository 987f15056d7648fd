"""Light descriptions (reference sightpy/lights.py:25-52).

Only Glossy consumes lights (reference lights.py:6).  The reference's
PointLight.get_L references undefined globals (lights.py:30-31, a known
defect) — the point-light direction/falloff here is the intended fixed math.
"""

from __future__ import annotations

from .core.vec import as_float3


class Light:
    def __init__(self, color):
        self.color = as_float3(color, "color")


class PointLight(Light):
    """Inverse-square falloff x100 (reference lights.py:36-37)."""

    def __init__(self, pos, color):
        super().__init__(color)
        self.pos = as_float3(pos, "pos")


class DirectionalLight(Light):
    """Constant irradiance; treated as infinitely far (reference lights.py:40-52)."""

    def __init__(self, Ldir, color):
        super().__init__(color)
        import numpy as np
        d = as_float3(Ldir, "Ldir")
        self.Ldir = d / np.linalg.norm(d)
