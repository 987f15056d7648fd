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
        from .geometry.primitive import stable_unit
        self.Ldir = stable_unit(as_float3(Ldir, "Ldir"))


class SpotLight(Light):
    """Cone spotlight (beyond the reference — sightpy has point/directional
    only, lights.py:25-52).

    PointLight's 1/d² ×100 falloff modulated by a smooth cone factor: 1
    inside `inner_angle`, smoothstep to 0 at `angle` (the outer half-angle,
    degrees, measured from `direction`).  `inner_angle` defaults to 3/4 of
    the outer angle; set it equal to `angle` for a hard-edged cone.
    """

    def __init__(self, pos, direction, color, angle=30.0, inner_angle=None):
        super().__init__(color)
        import numpy as np
        from .geometry.primitive import stable_unit
        self.pos = as_float3(pos, "pos")
        self.direction = stable_unit(as_float3(direction, "direction"))
        outer = float(angle)
        inner = float(inner_angle) if inner_angle is not None else 0.75 * outer
        if not 0.0 < outer < 180.0:
            raise ValueError(f"angle must be in (0, 180) degrees, got {outer}")
        if not 0.0 <= inner <= outer:
            raise ValueError(
                f"inner_angle must be in [0, angle], got {inner} vs {outer}")
        self.angle = outer
        self.inner_angle = inner
        self.cos_outer = float(np.cos(np.radians(outer)))
        self.cos_inner = float(np.cos(np.radians(inner)))
