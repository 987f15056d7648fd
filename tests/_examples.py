"""Shared helper: (re)import an example scene at a reduced camera size.

The example modules (examples/example{1..4}.py) build their `Sc` at the
reference's 400x300 at import time; golden/parity tests need the same scene
graph at a small frame.  Reimporting with `Scene.add_Camera` patched keeps
the test scenes structurally IDENTICAL to the shipped workloads (same
materials, lights, background, asset resolution) instead of hand-copied
twins that can drift.
"""

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from raytracer_tpu.core.scene import Scene  # noqa: E402


def load_example(name, width, height):
    """Fresh-import examples/<name>.py with its camera forced to WxH."""
    orig = Scene.add_Camera

    def patched(self, look_from, look_at, **kw):
        kw["screen_width"] = width
        kw["screen_height"] = height
        return orig(self, look_from, look_at, **kw)

    Scene.add_Camera = patched
    try:
        sys.modules.pop(name, None)
        mod = importlib.import_module(name)
    finally:
        Scene.add_Camera = orig
    return mod.Sc
