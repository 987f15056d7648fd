#!/usr/bin/env python
"""Render a camera-orbit GIF of the mesh example for the README gallery.

Drives raytracer_tpu.animation.render_frames (frame-parallel over the device
mesh, compute/encode pipelined) on the 5,120-triangle icosphere scene.
One compiled executable serves every frame — the camera parameters are
traced arrays, so the orbit never recompiles.

Usage: render_orbit_gif.py [n_frames] [out.gif]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main(n_frames=24, out="docs/renders/orbit.gif"):
    from PIL import Image

    from bench_mesh import build_scene
    from raytracer_tpu.animation import render_frames

    sc = build_scene(subdiv=4)                 # 5,120 tris
    sc.camera.screen_width = 240
    sc.camera.screen_height = 180

    def orbit(scene, t):
        a = 2.0 * np.pi * t
        r, y = 6.0, 1.2
        scene.camera.look_from = np.asarray(
            [r * np.sin(a), y, r * np.cos(a)], np.float32)

    times = [i / n_frames for i in range(n_frames)]
    t0 = time.time()
    frames = [Image.fromarray(f) for f in
              render_frames(sc, samples_per_pixel=4, times=times,
                            update_scene=orbit)]
    wall = time.time() - t0
    print(f"{n_frames} frames in {wall:.1f}s ({wall / n_frames:.2f} s/frame "
          f"incl. first-frame compile)", flush=True)
    frames[0].save(out, save_all=True, append_images=frames[1:],
                   duration=83, loop=0)
    print("wrote", out, Path(out).stat().st_size // 1024, "KiB")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24,
         sys.argv[2] if len(sys.argv) > 2 else "docs/renders/orbit.gif")
