"""Frame-loop animation helpers (reference sightpy/animation.py:6-54).

Because camera and geometry parameters are traced (not baked into the XLA
program), re-rendering a mutated scene reuses the compiled executable —
frames after the first render at full device speed.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def create_animation(scene, samples_per_pixel, fps, start_time, final_time,
                     update_scene, name, frames_dir="./frames"):
    """Render frames to PNG files: frames/<name>_<i>.png.

    Assemble with e.g.:
    ffmpeg -r 60 -f image2 -i frames/name_%d.png -vcodec libx264 -crf 1 -pix_fmt yuv420p out.mp4
    """
    number_of_frames = int(fps * (final_time - start_time))
    dt = (final_time - start_time) / number_of_frames
    t = start_time
    Path(frames_dir).mkdir(exist_ok=True)
    for i in range(number_of_frames):
        update_scene(scene, t)
        img = scene.render(samples_per_pixel)
        t += dt
        img.save(str(Path(frames_dir) / f"{name}_{i}.png"))


def create_animation_using_opencv(scene, samples_per_pixel, fps, start_time,
                                  final_time, update_scene, name):
    import cv2

    number_of_frames = int(fps * (final_time - start_time))
    dt = (final_time - start_time) / number_of_frames
    t = start_time
    videodims = (scene.camera.screen_width, scene.camera.screen_height)
    fourcc = cv2.VideoWriter_fourcc("M", "J", "P", "G")
    video = cv2.VideoWriter(name, fourcc, fps, videodims)
    for _ in range(number_of_frames):
        update_scene(scene, t)
        frame = scene.render(samples_per_pixel)
        video.write(cv2.cvtColor(np.array(frame), cv2.COLOR_RGB2BGR))
        t += dt
    video.release()
