#!/usr/bin/env python
"""Regenerate the README gallery renders on TPU and report wall-clocks."""

import importlib
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "examples"))

OUT = ROOT / "docs" / "renders"


def main():
    for name, spp in (("example1", 64), ("example2", 64), ("example3", 64),
                      ("example4", 64)):
        mod = importlib.import_module(name)
        sc = mod.Sc
        sc.render(samples_per_pixel=1)      # compile
        t0 = time.time()
        img, st = sc.render(samples_per_pixel=spp, seed=3, return_stats=True)
        wall = time.time() - t0
        img.save(str(OUT / f"our_{name}.png"))
        print(f"{name}: {wall:.2f}s @ {spp} spp "
              f"({st['samples']} paths/px, {st['mrays_per_s']:.0f} Mrays/s)",
              flush=True)

    from example_cornellbox import build_cornell

    sc = build_cornell(400, 400)
    sc.render(samples_per_pixel=1, return_stats=True)
    t0 = time.time()
    img, st = sc.render(samples_per_pixel=1024, seed=3, return_stats=True)
    wall = time.time() - t0
    img.save(str(OUT / "cornell_1024spp.png"))
    print(f"cornell 400x400 @1024spp: {wall:.2f}s "
          f"({st['samples']} paths/px, {st['mrays_per_s']:.0f} Mrays/s)",
          flush=True)

    from example_dispersion import build_scene

    sc = build_scene(400, 300)
    sc.render(samples_per_pixel=1)
    t0 = time.time()
    img = sc.render(samples_per_pixel=256, seed=3)
    wall = time.time() - t0
    img.save(str(OUT / "dispersion.png"))
    print(f"dispersion 400x300 @256spp: {wall:.2f}s", flush=True)

    for name, spp, out in (("example_mesh", 64, "our_example_mesh.png"),
                           ("example_mesh_textured", 64,
                            "mesh_textured.png"),
                           ("example_instances", 64, "instances.png"),
                           ("example_env_is", 64, "env_is.png"),
                           ("example_panorama", 64, "panorama.png"),
                           ("example_fisheye", 64, "fisheye.png"),
                           ("example_primitives", 64, "primitives.png")):
        mod = importlib.import_module(name)
        sc = mod.Sc
        sc.render(samples_per_pixel=1)
        t0 = time.time()
        img = sc.render(samples_per_pixel=spp, seed=3)
        wall = time.time() - t0
        img.save(str(OUT / out))
        print(f"{name}: {wall:.2f}s @ {spp} spp", flush=True)

    from raytracer_tpu import render_motion_blur
    from example_motion_blur import Sc as mb_scene, fly

    t0 = time.time()
    img = render_motion_blur(mb_scene, samples_per_pixel=64,
                             update_scene=fly, slices=32)
    wall = time.time() - t0
    img.save(str(OUT / "motion_blur.png"))
    print(f"motion_blur: {wall:.2f}s @ 64 spp x 32 slices", flush=True)

    import numpy as np

    from raytracer_tpu import render_ods
    from example_vr import Sc as vr_scene

    t0 = time.time()
    left, right = render_ods(vr_scene, samples_per_pixel=128, ipd=0.2,
                             seed=3, layout="separate", output="np",
                             clamp=6.0)
    wall = time.time() - t0
    from PIL import Image
    Image.fromarray(np.concatenate([left, right], 0)).save(
        str(OUT / "vr_ods.png"))
    Image.fromarray(np.stack([left[..., 0], right[..., 1], right[..., 2]],
                             -1)).save(str(OUT / "vr_anaglyph.png"))
    print(f"example_vr: {wall:.2f}s @ 128 spp x 2 eyes", flush=True)

    from raytracer_tpu import load_scene_file

    sc = load_scene_file(ROOT / "examples" / "example_scene.json")
    sc.render(samples_per_pixel=1)
    t0 = time.time()
    img = sc.render(samples_per_pixel=64, seed=3)
    wall = time.time() - t0
    img.save(str(OUT / "json_scene.png"))
    print(f"example_scene.json: {wall:.2f}s @ 64 spp", flush=True)


if __name__ == "__main__":
    main()
