"""Inverse rendering: recover a glass IoR by gradient descent.

The reference fork exists to infer a refraction index from rendered images
— its Training_raytracer.ipynb renders per-ray datasets at known IoRs and
trains likelihood-free models (NDE/SCANDAL/ROLR/RASCAL) to invert the
renderer.  This engine is pure JAX, so the renderer inverts itself: render
a target image at an unknown-to-the-optimizer IoR, then run Adam on the
pixel MSE straight through the wavefront integrator (raytracer_tpu/diff.py).
No surrogate model, no simulation dataset — sixty gradient steps.

    python examples/inverse_rendering.py           # 96x72 @ 8 spp
    python examples/inverse_rendering.py --quick   # tiny/fast (CI smoke)

Writes INVERSE_target.png / INVERSE_start.png / INVERSE_final.png next to
the script.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax                                   # noqa: E402
import jax.numpy as jnp                      # noqa: E402
import numpy as np                           # noqa: E402
import optax                                 # noqa: E402

from raytracer_tpu import (                  # noqa: E402
    Emissive, Refractive, Scene, Sphere, rgb, vec3)
from raytracer_tpu.diff import (differentiable_render,  # noqa: E402
                                safe_value_and_grad, update_materials)
from raytracer_tpu.utils.colour import srgb_linear_to_srgb  # noqa: E402


def build_scene(n, width, height):
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=width, screen_height=height, field_of_view=35)
    sc.add(Sphere(material=Refractive(n=vec3(n + 1e-6j, n + 1e-6j, n + 1e-6j)),
                  center=vec3(0, 0, 0), radius=0.55, shadow=False,
                  max_ray_depth=3))
    # structured emissive enclosure: refraction visibly warps the gradient
    sc.add(Sphere(material=Emissive(color=rgb(0.9, 0.55, 0.25)),
                  center=vec3(-14, 6, -8), radius=12.0, shadow=False))
    sc.add(Sphere(material=Emissive(color=rgb(0.2, 0.45, 0.9)),
                  center=vec3(14, -6, -8), radius=12.0, shadow=False))
    sc.add(Sphere(material=Emissive(color=rgb(0.05, 0.05, 0.07)),
                  center=vec3(0, 0, 0), radius=40.0, shadow=False))
    return sc


def save(img, path):
    from PIL import Image

    arr = np.asarray(srgb_linear_to_srgb(np.clip(np.asarray(img), 0.0, None)))
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    W, H, spp = (32, 24, 2) if args.quick else (96, 72, 8)
    true_n, start_n = 1.52, 1.20
    here = Path(__file__).resolve().parent

    fn, data = differentiable_render(build_scene(true_n, W, H),
                                     samples_per_pixel=spp, seed=0)
    target = fn(data)
    save(target, here / "INVERSE_target.png")

    def loss(n_scalar):
        n_re = jnp.full_like(data.mats.refr_n_re, n_scalar)
        return jnp.mean((fn(update_materials(data, refr_n_re=n_re))
                         - target) ** 2)

    opt = optax.adam(2e-2)

    @jax.jit
    def step(n, s):
        # safe_value_and_grad: one degenerate f32 sample would otherwise
        # NaN the gradient and apply_updates would never recover
        v, g = safe_value_and_grad(loss)(n)
        upd, s = opt.update(g, s)
        return optax.apply_updates(n, upd), s, v, g

    n = jnp.asarray(start_n, jnp.float32)
    state = opt.init(n)
    save(fn(update_materials(
        data, refr_n_re=jnp.full_like(data.mats.refr_n_re, n))),
        here / "INVERSE_start.png")

    t0 = time.time()
    for i in range(args.steps):
        n, state, v, g = step(n, state)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  n={float(n):.4f}  loss={float(v):.3e}  "
                  f"grad={float(g):+.2e}")
    print(f"{args.steps} steps in {time.time() - t0:.1f} s "
          f"(first step includes the grad compile)")
    print(f"recovered n = {float(n):.4f}   (true {true_n}, start {start_n})")

    save(fn(update_materials(
        data, refr_n_re=jnp.full_like(data.mats.refr_n_re, n))),
        here / "INVERSE_final.png")


if __name__ == "__main__":
    main()
