"""AOV-guided denoising demo: a 4-spp Cornell box reconstructed to near the
quality of a many-spp render.

The reference's Cornell example needs ">= 1000 samples for a nice image"
(example_cornellbox.py:127).  Here the à-trous denoiser
(raytracer_tpu/denoise.py), guided by the first-hit AOV feature planes
(albedo / normal / depth / emissive), turns a seconds-long low-spp render
into a clean frame.  Writes a side-by-side raw | denoised | high-spp strip.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from example_cornellbox import build_cornell          # noqa: E402

from raytracer_tpu import denoise, srgb_linear_to_srgb  # noqa: E402
from raytracer_tpu.utils.image_io import array_to_pil   # noqa: E402


def main(size=160, spp=4, truth_spp=64, out="cornell_denoised.png"):
    sc = build_cornell(size, size)
    print(f"rendering {size}x{size} @ {spp} spp ...")
    noisy, var = sc.render(spp, seed=7, output="linear", with_variance=True,
                           progress_bar=True)
    aovs = sc.render_aovs(8, seed=11)
    # SVGF-style variance guidance: noisy pixels filter hard, converged
    # pixels keep detail (what Scene.render_denoised does in one call)
    dn = denoise(noisy, aovs, variance=var)
    print(f"rendering ground truth @ {truth_spp} spp ...")
    truth = sc.render(truth_spp, seed=100, output="linear", progress_bar=True)

    tm = lambda x: np.asarray(srgb_linear_to_srgb(np.asarray(x)))
    strip = np.concatenate([tm(noisy), tm(dn), tm(truth)], axis=1)
    array_to_pil(strip).save(out)
    mse = lambda a, b: float(((tm(a) - tm(b)) ** 2).mean())
    print(f"display-space MSE vs {truth_spp} spp: "
          f"raw {mse(noisy, truth):.5f} -> denoised {mse(dn, truth):.5f}")
    print("wrote", out)


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    main(size=48 if quick else 160, spp=2 if quick else 4,
         truth_spp=16 if quick else 64)
