"""Edge-avoiding à-trous wavelet denoiser driven by the AOV feature planes.

The reference has no denoiser at all — its Cornell example just says "At
least 1000 [samples] for a nice image" (example_cornellbox.py:127).  This
module closes the loop opened by `Scene.render_aovs` (core/aov.py): render a
few samples per pixel, then reconstruct a clean image guided by the
first-hit features, after the style of Dammertz et al. 2010 ("Edge-Avoiding
À-Trous Wavelet Transform for Fast Global Illumination Filtering").

TPU-first shape: the whole filter is ONE jit program of statically-unrolled
shifted elementwise ops — each à-trous level is 25 edge-clamped shifts of the
(H, W) planes combined with per-pixel weights, which XLA fuses into a single
pass over the image.  No gathers, no dynamic shapes, no convolutions with
data-dependent kernels.  Filter parameters are traced scalars: retuning sigmas
never recompiles.

Pipeline (the standard demodulated-irradiance scheme):
  1. demodulate: illum = radiance / max(albedo, floor) — texture detail is
     moved out of the signal so the filter only sees (noisy) lighting;
  2. N à-trous levels with stride 2^level and a 5x5 B3-spline kernel; taps
     are weighted by normal, relative-depth and color edge-stopping
     functions (color sigma tightens /2 per level);
  3. remodulate: out = filtered_illum * albedo.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 1-D B3 spline; the 5x5 kernel is its outer product (Dammertz et al. §3)
_B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


@partial(jax.jit, static_argnames=("iterations",))
def _atrous(illum, normal, depth, valid, iterations, sigma_color,
            sigma_normal, sigma_depth):
    """iterations levels of the edge-avoiding à-trous transform.

    illum (H, W, 3) linear radiance; normal (H, W, 3) oriented unit normals
    (zero where nothing was hit); depth (H, W) first-hit distance; valid
    (H, W) 1.0 for filterable pixels, 0.0 for frozen ones (emission sources —
    their radiance is exact, and mixing it into neighbors bleeds light).
    The three sigmas are traced f32 scalars.
    """
    H, W = illum.shape[0], illum.shape[1]
    keep = valid[..., None]
    out = illum
    for level in range(iterations):
        step = 1 << level
        # color support halves per level: coarse levels smooth big noise,
        # fine levels only touch near-identical radiance (Dammertz §3.1)
        sc2 = (sigma_color / (1 << level)) ** 2 + 1e-12
        pad = 2 * step
        spec = ((pad, pad), (pad, pad))
        cp = jnp.pad(out, spec + ((0, 0),), mode="edge")
        npad = jnp.pad(normal, spec + ((0, 0),), mode="edge")
        dpad = jnp.pad(depth, spec, mode="edge")
        vpad = jnp.pad(valid, spec, mode="constant")
        csum = jnp.zeros_like(out)
        wsum = jnp.zeros((H, W, 1), out.dtype)
        for dy in (-2, -1, 0, 1, 2):
            for dx in (-2, -1, 0, 1, 2):
                y0, x0 = pad + dy * step, pad + dx * step
                cj = jax.lax.slice(cp, (y0, x0, 0), (y0 + H, x0 + W, 3))
                nj = jax.lax.slice(npad, (y0, x0, 0), (y0 + H, x0 + W, 3))
                dj = jax.lax.slice(dpad, (y0, x0), (y0 + H, x0 + W))
                vj = jax.lax.slice(vpad, (y0, x0), (y0 + H, x0 + W))
                # geometric edges: normal direction + relative depth (scale
                # invariant — a 10% depth jump is an edge at any distance)
                wn = jnp.exp(-jnp.sum((normal - nj) ** 2, -1)
                             / jnp.maximum(sigma_normal, 1e-6))
                zden = sigma_depth * jnp.maximum(jnp.maximum(depth, dj), 1e-6)
                wz = jnp.exp(-((depth - dj) / zden) ** 2)
                # radiance edge (on the running estimate, not the raw input)
                wc = jnp.exp(-jnp.sum((out - cj) ** 2, -1) / sc2)
                w = (_B3[dy + 2] * _B3[dx + 2]) * wn * wz * wc
                if (dy, dx) == (0, 0):
                    w = jnp.maximum(w, 1e-8)   # anchor: never divide by zero
                else:
                    w = w * vj                 # frozen taps contribute nothing
                csum = csum + w[..., None] * cj
                wsum = wsum + w[..., None]
        out = jnp.where(keep > 0, csum / wsum, illum)
    return out


def denoise(img, aovs, *, iterations=4, sigma_color=4.0, sigma_normal=0.1,
            sigma_depth=0.1, demodulate_albedo=True):
    """Denoise a LINEAR-radiance frame using its AOV feature planes.

    img:  (H, W, 3) linear radiance (e.g. `Scene.render(..., output="linear")`).
    aovs: dict from `Scene.render_aovs` — uses `albedo`, `normal`, `depth`,
      and (when present) `emissive`: pixels with any emission-source coverage
      pass through unfiltered and contribute nothing to their neighbors
      (their radiance is exact, and a light panel is often 10-100x brighter
      than the surfaces around it — mixing bleeds light).

    iterations: à-trous levels; level i has footprint stride 2^i, so 4 levels
      smooth over a ~31-pixel support while stopping at geometric edges.
    sigma_color: radiance edge-stopping width, in demodulated-illumination
      units (tightened /2 per level).  The default is tuned for very-low-spp
      frames, where MC noise dwarfs real illumination edges; lower it to
      preserve sharp shadows and caustics on cleaner inputs.
    sigma_normal / sigma_depth: geometric edge-stopping widths (squared-normal
      -difference / relative-depth-difference units).

    Returns the denoised (H, W, 3) linear numpy array.
    """
    img = jnp.asarray(img, jnp.float32)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"img must be (H, W, 3), got {img.shape}")
    albedo = jnp.asarray(aovs["albedo"], jnp.float32)
    normal = jnp.asarray(aovs["normal"], jnp.float32)
    depth = jnp.asarray(aovs["depth"], jnp.float32)
    hw = img.shape[:2]
    if albedo.shape != img.shape or normal.shape != img.shape \
            or depth.shape != hw:
        raise ValueError(
            f"AOV shapes must match img {img.shape}: albedo {albedo.shape}, "
            f"normal {normal.shape}, depth {depth.shape} (expected {hw})")
    if "emissive" in aovs:
        # dilate by one pixel: a light silhouette is subpixel, and the AOV
        # pass samples different sub-pixel positions than the beauty pass —
        # a pixel ADJACENT to detected emission may still have caught the
        # source in some beauty sample (a huge outlier no filter should eat)
        src = jnp.asarray(aovs["emissive"], jnp.float32) > 0.0
        sp = jnp.pad(src, ((1, 1), (1, 1)))
        near = jnp.zeros(hw, bool)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                near = near | jax.lax.slice(
                    sp, (dy, dx), (dy + hw[0], dx + hw[1]))
        valid = (~near).astype(jnp.float32)
    else:
        valid = jnp.ones(hw, jnp.float32)
    if demodulate_albedo:
        # floor keeps near-black albedo from blowing illum up to 1/eps noise
        mod = jnp.maximum(albedo, 0.05)
        illum = img / mod
    else:
        mod = jnp.ones_like(img)
        illum = img
    out = _atrous(illum, normal, depth, valid, int(iterations),
                  jnp.float32(sigma_color), jnp.float32(sigma_normal),
                  jnp.float32(sigma_depth))
    return np.asarray(out * mod)
