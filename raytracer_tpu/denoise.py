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


def _gauss3(x):
    """3x3 binomial prefilter (edge-clamped) — SVGF smooths the variance
    estimate before it drives the luminance weight."""
    k = (0.25, 0.5, 0.25)
    H, W = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")
    out = jnp.zeros_like(x)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out = out + (k[dy] * k[dx]) * jax.lax.slice(
                xp, (dy, dx), (dy + H, dx + W))
    return out


@partial(jax.jit, static_argnames=("iterations",))
def _atrous(illum, normal, depth, valid, var_lum, iterations, sigma_color,
            sigma_normal, sigma_depth):
    """iterations levels of the edge-avoiding à-trous transform.

    illum (H, W, 3) linear radiance; normal (H, W, 3) oriented unit normals
    (zero where nothing was hit); depth (H, W) first-hit distance; valid
    (H, W) 1.0 for filterable pixels, 0.0 for frozen ones (emission sources —
    their radiance is exact, and mixing it into neighbors bleeds light).
    The three sigmas are traced f32 scalars.

    var_lum: None for the fixed-sigma Dammertz-style radiance weight, or the
    (H, W) per-pixel luminance variance of illum, which switches the radiance
    weight to the SVGF form exp(-|Δlum| / (σ·sqrt(var))) — noisy pixels
    filter aggressively, converged pixels keep their detail — and the
    variance itself is propagated through each level (var' = Σw²v/(Σw)²).
    """
    H, W = illum.shape[0], illum.shape[1]
    keep = valid[..., None]
    out = illum
    var = var_lum
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
        if var is not None:
            lum = out.mean(-1)
            lpad = jnp.pad(lum, spec, mode="edge")
            varpad = jnp.pad(var, spec, mode="edge")
            sdev = jnp.sqrt(jnp.maximum(_gauss3(var), 0.0))
            vsum = jnp.zeros((H, W), out.dtype)
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
                if var is not None:
                    # SVGF luminance weight: distance in units of local noise
                    lj = jax.lax.slice(lpad, (y0, x0), (y0 + H, x0 + W))
                    wc = jnp.exp(-jnp.abs(lum - lj)
                                 / (sigma_color * sdev + 1e-8))
                else:
                    # radiance edge (on the running estimate, not raw input)
                    wc = jnp.exp(-jnp.sum((out - cj) ** 2, -1) / sc2)
                w = (_B3[dy + 2] * _B3[dx + 2]) * wn * wz * wc
                if (dy, dx) == (0, 0):
                    w = jnp.maximum(w, 1e-8)   # anchor: never divide by zero
                else:
                    w = w * vj                 # frozen taps contribute nothing
                csum = csum + w[..., None] * cj
                wsum = wsum + w[..., None]
                if var is not None:
                    varj = jax.lax.slice(varpad, (y0, x0), (y0 + H, x0 + W))
                    vsum = vsum + w * w * varj
        out = jnp.where(keep > 0, csum / wsum, illum)
        if var is not None:
            var = jnp.where(valid > 0, vsum / wsum[..., 0] ** 2, var)
    return out


def denoise(img, aovs, *, variance=None, iterations=4, sigma_color=4.0,
            sigma_normal=0.1, sigma_depth=0.1, demodulate_albedo=True):
    """Denoise a LINEAR-radiance frame using its AOV feature planes.

    img:  (H, W, 3) linear radiance (e.g. `Scene.render(..., output="linear")`).
    aovs: dict from `Scene.render_aovs` — uses `albedo`, `normal`, `depth`,
      and (when present) `emissive`: pixels with any emission-source coverage
      pass through unfiltered and contribute nothing to their neighbors
      (their radiance is exact, and a light panel is often 10-100x brighter
      than the surfaces around it — mixing bleeds light).

    variance: optional (H, W, 3) per-pixel variance of the mean of img
      (`Scene.render(..., output="linear", with_variance=True)`).  When
      given, the radiance edge-stopping weight switches to the SVGF form
      (Schied et al. 2017): luminance differences are measured in units of
      the LOCAL noise level, so noisy pixels filter aggressively while
      converged pixels keep their detail, and sigma_color becomes a
      dimensionless count of standard deviations (the SVGF default is 4 —
      same numeric default, new meaning).

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
    if variance is not None:
        var = jnp.asarray(variance, jnp.float32)
        if var.shape != img.shape:
            raise ValueError(
                f"variance shape {var.shape} must match img {img.shape}")
        # demodulate (Var(x/m) = Var(x)/m²) and reduce to a luminance
        # variance.  MC channel noise comes from the same paths, so channels
        # are strongly correlated — the fully-correlated bound mean(var_c)
        # is the stable estimate for Var(mean_c), vs /3 under independence.
        var_lum = jnp.maximum(var / (mod * mod), 0.0).mean(-1)
    else:
        var_lum = None
    out = _atrous(illum, normal, depth, valid, var_lum, int(iterations),
                  jnp.float32(sigma_color), jnp.float32(sigma_normal),
                  jnp.float32(sigma_depth))
    return np.asarray(out * mod)
