"""Omni-directional stereo (ODS) 360 rendering for VR playback.

Beyond the reference (its camera is pinhole/thin-lens only,
sightpy/camera.py:8-49): `render_ods` renders the Google-Jump-style ODS
projection — one equirect frame per eye, with each ray's origin displaced
`ipd/2` along the horizontal tangent of its viewing azimuth, so every image
column carries correct horizontal parallax for a viewer looking that way.
The stacked output (left eye on top by convention) plays directly in any
VR-video player as a top/bottom stereo 360 frame.

Design: a standalone ray generator feeding the wavefront integrator
(`core.integrator.trace`) — its own jit program keyed on the scene
structure, sharing `compile_scene_cached`'s tables with `Scene.render`.
Both eyes and every interpupillary distance reuse ONE executable: the eye
sign, ipd and heading are traced scalars.  The same jitter key drives both
eyes so their noise is correlated (matched grain between eyes avoids
binocular rivalry) and `ipd=0` reproduces the plain equirect render
bit-exactly in both.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.compile import compile_scene_cached, derive_max_bounces
from .core.integrator import RenderSettings, trace
from .utils.colour import tonemap_display


def _ods_samples(key, data, origin0, phi0, half_ipd, eye_sign,
                 width, height, spp, static, settings, clamp=None):
    """Sum of `spp` linear radiance samples per pixel for one eye.

    Pixel (u, v) maps to azimuth/elevation exactly as the equirect camera
    (core/camera.py generate_rays): column -> azimuth around the camera
    heading `phi0`, row -> elevation (row 0 = zenith).  The ray origin is
    `origin0 + eye_sign * half_ipd * right(phi)` with `right(phi) =
    (-sin phi, 0, cos phi)` the horizontal tangent — the ODS eye circle.
    eye_sign: -1 left eye, +1 right eye (traced; one executable for both).
    """
    n_pix = width * height
    n = spp * n_pix
    k_jx, k_jy, k_trace = jax.random.split(key, 3)

    idx = jnp.arange(n, dtype=jnp.uint32)
    pix = idx % jnp.uint32(n_pix)
    col = (pix % jnp.uint32(width)).astype(jnp.float32)
    row = (pix // jnp.uint32(width)).astype(jnp.float32)
    u1 = jax.random.uniform(k_jx, (n,), jnp.float32)
    u2 = jax.random.uniform(k_jy, (n,), jnp.float32)

    el = jnp.pi * (0.5 - (row + u2) / height)
    phi = phi0 + 2.0 * jnp.pi * ((col + u1) / width - 0.5)
    rho = jnp.cos(el)
    d = jnp.stack([rho * jnp.cos(phi), jnp.sin(el), rho * jnp.sin(phi)],
                  axis=-1)
    right = jnp.stack([-jnp.sin(phi), jnp.zeros_like(phi), jnp.cos(phi)],
                      axis=-1)
    origin = origin0[None, :] + (eye_sign * half_ipd) * right

    n_re = jnp.broadcast_to(data.scene_n_re, origin.shape)
    n_im = jnp.broadcast_to(data.scene_n_im, origin.shape)
    L, _ = trace(k_trace, origin, d, n_re, n_im, data, static, settings)
    if clamp is not None:
        L = jnp.minimum(L, clamp)   # per-sample firefly ceiling (traced)
    return L.reshape(spp, n_pix, 3).sum(axis=0)


_ods_chunk = partial(jax.jit, static_argnames=("width", "height", "spp",
                                               "static", "settings"))(
    _ods_samples)


def _build_ods_sharded(static, settings, mesh, width, height,
                       spp_per_device, clamp=None):
    """Compile a sample-sharded ODS eye render over `mesh`.

    Same map-reduce shape as parallel/sharded.py: each device traces its
    own spp slice of the full frame, one psum over the "sample" axis sums
    the radiance (the multi-chip scale-out for production-size VR frames).
    """
    from jax.sharding import PartitionSpec as P

    def per_device(key, data, origin0, phi0, half_ipd, eye_sign):
        s_idx = jax.lax.axis_index("sample")
        k = jax.random.fold_in(key, s_idx)
        L = _ods_samples(k, data, origin0, phi0, half_ipd, eye_sign,
                         width, height, spp_per_device, static, settings,
                         clamp=clamp)
        return jax.lax.psum(L, "sample")

    @jax.jit
    def run(key, data, origin0, phi0, half_ipd, eye_sign):
        return jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=P(), check_vma=False,
        )(key, data, origin0, phi0, half_ipd, eye_sign)

    return run


def _finish_eye(linear, output, operator, exposure):
    if output == "linear":
        return np.asarray(linear)
    img = tonemap_display(linear, operator, exposure)
    return np.asarray(
        jnp.round(jnp.clip(img, 0.0, 1.0) * 255).astype(jnp.uint8))


def render_ods(scene, samples_per_pixel=8, ipd=0.064, seed=0,
               width=None, height=None, layout="top-bottom", output="pil",
               operator="srgb", exposure=1.0, mesh=None, clamp=None):
    """Render a stereo 360 (ODS) frame of `scene`.

    samples_per_pixel: paths traced per pixel PER EYE (camera samples; the
        integrator entry here does not apply Scene.render's diffuse fan).
    ipd: interpupillary distance in world units (0 -> both eyes identical).
    width/height: per-eye equirect resolution; defaults to the scene
        camera's screen size (height defaults to width // 2).
    layout: "top-bottom" (left eye on top — the common VR-video layout),
        "side-by-side" (left eye on the left), "anaglyph" (red/cyan
        composite — left eye in the red channel — viewable with paper
        3D glasses, no headset needed), or "separate" for a (left, right)
        tuple.
    output: "pil" (8-bit sRGB image), "np" (uint8 array) or "linear"
        (float32 radiance, no tonemap).
    operator/exposure: display transform, as Scene.render.
    mesh: an optional jax.sharding.Mesh with a "sample" axis (e.g.
        `parallel.sharded.make_mesh()`): each device traces its own spp
        slice of the full frame, summed by one psum over the axis —
        data-parallel scale-out for production-size VR frames.
        samples_per_pixel rounds up to a multiple of the shard count.
    clamp: optional per-sample linear-radiance ceiling (firefly clamping,
        as Scene.render(clamp=...)); traced — retuning never recompiles.
    """
    if scene.camera is None:
        raise ValueError("scene has no camera; call add_Camera first")
    if layout not in ("top-bottom", "side-by-side", "anaglyph", "separate"):
        raise ValueError("layout must be 'top-bottom', 'side-by-side', "
                         f"'anaglyph' or 'separate', got {layout!r}")
    if layout == "anaglyph" and output == "linear":
        raise ValueError("anaglyph is a display-space composite; use "
                         "output='pil' or 'np'")
    if output not in ("pil", "np", "linear"):
        raise ValueError(f"output must be 'pil', 'np' or 'linear', got "
                         f"{output!r}")
    spp = int(samples_per_pixel)
    if spp < 1:
        raise ValueError(f"samples_per_pixel must be >= 1, got {spp}")
    W = int(width) if width is not None else scene.camera.screen_width
    if height is not None:
        H = int(height)
    elif width is not None:
        H = max(1, W // 2)          # equirect aspect when only width given
    else:
        H = scene.camera.screen_height
    if W < 1 or H < 1:
        raise ValueError(f"invalid ODS frame size {W}x{H}")

    static, data = compile_scene_cached(scene)
    settings = RenderSettings(max_bounces=derive_max_bounces(static))

    cam = scene.camera.params()
    fwd = np.asarray(cam.fwd)
    phi0 = jnp.float32(np.arctan2(fwd[2], fwd[0]))
    origin0 = jnp.asarray(cam.origin, jnp.float32)
    half_ipd = jnp.float32(float(ipd) / 2.0)

    if clamp is not None:
        clamp = jnp.float32(clamp)
    run = None
    if mesh is not None:
        n_sample = mesh.shape["sample"]
        if mesh.shape.get("pixel", 1) != 1:
            raise ValueError("render_ods shards over the 'sample' axis "
                             "only; use a mesh with pixel=1")
        spp_dev = -(-spp // n_sample)
        spp = spp_dev * n_sample        # rounded up to whole shards
        run = _build_ods_sharded(static, settings, mesh, W, H, spp_dev,
                                 clamp=clamp)

    # chunk spp so one execution stays under the relay-friendly ray caps
    # (core/scene.py: 512k rays for clustered-mesh scenes, 4M otherwise;
    # the ODS path always runs the jnp wavefront)
    max_rays = (1 << 19) if data.geom.tri_cl_lo.shape[0] else (1 << 22)
    chunk = max(1, min(spp, 128, max_rays // (W * H)))

    eyes = []
    for eye_sign in (-1.0, 1.0):
        if run is not None:
            # the SAME key for both eyes: correlated grain; ipd=0 ->
            # bit-identical eyes (as the single-chip loop below)
            acc = run(jax.random.PRNGKey(seed), data, origin0, phi0,
                      half_ipd, jnp.float32(eye_sign))
            linear = (acc / spp).reshape(H, W, 3)
            eyes.append(_finish_eye(linear, output, operator, exposure))
            continue
        acc = jnp.zeros((W * H, 3), jnp.float32)
        done = 0
        ci = 0
        while done < spp:
            s = min(chunk, spp - done)
            # the SAME key per (chunk, eye-independent) index: correlated
            # grain between eyes; ipd=0 -> bit-identical eyes
            key = jax.random.fold_in(jax.random.PRNGKey(seed), ci)
            acc = acc + _ods_chunk(key, data, origin0, phi0, half_ipd,
                                   jnp.float32(eye_sign), W, H, s, static,
                                   settings, clamp)
            done += s
            ci += 1
        linear = (acc / spp).reshape(H, W, 3)
        eyes.append(_finish_eye(linear, output, operator, exposure))
    left, right = eyes

    if layout == "separate":
        pair = (left, right)
    elif layout == "top-bottom":
        pair = np.concatenate([left, right], axis=0)
    elif layout == "anaglyph":
        # left eye drives red, right eye green+blue (classic red/cyan)
        pair = np.stack([left[..., 0], right[..., 1], right[..., 2]],
                        axis=-1)
    else:
        pair = np.concatenate([left, right], axis=1)
    if output == "pil" and layout != "separate":
        from PIL import Image
        return Image.fromarray(pair)
    if output == "pil":
        from PIL import Image
        return tuple(Image.fromarray(e) for e in pair)
    return pair
