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
binocular rivalry) and `ipd=0` makes the two eyes bit-identical.  (The ODS
generator draws i.i.d. jitter with its own keys, so a zero-ipd frame is
statistically — not bitwise — equivalent to `Scene.render`'s equirect
path, whose default is the R2 stratified lattice; see core/lds.py.)

Render settings are derived from `scene.settings` exactly as
`Scene._settings_for_render` does (max_bounces override, nudge_eps,
split_k with full deterministic branch-pattern enumeration), so a scene
tuned for `Scene.render` produces the same estimator here.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .core.compile import (compile_scene_cached, derive_max_bounces,
                           derive_split_k)
from .core.integrator import RenderSettings, trace
from .utils.colour import tonemap_display


def _ods_samples(key, data, origin0, phi0, half_ipd, eye_sign,
                 width, height, spp, static, settings, clamp=None,
                 sample0=None):
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
    # deterministic Fresnel branch patterns (RenderSettings.split_k): rays
    # are [sample, pixel]-ordered; callers keep spp a multiple of 2^split_k
    # so every pixel sees each pattern equally often (as Scene.render)
    pattern = None
    if settings.split_k > 0:
        s_loc = (idx // jnp.uint32(n_pix)).astype(jnp.int32)
        base = jnp.int32(0) if sample0 is None else sample0.astype(jnp.int32)
        pattern = (base + s_loc) % (1 << settings.split_k)
    L, _ = trace(k_trace, origin, d, n_re, n_im, data, static, settings,
                 pattern=pattern)
    if clamp is not None:
        L = jnp.minimum(L, clamp)   # per-sample firefly ceiling (traced)
    return L.reshape(spp, n_pix, 3).sum(axis=0)


_ods_chunk = partial(jax.jit, static_argnames=("width", "height", "spp",
                                               "static", "settings"))(
    _ods_samples)


@lru_cache(maxsize=32)
def _build_ods_sharded(static, settings, mesh, width, height, spp_chunk):
    """Compile a sample-sharded ODS eye render over `mesh` (cached).

    Same map-reduce shape as parallel/sharded.py: each device traces its
    own spp slice of the full frame, one psum over the "sample" axis sums
    the radiance (the multi-chip scale-out for production-size VR frames).
    `clamp` and `sample0` are traced arguments — retuning the firefly
    ceiling or walking the chunk loop never recompiles; the build itself is
    cached per (scene structure, settings, mesh, frame, chunk) key.
    """
    from jax.sharding import PartitionSpec as P

    def per_device(key, data, origin0, phi0, half_ipd, eye_sign, clamp,
                   sample0):
        s_idx = jax.lax.axis_index("sample")
        k = jax.random.fold_in(key, s_idx)
        L = _ods_samples(k, data, origin0, phi0, half_ipd, eye_sign,
                         width, height, spp_chunk, static, settings,
                         clamp=clamp, sample0=sample0)
        return jax.lax.psum(L, "sample")

    @jax.jit
    def run(key, data, origin0, phi0, half_ipd, eye_sign, clamp, sample0):
        return jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=P(), check_vma=False,
        )(key, data, origin0, phi0, half_ipd, eye_sign, clamp, sample0)

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
        When the scene uses deterministic Fresnel splitting (split_k > 0,
        auto-derived for Whitted-style scenes as in Scene.render), each
        camera sample fans into 2^split_k branch-pattern paths.
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
    # honor the scene's tuned settings exactly as Scene._settings_for_render
    # (a user-set nudge_eps / max_bounces / split_k must not silently revert
    # to defaults on the ODS path); sampler stays i.i.d. here (module doc)
    base = scene.settings
    max_b = base.max_bounces
    if max_b == RenderSettings.max_bounces:
        max_b = derive_max_bounces(static)
    settings = RenderSettings(max_bounces=max_b,
                              nudge_eps=base.nudge_eps,
                              sampler="iid",
                              split_k=base.split_k or derive_split_k(static))
    split_fan = 1 << settings.split_k
    # reference estimator parity: each camera sample fans into 2^split_k
    # deterministic branch patterns (Scene.render does the same)
    spp = spp * split_fan

    cam = scene.camera.params()
    fwd = np.asarray(cam.fwd)
    phi0 = jnp.float32(np.arctan2(fwd[2], fwd[0]))
    origin0 = jnp.asarray(cam.origin, jnp.float32)
    half_ipd = jnp.float32(float(ipd) / 2.0)

    if clamp is not None:
        clamp = jnp.float32(clamp)

    # chunk spp so one execution stays under the relay-friendly ray caps
    # (core/scene.py: 512k rays for clustered-mesh scenes, 4M otherwise;
    # the ODS path always runs the jnp wavefront); chunks cover whole
    # 2^split_k pattern blocks so enumerated branch weights average exactly
    max_rays = (1 << 19) if data.geom.tri_cl_lo.shape[0] else (1 << 22)

    run = None
    if mesh is not None:
        n_sample = mesh.shape["sample"]
        if mesh.shape.get("pixel", 1) != 1:
            raise ValueError("render_ods shards over the 'sample' axis "
                             "only; use a mesh with pixel=1")
        spp_dev = -(-spp // (n_sample * split_fan)) * split_fan
        spp = spp_dev * n_sample        # rounded up to whole shards/blocks
        # per-device chunk under the relay ray caps (each device traces
        # chunk x W x H rays per execution, exactly as the single-chip loop)
        chunk = max(1, min(spp_dev, 128, max_rays // (W * H)))
        chunk = max(split_fan, chunk - chunk % split_fan)
        run = _build_ods_sharded(static, settings, mesh, W, H, chunk)
        # the final partial chunk gets its own (smaller) cached executable
        rem = spp_dev % chunk
        run_rem = (_build_ods_sharded(static, settings, mesh, W, H, rem)
                   if rem else None)
    else:
        chunk = max(1, min(spp, 128, max_rays // (W * H)))
        chunk = max(split_fan, chunk - chunk % split_fan)

    inf = jnp.float32(np.inf)
    eyes = []
    for eye_sign in (-1.0, 1.0):
        if run is not None:
            # the SAME key per (chunk, eye-independent) index: correlated
            # grain; ipd=0 -> bit-identical eyes.  clamp/sample0 traced.
            acc = jnp.zeros((W * H, 3), jnp.float32)
            done = 0
            ci = 0
            while done < spp_dev:
                s = min(chunk, spp_dev - done)
                fn = run if s == chunk else run_rem
                key = jax.random.fold_in(jax.random.PRNGKey(seed), ci)
                acc = acc + fn(key, data, origin0, phi0, half_ipd,
                               jnp.float32(eye_sign),
                               clamp if clamp is not None else inf,
                               jnp.int32(done))
                done += s
                ci += 1
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
                                   settings, clamp, jnp.int32(done))
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
