"""Scene registry and the render entry point.

User-facing API matches the reference Scene (sightpy/scene.py:28-166):
add_Camera / add_PointLight / add_DirectionalLight / add / add_Background /
render / get_distances.  The execution model is completely different:

reference: per-sample numpy ray bundles farmed to a multiprocessing.Pool
           with a deep-copied scene per batch (scene.py:71-123).
here:      the scene lowers to flat device tables (core/compile.py); a single
           jit-compiled wavefront program traces spp-chunks of W*H rays and
           accumulates on-device.  Host<->device traffic per render is one
           scene upload and one (H, W, 3) image download.

Sample batching is chunked to bound HBM footprint; every chunk re-uses the
same XLA executable (chunk size is part of the jit static key).  Long renders
can checkpoint the linear accumulator + sample counter and resume
(SURVEY.md §5 — the reference has no checkpointing at all).
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import lights as lights_mod
from ..backgrounds.environment import Panorama, SkyBox
from ..utils.colour import (TONEMAP_OPERATORS, srgb_linear_to_srgb,
                            tonemap_display)
from ..utils.image_io import array_to_pil
from . import lds
from .camera import Camera, generate_rays, projection_mask
from .compile import compile_scene_cached, derive_max_bounces, derive_split_k
from .integrator import RenderSettings, trace, trace_distances
from .vec import as_complex3, as_float3

# default cap on rays per traced chunk (keeps wavefront state in HBM bounds)
MAX_RAYS_PER_CHUNK = 1 << 22


@partial(jax.jit, static_argnames=("static", "settings", "width", "height",
                                   "spp", "rows", "with_sq"))
def _render_chunk(key, data, cam, static, settings, width, height, spp,
                  row0=0.0, rows=None, with_sq=False, strat_seed=None,
                  sample0=None, clamp=None):
    """One spp-chunk via the jnp wavefront.  row0/rows select a horizontal
    row band of the frame (large-frame chunking); default is the full frame.
    with_sq additionally returns the per-pixel sum of squared samples (the
    variance estimate feeding the SVGF-style denoiser).  strat_seed/sample0
    continue one R2 lattice across chunks (core/lds.py); both traced.
    """
    rows = height if rows is None else rows
    k_ray, k_trace = jax.random.split(key)
    O, D = generate_rays(k_ray, cam, width, height, spp,
                         row0=jnp.float32(row0), rows=rows,
                         sampler=settings.sampler, strat_seed=strat_seed,
                         sample0=sample0, projection=settings.projection)
    n_re = jnp.broadcast_to(data.scene_n_re, O.shape)
    n_im = jnp.broadcast_to(data.scene_n_im, O.shape)
    # branch pattern per ray: rays are [sample, pixel]-ordered and spp is a
    # multiple of 2^split_k, so each pixel sees every pattern equally often
    pattern = None
    if settings.split_k > 0:
        n_pix = width * rows
        pattern = (jnp.arange(spp * n_pix, dtype=jnp.int32) // n_pix) \
            % (1 << settings.split_k)
    strat_u = None
    if settings.sampler == "r2" and strat_seed is not None \
            and sample0 is not None:
        strat_u = lds.first_bounce_uniforms(width, rows * width, spp,
                                            row0, strat_seed, sample0)
    L, stats = trace(k_trace, O, D, n_re, n_im, data, static, settings,
                     pattern=pattern, strat_u=strat_u)
    # scrub rare non-finite samples (grazing-angle degeneracies in f32) so a
    # one-in-10^7 ray cannot blacken a pixel; surfaced via stats
    finite = jnp.isfinite(L)
    if settings.collect_stats:
        stats["nonfinite_samples"] = jnp.sum(~finite) // 3
    L = jnp.where(finite, L, 0.0)
    if clamp is not None:
        L = jnp.minimum(L, clamp)   # per-sample firefly ceiling
    L = L.reshape(spp, rows * width, 3)
    if with_sq:
        return L.sum(axis=0), (L * L).sum(axis=0), stats
    return L.sum(axis=0), stats


@partial(jax.jit, static_argnames=("static", "settings", "width", "height",
                                   "spp", "interpret", "with_sq"))
def _render_chunk_pallas(key, data, cam, static, settings, width, height, spp,
                         interpret=False, with_sq=False, strat_seed=None,
                         sample0=None, clamp=None):
    """Chunk via the fused Pallas mega-kernel: camera ray generation and all
    bounces run inside one TPU kernel (ops/pallas_trace.py)."""
    from ..ops.pallas_trace import pallas_trace_chunk

    seed = jax.random.randint(key, (), 0, 2 ** 31 - 1, dtype=jnp.int32)
    if strat_seed is None:
        strat_seed = jax.random.randint(jax.random.fold_in(key, 1), (),
                                        0, 2 ** 31 - 1, dtype=jnp.int32)
    if sample0 is None:
        sample0 = jnp.int32(0)
    seed_vec = jnp.stack([seed, jnp.asarray(strat_seed, jnp.int32),
                          jnp.asarray(sample0, jnp.int32)])
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    L, rays = pallas_trace_chunk(seed_vec, data, cam_vec, static, width,
                                 height, spp, settings.max_bounces, interpret,
                                 settings.split_k, settings.sampler,
                                 settings.projection)
    finite = jnp.isfinite(L)
    stats = {}
    if settings.collect_stats:
        stats = {"rays_traced": rays, "nonfinite_samples": jnp.sum(~finite) // 3}
    L = jnp.where(finite, L, 0.0)
    if clamp is not None:
        L = jnp.minimum(L, clamp)   # per-sample firefly ceiling
    L = L.reshape(spp, height * width, 3)
    if with_sq:
        return L.sum(axis=0), (L * L).sum(axis=0), stats
    return L.sum(axis=0), stats


@partial(jax.jit, static_argnames=("static", "settings", "width", "height",
                                   "spp", "interpret", "with_sq"))
def _render_chunk_record(key, data, cam, static, settings, width, height, spp,
                         interpret=False, with_sq=False, strat_seed=None,
                         sample0=None, clamp=None):
    """Chunk via the path-recording kernel + texture replay
    (ops/pallas_record.py) — textured scenes."""
    from ..ops.pallas_record import pallas_record_chunk

    seed = jax.random.randint(key, (), 0, 2 ** 31 - 1, dtype=jnp.int32)
    if strat_seed is None:
        strat_seed = jax.random.randint(jax.random.fold_in(key, 1), (),
                                        0, 2 ** 31 - 1, dtype=jnp.int32)
    if sample0 is None:
        sample0 = jnp.int32(0)
    seed_vec = jnp.stack([seed, jnp.asarray(strat_seed, jnp.int32),
                          jnp.asarray(sample0, jnp.int32)])
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    L, rays = pallas_record_chunk(seed_vec, data, cam_vec, static, width,
                                  height, spp, settings.max_bounces,
                                  interpret, settings.split_k,
                                  settings.sampler, settings.projection)
    finite = jnp.isfinite(L)
    stats = {}
    if settings.collect_stats:
        stats = {"rays_traced": rays, "nonfinite_samples": jnp.sum(~finite) // 3}
    L = jnp.where(finite, L, 0.0)
    if clamp is not None:
        L = jnp.minimum(L, clamp)   # per-sample firefly ceiling
    L = L.reshape(spp, height * width, 3)
    if with_sq:
        return L.sum(axis=0), (L * L).sum(axis=0), stats
    return L.sum(axis=0), stats


def _use_pallas(static, settings):
    """Returns (mode, interpret): mode in {None, 'solid', 'record'}."""
    if settings.use_pallas == "never":
        return None, False
    mode = ("solid" if static.pallas_ok
            else "record" if static.pallas_tex_ok else None)
    if mode is None:
        return None, False
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if settings.use_pallas == "always":
        return mode, not on_tpu     # interpret mode off-TPU (tests)
    return (mode if on_tpu else None), False


@partial(jax.jit, static_argnames=("width", "height", "projection"))
def _distances_chunk(key, data, cam, width, height, projection="pinhole"):
    O, D = generate_rays(key, cam, width, height, 1, projection=projection)
    return trace_distances(O, D, data)


@partial(jax.jit, static_argnames=("width", "height", "operator"))
def _tonemap(acc, n_samples, width, height, operator="srgb",
             exposure_scale=1.0):
    linear = acc / n_samples
    return tonemap_display(linear, operator, exposure_scale).reshape(
        height, width, 3)


@jax.jit
def _noise_q99(acc, acc2, k, chunk, pmask=None):
    """Estimated display-space noise after k chunks of `chunk` samples each.

    Treats each chunk's per-pixel mean radiance m_i = L_i / chunk as one
    observation; the standard error of the running mean M = mean(m_i) over k
    chunks is s/sqrt(k) with s the sample std-dev of the m_i.  The noise
    magnitude is mapped to DISPLAY space — |srgb(M + SE) - srgb(M)|, worst
    channel — so a single threshold means the same visible grain in shadows
    and highlights (the sRGB EOTF expands shadows ~12.9x).  Returns the 99th
    percentile over pixels: "all but 1% of pixels are visually converged".
    """
    M = acc / (k * chunk)
    var = jnp.maximum(acc2 / k - M * M, 0.0) * (k / jnp.maximum(k - 1.0, 1.0))
    se = jnp.sqrt(var / k)
    e = jnp.abs(srgb_linear_to_srgb(M + se) - srgb_linear_to_srgb(M))
    e = e.max(axis=-1)
    if pmask is not None:
        # fisheye: judge convergence on VISIBLE pixels only — the traced
        # content outside the image circle is zeroed at output and must not
        # burn spp budget (nanquantile skips the masked entries)
        return jnp.nanquantile(jnp.where(pmask > 0, e, jnp.nan), 0.99)
    return jnp.quantile(e, 0.99)


class Scene:
    def __init__(self, ambient_color=(0.01, 0.01, 0.01), n=(1.0, 1.0, 1.0)):
        self.scene_primitives = []
        self.Light_list = []
        self.importance_sampled_list = []
        self.ambient_color = as_float3(ambient_color, "ambient_color")
        self.n = as_complex3(n, "n")
        self.camera = None
        self.settings = RenderSettings()

    # -- construction API (reference scene.py:41-69) -----------------------
    def add_Camera(self, look_from, look_at, **kwargs):
        self.camera = Camera(look_from, look_at, **kwargs)

    def add_PointLight(self, pos, color):
        self.Light_list.append(lights_mod.PointLight(pos, color))

    def add_DirectionalLight(self, Ldir, color):
        self.Light_list.append(lights_mod.DirectionalLight(Ldir, color))

    def add_SpotLight(self, pos, direction, color, angle=30.0,
                      inner_angle=None):
        self.Light_list.append(
            lights_mod.SpotLight(pos, direction, color, angle=angle,
                                 inner_angle=inner_angle))

    def add(self, primitive, importance_sampled=False):
        self.scene_primitives.append(primitive)
        if importance_sampled:
            self.importance_sampled_list.append(primitive)

    def add_Background(self, img, light_intensity=0.0, blur=0.0,
                       spherical=False, importance_sampled=False,
                       linear=False):
        cls = Panorama if spherical else SkyBox
        self.scene_primitives.append(
            cls(img, light_intensity=light_intensity, blur=blur,
                importance_sampled=importance_sampled, linear=linear))

    # -- rendering ---------------------------------------------------------
    def _diffuse_fan(self):
        """Max `diffuse_rays` over the scene's Diffuse materials (1 if none).

        The reference traces `diffuse_rays` first-bounce continuations per
        diffuse hit and averages (diffuse.py:34-83).  The wavefront integrator
        carries ONE continuation per path, so render() folds the fan into the
        effective samples-per-pixel instead: spp * fan full paths are traced
        and averaged — the same total sample count and an unbiased estimator
        of the same integral (slightly lower variance, since the camera/
        specular prefix is re-sampled too).  Kept out of the jit static key:
        changing diffuse_rays never recompiles.
        """
        from ..materials.base import MAT_DIFFUSE

        fans = [p.material.diffuse_rays for p in self.scene_primitives
                if getattr(p, "material", None) is not None
                and p.material.mat_type == MAT_DIFFUSE]
        return max(fans or [1])

    def _settings_for_render(self, collect_stats):
        static, data = compile_scene_cached(self)
        max_b = self.settings.max_bounces
        if max_b == RenderSettings.max_bounces:
            # shared derivation (also used by render_sharded / get_raycolor)
            max_b = derive_max_bounces(static)
        split_k = self.settings.split_k or derive_split_k(static)
        settings = RenderSettings(max_bounces=max_b,
                                  nudge_eps=self.settings.nudge_eps,
                                  collect_stats=collect_stats,
                                  use_pallas=self.settings.use_pallas,
                                  sampler=self.settings.sampler,
                                  projection=self.camera.projection,
                                  split_k=split_k)
        return static, data, settings

    def render(self, samples_per_pixel, progress_bar=False, batch_size=None,
               seed=0, return_stats=False, checkpoint_path=None,
               checkpoint_every=4, profile_dir=None, target_noise=None,
               noise_check_every=4, output="pil", with_variance=False,
               clamp=None, tonemap="srgb", exposure=0.0,
               preview_path=None, preview_every=4, mesh=None):
        """Render and return a PIL image (reference scene.py:71-140).

        output: "pil" (default, tonemapped PIL image) or "linear" (the raw
        (H, W, 3) float32 linear-radiance mean — what a denoiser or custom
        tonemapper wants; see render_denoised / raytracer_tpu.denoise).

        with_variance (requires output="linear"): also return the per-pixel
        variance OF THE MEAN, estimated from the sample population — the
        confidence signal the variance-guided denoiser consumes.  Return
        order becomes (linear, variance[, stats]).  Under the default
        stratified sampler this is the i.i.d.-equivalent variance, an UPPER
        BOUND on the true error of the stratified mean (stratified samples
        converge faster than their population scatter suggests); exact for
        sampler="iid".  Conservative is the right direction for its
        consumers (the SVGF weight filters converged pixels a bit more than
        strictly needed, never less).

        clamp: optional per-sample linear-radiance ceiling (firefly
        suppression).  Each SAMPLE is clamped channelwise before
        accumulation, so a one-in-a-million caustic spike cannot blow out a
        pixel that the denoiser would then smear.  Introduces the standard
        downward bias where it engages — pick a value well above the
        brightest legitimate surface (lights are exempt de facto: their
        radiance is per-sample exact).  Traced: retuning never recompiles.

        samples_per_pixel follows reference semantics: camera samples, each
        of which fans into the scene's `diffuse_rays` paths when a Diffuse
        material exists (see _diffuse_fan) — spp * fan paths are traced.

        batch_size: effective samples per traced chunk (defaults to an
        HBM-bounded choice).  If the total does not divide evenly, full
        chunks are traced and the extra samples are folded into the average
        (never fewer than requested — unlike the reference, whose
        partial-batch accumulation is broken, scene.py:103-116).

        target_noise: adaptive sampling — stop early once the estimated
        display-space noise (99th-percentile per-pixel standard error mapped
        through the sRGB EOTF, see _noise_q99) drops to this value;
        samples_per_pixel then acts as the BUDGET CAP.  0.01 ≈ ±2.5/255 on
        99% of pixels.  Convergence is checked every `noise_check_every`
        chunks (each check is one device->host scalar sync).  The reference
        has no render-to-quality mode — spp is pure guesswork there.

        profile_dir: capture a jax.profiler device trace of the render into
        this directory (view with TensorBoard / xprof).  The reference's only
        instrumentation is a wall-clock print (SURVEY.md §5).

        preview_path: progressive preview — every `preview_every` chunks
        (and on the last), tonemap the accumulator so far and write it to
        this PNG path, making long renders watchable as they refine.  Each
        write is one device->host sync; previews honor tonemap/exposure,
        and the final preview is bit-identical to the returned image.

        tonemap / exposure: display mapping for output="pil".  tonemap is
        "srgb" (default — the reference pipeline, sRGB EOTF + highlight-
        preserving intensity clip), "aces" (Narkowicz filmic fit) or
        "reinhard" (extended Reinhard); exposure is in stops (the linear
        radiance is scaled by 2**exposure before the operator).  The
        defaults are bit-identical to the original pipeline.
        output="linear" always returns the raw radiance mean — apply
        utils.colour.tonemap_display yourself.

        mesh: an optional jax.sharding.Mesh with a "sample" axis (and an
        optional "pixel" axis — `parallel.sharded.make_mesh()`): every chunk
        of the loop above runs as ONE sharded execution over the mesh —
        each device traces its own sample slice (and pixel band), one psum
        over the "sample" axis reduces the radiance.  All of the features
        documented here (chunked executions under the relay caps, checkpoint
        /resume, adaptive target_noise, clamp, with_variance, preview) work
        unchanged across the mesh; checkpoints record the mesh shape and
        resume bit-identically on an equal mesh.  batch_size becomes the
        PER-DEVICE chunk spp.  The reference's analogue is the Pool's batch
        loop (scene.py:80-116), whose whole job was bounding batch size.
        """
        if profile_dir is not None:
            from jax import profiler as _profiler

            with _profiler.trace(str(profile_dir)):
                return self.render(samples_per_pixel, progress_bar, batch_size,
                                   seed, return_stats, checkpoint_path,
                                   checkpoint_every, None, target_noise,
                                   noise_check_every, output, with_variance,
                                   clamp, tonemap, exposure,
                                   preview_path, preview_every, mesh)
        if output not in ("pil", "linear"):
            raise ValueError(f"output must be 'pil' or 'linear', got {output!r}")
        if tonemap not in TONEMAP_OPERATORS:
            raise ValueError(
                f"tonemap must be one of {TONEMAP_OPERATORS}, got {tonemap!r}")
        if preview_path is not None and preview_every < 1:
            raise ValueError(f"preview_every must be >= 1, got {preview_every}")
        if with_variance and output != "linear":
            raise ValueError("with_variance requires output='linear'")
        if with_variance and checkpoint_path is not None:
            raise ValueError("with_variance does not support checkpointing")
        if self.camera is None:
            raise RuntimeError("call add_Camera() first")
        if samples_per_pixel < 1:
            raise ValueError("samples_per_pixel must be >= 1")
        t0 = time.time()
        W, H = self.camera.screen_width, self.camera.screen_height
        static, data, settings = self._settings_for_render(return_stats)
        cam = self.camera.params()

        # reference estimator parity: each camera sample fans into
        # `diffuse_rays` paths at the first diffuse hit (diffuse.py:34-83)
        # and into 2^split_k deterministic Fresnel branch patterns
        # (refractive.py:102-110); both multiply the paths traced
        split_fan = 1 << settings.split_k
        eff_spp = samples_per_pixel * self._diffuse_fan() * split_fan
        max_rays = MAX_RAYS_PER_CHUNK
        if static.pallas_tex_ok:
            # record+replay chunks run ~0.6 s at 4M rays — long enough for
            # the relay dispatch stall (see below).  1M-ray chunks measured
            # fastest on example4: 2.55 s -> 2.18 s @ 16 spp (knee at ~1M;
            # 0.5M and 0.25M identical).  The solid mega-kernel path keeps
            # full chunks (13 ms per execution — no stall regime).
            #
            # A 2M cap for single-round B=6 scenes looked 12% faster in a
            # bare chunk-loop probe (example3 1187 -> 1059 ms,
            # scripts/probe_chunk_cap.py) but measured SLOWER through this
            # production loop (1.409 vs 1.378 s, interleaved in-process
            # A/B, TPU v5e 2026-08-20) — the per-chunk accumulate/sync
            # structure eats the dispatch-gap saving.  Not widened.
            max_rays = 1 << 20
            # the cap is tuned through the axon relay (the stall is a relay
            # artifact) — override to re-measure on direct-attached TPUs
            # (scripts/probe_chunk_cap.py is the A/B template)
            env_cap = os.environ.get("RAYTPU_RECORD_CHUNK_RAYS")
            if env_cap:
                max_rays = int(env_cap)
        if data.geom.tri_cl_lo.shape[0]:
            # clustered-sweep scenes: ~4M-ray chunks measured 5.7x SLOWER
            # than the same work in ~0.5M-ray chunks (46k tris, 32 spp:
            # 103 s one-chunk vs 18 s chunked).  xprof shows IDENTICAL
            # device op totals for both — the gap is all idle/dispatch:
            # the axon relay stalls on long single executions.  The cap
            # keeps each execution short; lift it on direct-attached TPUs.
            max_rays = 1 << 19
        # cap chunk SPP as well as chunk rays: the ray-count bound alone
        # picks 419-spp chunks for a 100x100 frame, and the Pallas paths'
        # grids parallelize over pixel tiles with spp looped inside — few
        # tiles x long serial loops ran the reference's own Cornell config
        # (100x100 @ 100 spp) in 14.2 s vs 0.6-0.9 s at 26-128-spp chunks.
        # 128 leaves every large-frame choice AND every small test render
        # (eff_spp <= 128 stays one chunk, so per-chunk RNG streams and the
        # checked-in goldens are unchanged) as they were.
        n_sample = n_pixel = 1
        chunk_dev = None
        if mesh is not None:
            if "sample" not in mesh.shape:
                raise ValueError("mesh must have a 'sample' axis "
                                 "(parallel.sharded.make_mesh)")
            n_sample = mesh.shape["sample"]
            n_pixel = mesh.shape.get("pixel", 1)
            if H % n_pixel:
                raise ValueError(
                    f"height {H} % pixel shards {n_pixel} != 0")
            # per-DEVICE chunk spp under the same relay/HBM ray caps (each
            # device traces chunk_dev x W x band rows per execution)
            rows_dev = H // n_pixel
            eff_dev = -(-eff_spp // n_sample)
            chunk_dev = batch_size or max(
                1, min(eff_dev, 128, max_rays // (W * rows_dev)))
            chunk_dev = max(split_fan, chunk_dev - chunk_dev % split_fan)
            chunk = chunk_dev * n_sample    # global samples per execution
            n_chunks = -(-eff_dev // chunk_dev)
        else:
            chunk = batch_size or max(1, min(eff_spp, 128,
                                             max_rays // (W * H)))
            # every chunk must cover whole pattern blocks, or the enumerated
            # branch weights (2F / 2T) would not average back to F + T
            chunk = max(split_fan, chunk - chunk % split_fan)
            n_chunks = -(-eff_spp // chunk)

        adaptive = target_noise is not None
        if adaptive and n_chunks < 2:
            adaptive = False    # need >= 2 chunks to estimate variance
        base_key = jax.random.PRNGKey(seed)
        acc = jnp.zeros((H * W, 3), jnp.float32)
        # second moment of per-chunk means, for the adaptive noise estimate
        acc2 = jnp.zeros((H * W, 3), jnp.float32) if adaptive else None
        # sum of squared SAMPLES, for the per-pixel variance output
        acc_ss = jnp.zeros((H * W, 3), jnp.float32) if with_variance else None
        start_chunk = 0
        # device-side accumulator: a host int() here would force a (slow)
        # device->host sync every chunk.  float32: the total exceeds int32
        # (Cornell 256 spp x fan 20 traces ~4e9 rays); per-chunk counts stay
        # int32-safe and the f32 rounding is irrelevant for a rate metric
        rays_acc = jnp.zeros((), jnp.float32)

        if checkpoint_path is not None:
            loaded = _load_checkpoint(checkpoint_path, H * W, chunk, seed,
                                      with_acc2=adaptive, clamp=clamp,
                                      shards=(n_sample, n_pixel))
            if loaded is not None:
                acc, start_chunk, loaded_acc2 = loaded
                if adaptive:
                    acc2 = loaded_acc2

        run_sharded = None
        if mesh is not None:
            from ..parallel.sharded import build_sharded_chunk

            run_sharded = build_sharded_chunk(static, settings, mesh, W, H,
                                              chunk_dev, with_variance)
            pallas_mode, pallas_interp = None, False
            n_bands, band_rows = 1, H   # pixel axis IS the banding
        else:
            pallas_mode, pallas_interp = _use_pallas(static, settings)
            # Large frames: when even a 1-spp chunk exceeds the ray cap (a 4K
            # frame is 8.8M rays), split each chunk into horizontal row bands.
            # The mega-kernel's per-ray footprint is tiny (paths never leave
            # VMEM), so the solid path keeps full frames; the jnp wavefront's
            # HBM state and the record path's per-bounce tables are what the
            # cap protects, so those band (record falls back to the banded
            # wavefront — its chunk cap is 1M rays and its record tables
            # scale with rays).
            band_rows = H
            if pallas_mode != "solid" and W * H * chunk > max_rays:
                if pallas_mode == "record":
                    pallas_mode = None
                band_rows = max(1, max_rays // (W * chunk))
            n_bands = -(-H // band_rows)
        if progress_bar:
            print("Rendering...")
        chunks_done = start_chunk
        last_noise = None
        # R2 lattice state: rotations keyed once per render (constant across
        # chunks), sample0 advances so chunk i continues the lattice.
        # Under ADAPTIVE sampling the continued lattice correlates chunk
        # means through the shared rotation, so the chunk-scatter noise
        # estimate is conservative (stops at-or-below the target, never
        # above); re-rotating per chunk would make the estimate exact but
        # break the fixed-spp bit-identity invariant and give up cross-chunk
        # stratification — measured not worth it.
        strat_seed = jax.random.randint(base_key, (), 0, 2 ** 31 - 1,
                                        dtype=jnp.int32)
        clampv = None if clamp is None else jnp.float32(clamp)
        # circular-fisheye frames: pixels outside the image circle are
        # masked at output time (the accumulator and checkpoints stay
        # unmasked, so resume math is projection-agnostic)
        pmask = projection_mask(settings.projection, W, H)
        for i in range(start_chunk, n_chunks):
            k_i = jax.random.fold_in(base_key, i)
            s0 = jnp.int32(i * chunk)
            L2 = None
            if run_sharded is not None:
                out_c = run_sharded(
                    k_i, data, cam,
                    clampv if clampv is not None else jnp.float32(np.inf),
                    s0, strat_seed)
            elif pallas_mode == "solid":
                out_c = _render_chunk_pallas(k_i, data, cam, static,
                                             settings, W, H, chunk,
                                             pallas_interp, with_variance,
                                             strat_seed=strat_seed,
                                             sample0=s0, clamp=clampv)
            elif pallas_mode == "record":
                out_c = _render_chunk_record(k_i, data, cam, static,
                                             settings, W, H, chunk,
                                             pallas_interp, with_variance,
                                             strat_seed=strat_seed,
                                             sample0=s0, clamp=clampv)
            elif n_bands == 1:
                out_c = _render_chunk(k_i, data, cam, static, settings,
                                      W, H, chunk, with_sq=with_variance,
                                      strat_seed=strat_seed, sample0=s0,
                                      clamp=clampv)
            else:
                parts, parts2, stats = [], [], {}
                for b in range(n_bands):
                    r0 = b * band_rows
                    rb = min(band_rows, H - r0)
                    ob = _render_chunk(jax.random.fold_in(k_i, b), data,
                                       cam, static, settings, W, H,
                                       chunk, row0=float(r0), rows=rb,
                                       with_sq=with_variance,
                                       strat_seed=strat_seed, sample0=s0,
                                       clamp=clampv)
                    if with_variance:
                        Lb, L2b, sb = ob
                        parts2.append(L2b)
                    else:
                        Lb, sb = ob
                    parts.append(Lb)
                    stats = sb if not stats else {
                        k: stats[k] + sb[k] for k in stats}
                L = jnp.concatenate(parts, axis=0)
                if with_variance:
                    L2 = jnp.concatenate(parts2, axis=0)
                out_c = None
            if out_c is not None:
                if with_variance:
                    L, L2, stats = out_c
                else:
                    L, stats = out_c
            acc = acc + L
            if with_variance:
                acc_ss = acc_ss + L2
            if adaptive:
                m = L / chunk
                acc2 = acc2 + m * m
            if return_stats:
                rays_acc = rays_acc + stats["rays_traced"].astype(jnp.float32)
            if progress_bar:
                acc.block_until_ready()
                print(f"  chunk {i + 1}/{n_chunks} "
                      f"({(i + 1) * chunk} samples) {time.time() - t0:.2f}s",
                      flush=True)
            if checkpoint_path is not None and (
                    (i + 1) % checkpoint_every == 0 or i + 1 == n_chunks):
                # each save is a device->host sync; amortize over N chunks
                _save_checkpoint(checkpoint_path, acc, i + 1, chunk, seed,
                                 acc2=acc2, clamp=clamp,
                                 shards=(n_sample, n_pixel))
            if preview_path is not None and i + 1 < n_chunks and (
                    (i + 1) % preview_every == 0):
                pacc = acc if pmask is None else acc * pmask[:, None]
                pim = np.asarray(_tonemap(pacc, float((i + 1) * chunk), W, H,
                                          tonemap,
                                          jnp.float32(2.0 ** exposure)))
                array_to_pil(pim).save(preview_path)
            chunks_done = i + 1
            if adaptive and chunks_done >= 2 and (
                    chunks_done % noise_check_every == 0
                    or chunks_done == n_chunks):
                last_noise = float(_noise_q99(acc, acc2, float(chunks_done),
                                              float(chunk), pmask))
                if progress_bar:
                    print(f"  noise q99 {last_noise:.4f} "
                          f"(target {target_noise})", flush=True)
                if last_noise <= target_noise:
                    break

        n_samples = chunks_done * chunk if adaptive else n_chunks * chunk
        if pmask is not None:
            acc = acc * pmask[:, None]
            if with_variance:
                acc_ss = acc_ss * pmask[:, None]
        variance = None
        if output == "linear":
            pil = (np.asarray(acc, dtype=np.float32) / n_samples
                   ).reshape(H, W, 3)
            if with_variance:
                # unbiased sample variance / n = variance of the mean
                ss = np.asarray(acc_ss, np.float32).reshape(H, W, 3)
                s2 = np.maximum(ss / n_samples - pil * pil, 0.0)
                if n_samples > 1:
                    s2 *= n_samples / (n_samples - 1.0)
                variance = s2 / n_samples
            dt = time.time() - t0
        else:
            img = np.asarray(_tonemap(acc, float(n_samples), W, H, tonemap,
                                      jnp.float32(2.0 ** exposure)))
            dt = time.time() - t0
            pil = array_to_pil(img)
        if preview_path is not None:
            # final preview: bit-identical to the returned image
            if output == "pil":
                pil.save(preview_path)
            else:
                pim = np.asarray(_tonemap(acc, float(n_samples), W, H,
                                          tonemap,
                                          jnp.float32(2.0 ** exposure)))
                array_to_pil(pim).save(preview_path)
        if progress_bar:
            print("Render Took", dt)
        ret = (pil, variance) if with_variance else (pil,)
        if return_stats:
            rays = int(rays_acc)
            total_stats = dict(
                rays_traced=rays, wall_s=dt, samples=n_samples, width=W,
                height=H, mrays_per_s=rays / dt / 1e6 if dt > 0 else 0.0)
            if adaptive:
                total_stats["noise_q99"] = last_noise
            ret = ret + (total_stats,)
        return ret if len(ret) > 1 else ret[0]

    def render_array(self, samples_per_pixel, **kwargs):
        """Like render() but returns the float (H, W, 3) sRGB array."""
        out = self.render(samples_per_pixel, **kwargs)
        if isinstance(out, tuple):
            return np.asarray(out[0], dtype=np.float32) / 255.0, out[1]
        return np.asarray(out, dtype=np.float32) / 255.0

    def render_environment(self, width=512, height=256, samples_per_pixel=16,
                           center=(0.0, 0.0, 0.0), seed=0, **render_kwargs):
        """Bake this scene into an equirect environment map.

        Renders a full 360x180 panorama from `center` through the equirect
        camera (core/camera.py) and returns a LINEAR float32 (height, width,
        3) array in the STORAGE convention of the environment fetch — the
        result plugs straight into another scene:

            env = scene_a.render_environment(center=(0, 1, 0))
            scene_b.add_Background(env, spherical=True, linear=True)

        and directions through scene_b's background then see exactly the
        radiance scene_a showed from `center` (up to texel resolution).
        The reference cannot render panoramas at all — its camera is
        pinhole-only (camera.py:8-49)."""
        saved = self.camera
        c = np.asarray(as_float3(center, "center"), np.float64)
        try:
            # look_at = center + x: the equirect camera's phi0 becomes 0, so
            # image u equals the env fetch's azimuth u with no offset
            self.camera = Camera(look_from=c, look_at=c + [1.0, 0.0, 0.0],
                                 screen_width=width, screen_height=height,
                                 projection="equirect")
            img = np.asarray(self.render(samples_per_pixel, seed=seed,
                                         output="linear", **render_kwargs),
                             np.float32)
        finally:
            self.camera = saved
        # camera rows run zenith -> nadir; the fetch indexes storage row
        # (-iv) mod H for display v-index iv (materials/shade.py
        # fetch_texture), so permute display rows into storage order
        store = np.empty_like(img)
        store[(-np.arange(height)) % height] = img[::-1]
        return store

    def render_aovs(self, samples_per_pixel=1, seed=0, ao_samples=0,
                    ao_radius=None, mesh=None):
        """First-hit feature planes (depth/normal/albedo/position/coverage/
        obj_id, plus ambient occlusion with ao_samples > 0) for denoising
        and debugging — see core/aov.py.  The reference's only diagnostic
        is the depth map (scene.py:142-166).  mesh: optional device mesh —
        planes shard over samples and pixel bands (core/aov.py)."""
        from .aov import render_aovs

        return render_aovs(self, samples_per_pixel, seed,
                           ao_samples=ao_samples, ao_radius=ao_radius,
                           mesh=mesh)

    def render_denoised(self, samples_per_pixel, seed=0, aov_samples=None,
                        output="pil", variance_guided=True, clamp=None,
                        mesh=None, **denoise_kwargs):
        """Render at low spp, then reconstruct with the à-trous denoiser
        (raytracer_tpu.denoise) guided by this scene's AOV feature planes.

        aov_samples: spp for the (cheap, first-hit-only) feature pass;
        defaults to min(16, max(4, samples_per_pixel)).  denoise_kwargs are
        forwarded to `denoise()` (iterations / sigma_* / demodulate_albedo).
        output: "pil" (tonemapped) or "linear" (float (H, W, 3) array).
        variance_guided: estimate per-pixel sample variance during the render
        and use the SVGF-style luminance weight (denoise.py) — converged
        pixels keep detail, noisy ones filter hard.  Needs >= 2 samples;
        falls back to the fixed-sigma weight at spp*fan == 1.
        clamp: forwarded to render() — firefly suppression before the
        filter ever sees the samples (see render()).
        mesh: forwarded to render() AND render_aovs() — both the radiance
        and the feature passes shard over the device mesh.
        """
        from ..denoise import denoise

        variance = None
        if variance_guided and samples_per_pixel * self._diffuse_fan() > 1:
            linear, variance = self.render(samples_per_pixel, seed=seed,
                                           output="linear",
                                           with_variance=True, clamp=clamp,
                                           mesh=mesh)
        else:
            linear = self.render(samples_per_pixel, seed=seed,
                                 output="linear", clamp=clamp, mesh=mesh)
        aovs = self.render_aovs(
            aov_samples or min(16, max(4, samples_per_pixel)), seed=seed + 1,
            mesh=mesh)
        out = denoise(linear, aovs, variance=variance, **denoise_kwargs)
        if output == "linear":
            return out
        img = np.asarray(srgb_linear_to_srgb(jnp.asarray(out)))
        return array_to_pil(img)

    def get_distances(self, seed=0):
        """Depth AOV debug render (reference scene.py:142-166)."""
        if self.camera is None:
            raise RuntimeError("call add_Camera() first")
        W, H = self.camera.screen_width, self.camera.screen_height
        _, data = compile_scene_cached(self)
        grey = _distances_chunk(jax.random.PRNGKey(seed), data,
                                self.camera.params(), W, H,
                                projection=self.camera.projection)
        img = np.asarray(grey).reshape(H, W, 3)
        return array_to_pil(img)

    def render_ods(self, samples_per_pixel=8, **kwargs):
        """Stereo 360 (omni-directional stereo) frame for VR playback —
        see raytracer_tpu.vr.render_ods for the kwargs (ipd, layout,
        output, mesh, clamp, ...)."""
        from ..vr import render_ods

        return render_ods(self, samples_per_pixel, **kwargs)


def _ckpt_path(path):
    # np.savez appends '.npz' to bare names; normalize so save and load
    # agree (a bare-name checkpoint used to silently never resume)
    p = str(path)
    return p if p.endswith(".npz") else p + ".npz"


def _save_checkpoint(path, acc, chunks_done, chunk, seed, acc2=None,
                     clamp=None, shards=(1, 1)):
    extra = {} if acc2 is None else {"acc2": np.asarray(acc2)}
    with open(_ckpt_path(path), "wb") as f:
        np.savez(f, acc=np.asarray(acc), chunks_done=chunks_done,
                 chunk=chunk, seed=seed,
                 clamp=np.float64(np.nan if clamp is None else clamp),
                 shards=np.asarray(shards, np.int64), **extra)


def _load_checkpoint(path, n_pix, chunk, seed, with_acc2=False, clamp=None,
                     shards=(1, 1)):
    import os
    path = _ckpt_path(path)
    if not os.path.exists(path):
        return None
    z = np.load(path)
    if int(z["chunk"]) != chunk or int(z["seed"]) != seed or z["acc"].shape[0] != n_pix:
        return None
    # a checkpoint written on a different mesh shape carries different
    # per-device RNG/lattice streams; resuming it would silently mix two
    # sample sequences in one accumulator — restart instead (pre-mesh
    # checkpoints lack the field and mean single-chip)
    old_shards = (tuple(int(s) for s in z["shards"])
                  if "shards" in z.files else (1, 1))
    if old_shards != tuple(shards):
        return None
    # a resume under a different clamp would mix two estimators in one
    # accumulator; restart instead (pre-clamp checkpoints lack the field —
    # treat them as clamp=None)
    old_clamp = float(z["clamp"]) if "clamp" in z.files else float("nan")
    new_clamp = float("nan") if clamp is None else float(clamp)
    if not (old_clamp == new_clamp or (np.isnan(old_clamp)
                                       and np.isnan(new_clamp))):
        return None
    if with_acc2 and "acc2" not in z.files:
        return None     # adaptive resume needs the second moment
    acc2 = jnp.asarray(z["acc2"]) if with_acc2 else None
    return jnp.asarray(z["acc"]), int(z["chunks_done"]), acc2
