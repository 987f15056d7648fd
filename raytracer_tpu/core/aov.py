"""Arbitrary-output-variable (AOV) rendering: denoiser-ready feature planes.

The reference's only diagnostic output is the normalized depth map of
`Scene.get_distances` (sightpy/scene.py:142-166).  This module generalizes it
into the standard feature set consumed by image-space denoisers and debugging
tools: first-hit depth, oriented shading normals, surface albedo, object ids
and hit coverage — all produced by ONE compiled first-hit pass that reuses the
integrator's intersection and attribute kernels (no second geometry codepath
to keep in sync).

Everything is fixed-shape and jit-compiled; samples-per-pixel > 1 gives
anti-aliased (box-filtered) feature planes using the camera's AA jitter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..materials import shade
from ..materials.base import (MAT_CUSTOM, MAT_DIFFUSE, MAT_EMISSIVE, MAT_ENV,
                              MAT_GLOSSY, MAT_REFRACTIVE, MAT_THINFILM)
from ..utils.constants import MISS_THRESHOLD
from .camera import generate_rays
from .compile import PACKED_SLOT_SHIFT
from .ray import _first_hit_impl


def _albedo_at_hit(mat_type, mat_slot, uv, data, static):
    """Base surface color per ray, dispatched over the material types present.

    Conventions (matching what a denoiser wants as the albedo modulator):
    diffuse/glossy/emissive -> their texture-or-solid base color (the same
    `_slot_color` fetch the shaders use); refractive/thin-film -> white
    (specular transport carries no base color of its own); environment ->
    the background texture (no lightmap term: AOVs are primary-hit only);
    custom materials -> white (their shading is an opaque user hook).
    """
    n = mat_slot.shape[0]
    alb = jnp.ones((n, 3), jnp.float32)
    mats, textures = data.mats, data.textures
    for mt in static.mat_types_present:
        if mt == MAT_DIFFUSE:
            c = shade._slot_color(mats.diffuse_color, mat_slot, uv,
                                  static.diffuse_tex, textures)
        elif mt == MAT_GLOSSY:
            c = shade._slot_color(mats.glossy_color, mat_slot, uv,
                                  static.glossy_tex, textures)
        elif mt == MAT_EMISSIVE:
            c = shade._slot_color(mats.emissive_color, mat_slot, uv,
                                  static.emissive_tex, textures)
        elif mt == MAT_ENV:
            c = jnp.zeros((n, 3), jnp.float32)
            for env in static.env_slots:
                ce = shade.fetch_texture(textures[env.tex], uv, 1.0)
                c = jnp.where((mat_slot == env.slot)[..., None], ce, c)
        elif mt in (MAT_REFRACTIVE, MAT_THINFILM, MAT_CUSTOM):
            continue    # keep the white default
        else:
            continue
        alb = jnp.where((mat_type == mt)[..., None], c, alb)
    return alb


@partial(jax.jit, static_argnames=("static", "width", "height", "spp",
                                   "projection", "rows"))
def _aov_chunk(key, data, cam, static, width, height, spp,
               projection="pinhole", row0=0.0, rows=None):
    rows = height if rows is None else rows
    O, D = generate_rays(key, cam, width, height, spp, projection=projection,
                         row0=jnp.float32(row0), rows=rows)
    t, orient, P, N_geo, uv, obj = _first_hit_impl(O, D, data, static)
    hit = t < MISS_THRESHOLD
    h1 = hit[..., None]

    packed = jnp.take(data.obj.packed, obj, mode="clip")
    mat_type = packed & 0x7
    mat_slot = (packed >> PACKED_SLOT_SHIFT) & 0x3FF

    # oriented normals (flipped toward the ray side, like the integrator's
    # shading normal before normal mapping)
    N_out = jnp.where(h1, N_geo * orient[..., None], 0.0)
    alb = jnp.where(h1, _albedo_at_hit(mat_type, mat_slot, uv, data, static),
                    0.0)
    depth = jnp.where(hit, t, 0.0)

    # emission sources: their radiance is exact (no MC noise), so denoisers
    # freeze them (raytracer_tpu/denoise.py) — and their AOV "albedo" is the
    # emission color, which can exceed 1 arbitrarily
    is_src = (mat_type == MAT_EMISSIVE) | (mat_type == MAT_ENV)

    n_pix = rows * width
    sum_pix = lambda x: x.reshape((spp, n_pix) + x.shape[1:]).sum(axis=0)
    first = lambda x: x.reshape((spp, n_pix) + x.shape[1:])[0]
    return dict(
        depth=sum_pix(depth),
        normal=sum_pix(N_out),
        albedo=sum_pix(alb),
        coverage=sum_pix(hit.astype(jnp.float32)),
        obj_id=first(jnp.where(hit, obj, -1)),
        position=sum_pix(jnp.where(h1, P, 0.0)),
        emissive=sum_pix((is_src & hit).astype(jnp.float32)),
    )


@partial(jax.jit, static_argnames=("static", "width", "height", "spp",
                                   "ao_samples", "projection", "rows"))
def _ao_chunk(key, data, cam, static, width, height, spp, ao_samples,
              ao_dist, projection="pinhole", row0=0.0, rows=None):
    """Ambient-occlusion plane: per first hit, the fraction of `ao_samples`
    cosine-weighted hemisphere directions NOT blocked within `ao_dist`
    (traced; inf = sky visibility).  Shares the integrator's occlusion
    kernel and its scale-aware nudge."""
    from ..geometry.intersect import occluded
    from ..utils.constants import NUDGE_EPS
    from . import rng as rng_mod

    rows = height if rows is None else rows
    k_cam, k_ao = jax.random.split(key)
    O, D = generate_rays(k_cam, cam, width, height, spp,
                         projection=projection, row0=jnp.float32(row0),
                         rows=rows)
    t, orient, P, N_geo, uv, obj = _first_hit_impl(O, D, data, static)
    hit = t < MISS_THRESHOLD
    N = N_geo * orient[..., None]
    eps = NUDGE_EPS * jnp.maximum(1.0, jnp.max(jnp.abs(P), axis=-1))
    nudged = P + N * eps[..., None]
    md = jnp.broadcast_to(ao_dist.astype(jnp.float32), (O.shape[0],))
    occ_sum = jnp.zeros((O.shape[0],), jnp.float32)
    for s in range(ao_samples):     # python-static: ao_samples sweeps
        d_s = rng_mod.cosine_sample(jax.random.fold_in(k_ao, s), N)
        occ = occluded(nudged, d_s, data.geom, data.obj.shadow, md)
        occ_sum = occ_sum + occ.astype(jnp.float32)
    ao = jnp.where(hit, 1.0 - occ_sum / ao_samples, 1.0)
    return ao.reshape(spp, rows * width).sum(axis=0)


@partial(jax.jit, static_argnames=("static", "width", "height", "spp",
                                   "ao_samples", "projection", "mesh"))
def _sharded_aovs(key, data, cam, static, width, height, spp, ao_samples,
                  ao_dist, projection, mesh):
    """AOV pass sharded over a ("sample", "pixel") mesh.

    Each device computes the SAME per-chunk feature program (`_aov_chunk` /
    `_ao_chunk`) on its sample slice and pixel band; sums psum over the
    "sample" axis.  `obj_id` does not average — sample shard 0's plane is
    selected (masked psum).  spp here is PER DEVICE.
    """
    from jax.sharding import PartitionSpec as P

    n_pixel = mesh.shape.get("pixel", 1)
    rows = height // n_pixel

    def per_device(key, data, cam, ao_dist):
        s_idx = jax.lax.axis_index("sample")
        p_idx = jax.lax.axis_index("pixel")
        k = jax.random.fold_in(jax.random.fold_in(key, s_idx), p_idx)
        out = _aov_chunk(k, data, cam, static, width, height, spp,
                         projection=projection,
                         row0=(p_idx * rows).astype(jnp.float32), rows=rows)
        if ao_samples:
            out["ao"] = _ao_chunk(
                jax.random.fold_in(k, 1), data, cam, static, width, height,
                spp, ao_samples, ao_dist, projection=projection,
                row0=(p_idx * rows).astype(jnp.float32), rows=rows)
        obj_id = out.pop("obj_id")
        out = {k2: jax.lax.psum(v, "sample") for k2, v in out.items()}
        # ids do not average: take sample shard 0's plane (others add 0)
        out["obj_id"] = jax.lax.psum(
            jnp.where(s_idx == 0, obj_id, jnp.zeros_like(obj_id)), "sample")
        return out

    return jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P("pixel"), check_vma=False,
    )(key, data, cam, ao_dist)


def render_aovs(scene, samples_per_pixel=1, seed=0, ao_samples=0,
                ao_radius=None, mesh=None):
    """Render first-hit feature planes for `scene`.

    Returns a dict of numpy arrays:
      depth    (H, W)    mean hit distance over the samples that hit
      normal   (H, W, 3) mean oriented unit normal (zero where nothing hits)
      albedo   (H, W, 3) mean base surface color (see _albedo_at_hit)
      position (H, W, 3) mean world-space hit point
      coverage (H, W)    fraction of samples that hit anything
      obj_id   (H, W)    compiled object index of sample 0's hit (-1 = miss)
      emissive (H, W)    fraction of samples that hit an emission source
                         (Emissive material or environment) — pixels with any
                         emissive coverage are frozen by the denoiser

    samples_per_pixel > 1 anti-aliases depth/normal/albedo/position with the
    camera's sub-pixel jitter; obj_id always comes from one sample (ids do
    not average).

    ao_samples > 0 adds an `ao` (H, W) plane: ambient occlusion — the
    fraction of cosine-weighted hemisphere directions at the first hit
    that escape within `ao_radius` world units (None = unbounded sky
    visibility).  1 = fully open, 0 = fully blocked; misses are 1.
    `ao_radius` is traced (retuning never recompiles).

    mesh: optional ("sample", "pixel") jax.sharding.Mesh — each device
    computes its own sample slice / pixel band of every plane (psum over
    the sample axis).  samples_per_pixel rounds up to whole sample shards.
    """
    from ..utils.constants import FARAWAY
    from .compile import compile_scene_cached

    if scene.camera is None:
        raise RuntimeError("call add_Camera() first")
    W, H = scene.camera.screen_width, scene.camera.screen_height
    static, data = compile_scene_cached(scene)
    dist = jnp.float32(FARAWAY if ao_radius is None else ao_radius)
    if mesh is not None:
        n_sample = mesh.shape["sample"]
        n_pixel = mesh.shape.get("pixel", 1)
        if H % n_pixel:
            raise ValueError(f"height {H} % pixel shards {n_pixel} != 0")
        spp_dev = -(-int(samples_per_pixel) // n_sample)
        samples_per_pixel = spp_dev * n_sample
        out = _sharded_aovs(jax.random.PRNGKey(seed), data,
                            scene.camera.params(), static, W, H, spp_dev,
                            int(ao_samples), dist,
                            scene.camera.projection, mesh)
        out = {k: np.asarray(v) for k, v in out.items()}
    else:
        out = _aov_chunk(jax.random.PRNGKey(seed), data,
                         scene.camera.params(),
                         static, W, H, int(samples_per_pixel),
                         projection=scene.camera.projection)
        out = {k: np.asarray(v) for k, v in out.items()}
        if ao_samples:
            out["ao"] = np.asarray(_ao_chunk(
                jax.random.fold_in(jax.random.PRNGKey(seed), 1), data,
                scene.camera.params(), static, W, H, int(samples_per_pixel),
                int(ao_samples), dist, projection=scene.camera.projection))
    spp = float(samples_per_pixel)
    cov = out["coverage"]
    hits = np.maximum(cov, 1.0)
    depth = out["depth"] / hits
    normal = out["normal"] / spp
    nlen = np.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / np.maximum(nlen, 1e-12)
    normal = np.where(cov[..., None] > 0, normal, 0.0)
    planes = dict(
        depth=depth.reshape(H, W),
        normal=normal.reshape(H, W, 3),
        albedo=(out["albedo"] / spp).reshape(H, W, 3),
        position=(out["position"] / spp).reshape(H, W, 3),
        coverage=(cov / spp).reshape(H, W),
        obj_id=out["obj_id"].reshape(H, W).astype(np.int32),
        emissive=(out["emissive"] / spp).reshape(H, W),
    )
    if ao_samples:
        planes["ao"] = (out["ao"] / spp).reshape(H, W)
    return planes
