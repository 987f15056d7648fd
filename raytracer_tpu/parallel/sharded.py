"""Multi-chip rendering: shard_map over a (sample, pixel) device mesh.

The reference's only scale-out axis is a multiprocessing.Pool over
samples-per-pixel with a parent-side sum (sightpy/scene.py:80-116) — process
data-parallelism with a pickle broadcast and a Python reduce.  The TPU
equivalent (SURVEY.md §2.3):

* mesh axis "sample": data parallelism over samples-per-pixel.  Each device
  traces its own spp slice of the full frame; the per-pixel radiance sum is
  one `psum` riding the ICI — the all-reduce(+) the Pool's `+=` loop emulated.
* mesh axis "pixel": spatial parallelism over horizontal film bands.  Each
  device generates and traces only its band; no communication at all.

Scene tables are tiny (KBs) and replicated; no point-to-point traffic exists
anywhere in the pipeline (pure map-reduce workload).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import lds
from ..core.camera import generate_rays, projection_mask
from ..core.integrator import RenderSettings, trace
from ..utils.colour import srgb_linear_to_srgb


def make_mesh(n_sample_shards=None, n_pixel_shards=1, devices=None):
    """Build a ("sample", "pixel") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_sample_shards is None:
        n_sample_shards = n // n_pixel_shards
    assert n_sample_shards * n_pixel_shards == n, (
        f"{n_sample_shards}x{n_pixel_shards} mesh != {n} devices")
    dev_array = np.asarray(devices).reshape(n_sample_shards, n_pixel_shards)
    return Mesh(dev_array, axis_names=("sample", "pixel"))


def plan_spp_per_device(samples_per_pixel, diffuse_fan, split_k, n_sample):
    """Per-device sample count for a sharded render.

    Folds the reference's first-bounce diffuse fan (diffuse.py:34-83) and the
    2^split_k deterministic branch patterns into the effective count, splits
    over the sample shards, and rounds up to whole pattern blocks (the 2F/2T
    split weights only average out per block).
    """
    eff_spp = samples_per_pixel * diffuse_fan * (1 << split_k)
    spp_per_device = -(-eff_spp // n_sample)
    split_fan = 1 << split_k
    return -(-spp_per_device // split_fan) * split_fan


def build_sharded_render(static, settings: RenderSettings, mesh,
                         width: int, height: int, spp_per_device: int,
                         force_jnp: bool = False):
    """Compile a sharded render step.

    Returns f(key, data, cam) -> (H*W, 3) linear radiance SUM over
    n_sample_shards * spp_per_device samples (divide by that to average).
    `force_jnp` pins the differentiable jnp wavefront (the Pallas kernels
    have no VJP rules — diff.differentiable_render_sharded needs this).
    """
    n_pixel = mesh.shape["pixel"]
    assert height % n_pixel == 0, f"height {height} % pixel shards {n_pixel} != 0"
    rows = height // n_pixel

    # On TPU, pure sample-sharding routes each device's slice through the
    # fused Pallas mega-kernel; pixel-sharded or non-qualifying scenes (and
    # the CPU dry run) use the jnp wavefront.
    use_pallas = (static.pallas_ok and n_pixel == 1 and not force_jnp
                  and jax.default_backend() in ("tpu", "axon"))

    def per_device(key, data, cam):
        s_idx = jax.lax.axis_index("sample")
        p_idx = jax.lax.axis_index("pixel")
        k = jax.random.fold_in(jax.random.fold_in(key, s_idx), p_idx)
        # R2 lattice state (core/lds.py): rotations keyed by the UNFOLDED key
        # (identical on every device), each sample shard continues the one
        # global lattice at its own offset — the sharded render draws the
        # same stratified sample set a single chip would
        strat_seed = jax.random.randint(key, (), 0, 2 ** 31 - 1,
                                        dtype=jnp.int32)
        sample0 = s_idx.astype(jnp.int32) * spp_per_device
        if use_pallas:
            from ..ops.pallas_trace import pallas_trace_chunk

            seed = jax.random.randint(k, (), 0, 2 ** 31 - 1, dtype=jnp.int32)
            seed_vec = jnp.stack([seed, strat_seed, sample0])
            cam_vec = jnp.concatenate([
                cam.origin, cam.fwd, cam.right, cam.up,
                jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                           cam.half_fov])])
            L, _ = pallas_trace_chunk(seed_vec, data, cam_vec, static, width,
                                      height, spp_per_device,
                                      settings.max_bounces, False,
                                      settings.split_k, settings.sampler,
                                      settings.projection)
        else:
            k_ray, k_trace = jax.random.split(k)
            O, D = generate_rays(k_ray, cam, width, height, spp_per_device,
                                 row0=(p_idx * rows).astype(jnp.float32),
                                 rows=rows, sampler=settings.sampler,
                                 strat_seed=strat_seed, sample0=sample0,
                                 projection=settings.projection)
            n_re = jnp.broadcast_to(data.scene_n_re, O.shape)
            n_im = jnp.broadcast_to(data.scene_n_im, O.shape)
            pattern = None
            if settings.split_k > 0:
                n_band = rows * width
                pattern = (jnp.arange(spp_per_device * n_band,
                                      dtype=jnp.int32)
                           // n_band) % (1 << settings.split_k)
            strat_u = None
            if settings.sampler == "r2":
                strat_u = lds.first_bounce_uniforms(
                    width, rows * width, spp_per_device,
                    (p_idx * rows).astype(jnp.float32), strat_seed, sample0)
            L, _ = trace(k_trace, O, D, n_re, n_im, data, static, settings,
                         pattern=pattern, strat_u=strat_u)
        band = L.reshape(spp_per_device, rows * width, 3).sum(axis=0)
        # all-reduce over the sample axis: each pixel shard ends up with the
        # full sample sum for its band (the Pool '+=' loop, as one collective)
        return jax.lax.psum(band, "sample")

    @jax.jit
    def run(key, data, cam):
        # check_vma off: pallas_call outputs carry no varying-axis metadata
        return jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P("pixel"),
            check_vma=False,
        )(key, data, cam)

    return run


@lru_cache(maxsize=64)
def build_sharded_chunk(static, settings: RenderSettings, mesh,
                        width: int, height: int, spp_dev: int,
                        with_sq: bool = False):
    """Compile ONE sharded spp-chunk of `Scene.render`'s accumulation loop.

    This is the production multi-chip path: `Scene.render(mesh=...)` calls
    the returned function once per chunk, so chunked execution (the relay
    stall mitigation), checkpoint/resume, adaptive stopping, firefly clamp,
    per-pixel variance and progressive preview all work across the mesh
    exactly as they do single-chip.

    Each device runs the SAME per-chunk program the single-chip loop uses
    (`core.scene._render_chunk` / `_render_chunk_pallas`) on its own
    `spp_dev` sample slice and pixel band — non-finite scrub, clamp,
    R2-lattice continuation and branch-pattern enumeration included, with
    zero logic drift between the paths — then one psum over the "sample"
    axis reduces the radiance sums.

    Returns run(key, data, cam, clamp, sample0, strat_seed) ->
    (L_sum, [L2_sum,] stats) over n_sample_shards * spp_dev samples:
      clamp:   traced per-sample radiance ceiling (+inf = off)
      sample0: traced global sample index of this chunk's first sample
               (device s continues the one global R2 lattice at
               sample0 + s * spp_dev)
      strat_seed: traced lattice rotation seed (constant across chunks)
    """
    from ..core.scene import _render_chunk, _render_chunk_pallas, _use_pallas

    n_pixel = mesh.shape["pixel"]
    assert height % n_pixel == 0, (
        f"height {height} % pixel shards {n_pixel} != 0")
    rows = height // n_pixel

    mode, interp = _use_pallas(static, settings)
    use_solid = mode == "solid" and n_pixel == 1
    # the record path's replay tables scale with rays; it is validated
    # single-chip only — textured scenes shard via the jnp wavefront

    def per_device(key, data, cam, clamp, sample0, strat_seed):
        s_idx = jax.lax.axis_index("sample")
        p_idx = jax.lax.axis_index("pixel")
        k = jax.random.fold_in(jax.random.fold_in(key, s_idx), p_idx)
        s0 = sample0 + s_idx.astype(jnp.int32) * spp_dev
        if use_solid:
            out = _render_chunk_pallas(k, data, cam, static, settings,
                                       width, height, spp_dev, interp,
                                       with_sq, strat_seed=strat_seed,
                                       sample0=s0, clamp=clamp)
        else:
            out = _render_chunk(k, data, cam, static, settings,
                                width, height, spp_dev,
                                row0=(p_idx * rows).astype(jnp.float32),
                                rows=rows, with_sq=with_sq,
                                strat_seed=strat_seed, sample0=s0,
                                clamp=clamp)
        if with_sq:
            L, L2, stats = out
        else:
            L, stats = out
        # the Pool's '+=' reduce as one collective (reference scene.py:100-116)
        L = jax.lax.psum(L, "sample")
        parts = (L,)
        if with_sq:
            parts = parts + (jax.lax.psum(L2, "sample"),)
        # scalar counters sum over the WHOLE mesh (each device's band slice
        # traced its own rays)
        stats = {k2: jax.lax.psum(v, ("sample", "pixel"))
                 for k2, v in stats.items()}
        return parts + (stats,)

    band_spec = (P("pixel"),) * (2 if with_sq else 1)

    @jax.jit
    def run(key, data, cam, clamp, sample0, strat_seed):
        # check_vma off: pallas_call outputs carry no varying-axis metadata
        return jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(P(),) * 6,
            out_specs=band_spec + (P(),),
            check_vma=False,
        )(key, data, cam, clamp, sample0, strat_seed)

    return run


def render_sharded(scene, samples_per_pixel, mesh=None, seed=0, **kwargs):
    """Render `scene` across all local devices; returns (H, W, 3) sRGB array.

    samples_per_pixel is rounded up to a multiple of the sample-shard count.

    This is now a thin wrapper over `Scene.render(mesh=...)` — the full
    production render loop (chunked executions under the relay caps,
    checkpoint/resume, adaptive `target_noise`, `clamp`, `with_variance`,
    progressive preview) runs across the mesh; extra kwargs are forwarded
    to `Scene.render`.  Use `Scene.render(mesh=...)` directly for PIL
    output or the variance/stats returns.
    """
    mesh = mesh or make_mesh()
    out = scene.render(samples_per_pixel, seed=seed, mesh=mesh,
                       output="linear", **kwargs)
    linear = out[0] if isinstance(out, tuple) else out
    img = srgb_linear_to_srgb(jnp.asarray(linear.reshape(-1, 3))) \
        .reshape(linear.shape)
    return np.asarray(jax.device_get(img))
