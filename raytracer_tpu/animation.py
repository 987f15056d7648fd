"""TPU-first animation: frame-parallel rendering over the device mesh.

API parity with the reference (sightpy/animation.py:6-54) — same
`create_animation` / `create_animation_using_opencv` signatures — but the
execution model is rebuilt for the hardware:

* **Frame-axis sharding**: with D devices, D frames render CONCURRENTLY, one
  per device, via `shard_map` over a 1-D "frame" mesh.  Scene tables are
  per-frame pytrees stacked on a leading frame axis and sharded; textures
  (the big leaves, frame-invariant) stay replicated.  The reference renders
  frames strictly serially.
* **Compute/encode pipelining**: jax dispatch is asynchronous — the device
  renders batch i+1 while the host pulls and encodes batch i.  A frame is
  converted to uint8 ON DEVICE so the host transfer is 3 bytes/pixel.
* **One executable for the whole clip**: camera and geometry parameters are
  traced arrays, so `update_scene` mutations never retrigger compilation
  (the scene STRUCTURE must stay constant across frames, which `render_frames`
  checks).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .core import lds
from .core.camera import generate_rays, projection_mask
from .core.compile import compile_scene_cached, derive_max_bounces, derive_split_k
from .core.integrator import RenderSettings, trace
from .utils.colour import srgb_linear_to_srgb


def _frame_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("frame",))


def _build_frame_step(static, settings, mesh, width, height, spp):
    """Compile: (keys (D,2), stacked data, cam (D,17), textures)
    -> (D, H, W, 3) uint8."""
    n_pix = width * height
    # qualifying frames render through the Pallas kernels on TPU, exactly as
    # Scene.render would (parallel/sharded.py uses the same routing)
    pallas_mode = ("solid" if static.pallas_ok
                   else "record" if static.pallas_tex_ok else None)
    use_pallas = (pallas_mode is not None
                  and jax.default_backend() in ("tpu", "axon"))

    def per_frame(key, data_nt, cam_vec, textures, strat):
        # shard_map blocks keep the leading (length-1) frame axis: strip it
        data = jax.tree_util.tree_map(lambda x: x[0], data_nt)
        data = dataclasses.replace(data, textures=textures)
        key = key.reshape(2)
        cam_vec = cam_vec.reshape(17)
        strat = strat.reshape(2)   # [R2 rotation seed, global sample offset]
        if use_pallas:
            seed = jax.random.randint(key, (), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
            seed_vec = jnp.stack([seed, strat[0], strat[1]])
            if pallas_mode == "solid":
                from .ops.pallas_trace import pallas_trace_chunk
                L, _ = pallas_trace_chunk(
                    seed_vec, data, cam_vec, static, width, height, spp,
                    settings.max_bounces, False, settings.split_k,
                    settings.sampler, settings.projection)
            else:
                from .ops.pallas_record import pallas_record_chunk
                L, _ = pallas_record_chunk(
                    seed_vec, data, cam_vec, static, width, height, spp,
                    settings.max_bounces, False, settings.split_k,
                    settings.sampler, settings.projection)
        else:
            k_ray, k_trace = jax.random.split(key)
            O, D = generate_rays(k_ray, _cam_from_vec(cam_vec),
                                 width, height, spp,
                                 sampler=settings.sampler,
                                 strat_seed=strat[0], sample0=strat[1],
                                 projection=settings.projection)
            n_re = jnp.broadcast_to(data.scene_n_re, O.shape)
            n_im = jnp.broadcast_to(data.scene_n_im, O.shape)
            pattern = None
            if settings.split_k > 0:
                pattern = (jnp.arange(spp * n_pix, dtype=jnp.int32) // n_pix) \
                    % (1 << settings.split_k)
            strat_u = None
            if settings.sampler == "r2":
                strat_u = lds.first_bounce_uniforms(
                    width, n_pix, spp, 0.0, strat[0], strat[1])
            L, _ = trace(k_trace, O, D, n_re, n_im, data, static, settings,
                         pattern=pattern, strat_u=strat_u)
        L = jnp.where(jnp.isfinite(L), L, 0.0)
        # linear radiance SUM over this chunk's spp (host accumulates chunks)
        return L.reshape(spp, n_pix, 3).sum(axis=0)[None]

    @jax.jit
    def run(keys, data_stacked, cam_vecs, textures, strat):
        return jax.shard_map(
            per_frame, mesh=mesh,
            in_specs=(P("frame"), P("frame"), P("frame"), P(), P("frame")),
            out_specs=P("frame"),
            check_vma=False,
        )(keys, data_stacked, cam_vecs, textures, strat)

    pmask = projection_mask(settings.projection, width, height)

    @jax.jit
    def tonemap(acc, n_samples):
        if pmask is not None:           # fisheye image circle
            acc = acc * pmask[None, :, None]
        srgb = srgb_linear_to_srgb(acc / n_samples)
        srgb = srgb.reshape(acc.shape[0], height, width, 3)
        # truncating quantization, matching utils.image_io.array_to_pil
        return (jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    return run, tonemap


def _cam_from_vec(v):
    from .core.camera import CameraParams

    return CameraParams(origin=v[0:3], fwd=v[3:6], right=v[6:9], up=v[9:12],
                        cam_w=v[12], cam_h=v[13], lens_radius=v[14],
                        focal=v[15], half_fov=v[16])


def _frame_data(scene):
    """Compile one frame's scene; textures split out (frame-invariant, big)."""
    static, data = compile_scene_cached(scene)
    cam = scene.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    nt = dataclasses.replace(data, textures=())
    return static, nt, data.textures, cam_vec


class _FramePlan:
    """Compile-once machinery shared by `render_frames` and
    `render_motion_blur`: settings/chunk derivation at the first time
    point, per-batch data stacking with the structure check, and the
    chunk key / stratification-offset construction."""

    def __init__(self, scene, samples_per_pixel, update_scene, t_first,
                 seed, mesh):
        self.scene, self.update_scene = scene, update_scene
        self.mesh = mesh or _frame_mesh()
        self.n_dev = self.mesh.devices.size
        self.W = scene.camera.screen_width
        self.H = scene.camera.screen_height
        # compile at the first time point to fix scene structure + settings
        update_scene(scene, t_first)
        self.static0, _, self.textures, _ = _frame_data(scene)
        split_k = derive_split_k(self.static0)
        self.settings = RenderSettings(
            max_bounces=derive_max_bounces(self.static0), split_k=split_k,
            sampler=scene.settings.sampler,
            projection=scene.camera.projection)
        split_fan = 1 << split_k
        eff_spp = samples_per_pixel * scene._diffuse_fan() * split_fan
        # HBM-bounded per-frame chunking, whole pattern blocks per chunk
        # (the record kernel's per-(ray, bounce) records are the binding
        # buffer)
        from .core.scene import MAX_RAYS_PER_CHUNK

        chunk = max(1, min(eff_spp, MAX_RAYS_PER_CHUNK // (self.W * self.H)))
        self.chunk = max(split_fan, chunk - chunk % split_fan)
        self.n_chunks = -(-eff_spp // self.chunk)
        self.spp_frame = self.n_chunks * self.chunk  # samples drawn per frame
        self.step, self.tonemap = _build_frame_step(
            self.static0, self.settings, self.mesh, self.W, self.H,
            self.chunk)
        self.base = jax.random.PRNGKey(seed)
        # R2 rotation seed from the BASE key — the same derivation as
        # Scene.render (a 1-chunk frame 0 stays bit-identical to it)
        self.strat_seed = jax.random.randint(self.base, (), 0, 2 ** 31 - 1,
                                             dtype=jnp.int32)

    def stack_batch(self, batch_times):
        """Compile each time point's tables; stack along the frame axis
        (padding the tail batch by repeating the last frame)."""
        datas, cams = [], []
        for bt in batch_times:
            self.update_scene(self.scene, bt)
            static_i, nt, _, cam_vec = _frame_data(self.scene)
            if static_i != self.static0:
                raise ValueError(
                    "update_scene changed the scene STRUCTURE between time "
                    "points (object/material/light counts must stay "
                    "constant; only traced parameters may animate)")
            datas.append(nt)
            cams.append(cam_vec)
        while len(datas) < self.n_dev:
            datas.append(datas[-1])
            cams.append(cams[-1])
        return (jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas),
                jnp.stack(cams))

    def chunk_keys(self, base_index, c):
        """Per-device PRNG keys for chunk c of frames base_index + j.
        Chunk 0 reuses the frame key itself, so a 1-chunk frame 0 is
        bit-identical to Scene.render's first chunk."""
        keys = [jax.random.fold_in(self.base, base_index + j)
                for j in range(self.n_dev)]
        return jnp.stack([k if c == 0 else jax.random.fold_in(k, c)
                          for k in keys])

    def strat(self, base_index, c, advance_per_frame):
        """[R2 seed, global sample offset] rows.  advance_per_frame=0 keeps
        the SAME lattice on every frame (temporally stable AA, no sample
        shimmer); spp_frame advances each frame through ONE global lattice
        (motion blur: the union of slices is the full-spp sample set)."""
        return jnp.stack([
            jnp.stack([self.strat_seed,
                       jnp.int32((base_index + j) * advance_per_frame
                                 + c * self.chunk)])
            for j in range(self.n_dev)])


def render_frames(scene, samples_per_pixel, times, update_scene, seed=0,
                  mesh=None):
    """Render one frame per entry of `times`, yielding (H, W, 3) uint8 arrays.

    Frames are rendered in device-count-sized batches, one frame per device
    (frame-axis data parallelism), and the host overlaps PNG/video encoding
    of batch i with the device rendering of batch i+1.
    """
    plan = _FramePlan(scene, samples_per_pixel, update_scene, times[0],
                      seed, mesh)

    def launch(batch_times, base_index):
        """Stack per-frame data and enqueue the sharded render (no sync)."""
        stacked, cams = plan.stack_batch(batch_times)
        acc = None
        for c in range(plan.n_chunks):
            out = plan.step(plan.chunk_keys(base_index, c), stacked, cams,
                            plan.textures, plan.strat(base_index, c, 0))
            acc = out if acc is None else acc + out
        return plan.tonemap(acc, float(plan.spp_frame)), len(batch_times)

    n_dev = plan.n_dev
    batches = [times[i:i + n_dev] for i in range(0, len(times), n_dev)]
    pending = None
    for bi, batch in enumerate(batches):
        out = launch(batch, bi * n_dev)
        if pending is not None:
            frames, count = pending
            host = np.asarray(frames)           # sync batch i-1; i renders
            for j in range(count):
                yield host[j]
        pending = out
    frames, count = pending
    host = np.asarray(frames)
    for j in range(count):
        yield host[j]


def render_motion_blur(scene, samples_per_pixel, update_scene,
                       shutter=(0.0, 1.0), slices=None, seed=0, mesh=None,
                       output="srgb"):
    """Distribution motion blur over an open shutter.

    The shutter interval is stratified into `slices` times (slice
    midpoints); each slice renders `samples_per_pixel / slices` camera
    samples of the scene as mutated by `update_scene(scene, t)` — the same
    callback contract as `create_animation` (reference animation.py:6-31;
    the reference itself has no motion blur: every render is one instant).
    Linear radiance accumulates ON DEVICE across slices and is tonemapped
    once, so the result is the exact Monte-Carlo shutter integral at slice
    granularity.

    TPU-first mechanics, inherited from `render_frames`:

    * object/camera motion is DATA (traced tables), so every slice reuses
      ONE compiled executable — moving a sphere never recompiles;
    * with D devices, D shutter times render concurrently over the 1-D
      frame mesh;
    * the R2 lattice continues across slices via the global sample offset,
      so the union of all slices is the SAME well-distributed sample set a
      static render of the full spp would use (time becomes one extra
      stratified dimension instead of degrading the others).

    Returns a PIL image (`output="srgb"`), or the raw `(H, W, 3)` float32
    linear-radiance mean (`output="linear"`, e.g. for `save_hdr`).
    `slices=None` picks min(32, spp) — enough that slice ghosting is below
    the render's own noise for typical motion.
    samples_per_pixel is rounded UP to a multiple of `slices` (never down:
    the requested budget is a floor, like Scene.render's chunk rounding).
    """
    from PIL import Image

    slices = (max(1, min(32, samples_per_pixel)) if slices is None
              else min(slices, samples_per_pixel))
    slice_spp = -(-samples_per_pixel // slices)     # ceil: never under-sample
    t0, t1 = shutter
    dt = (t1 - t0) / slices
    times = [t0 + (j + 0.5) * dt for j in range(slices)]

    plan = _FramePlan(scene, slice_spp, update_scene, times[0], seed, mesh)
    acc = None
    for b0 in range(0, slices, plan.n_dev):
        batch = times[b0:b0 + plan.n_dev]
        n_real = len(batch)
        stacked, cams = plan.stack_batch(batch)
        for c in range(plan.n_chunks):
            # every slice advances the ONE global lattice: slice j draws
            # samples [j*spp_frame, (j+1)*spp_frame) of the full-spp set
            out = plan.step(plan.chunk_keys(b0, c), stacked, cams,
                            plan.textures, plan.strat(b0, c, plan.spp_frame))
            got = out[:n_real].sum(axis=0)  # drop tail padding duplicates
            acc = got if acc is None else acc + got
    n_total = float(slices * plan.spp_frame)
    if output == "linear":
        lin = np.asarray(acc, np.float32) / n_total
        # fisheye image circle: the same output-time mask plan.tonemap
        # applies on the uint8 path (see core/camera.projection_mask)
        pmask = projection_mask(plan.settings.projection, plan.W, plan.H)
        if pmask is not None:
            lin = lin * pmask[:, None]
        return lin.reshape(plan.H, plan.W, 3)
    frames = plan.tonemap(acc[None], n_total)
    return Image.fromarray(np.asarray(frames)[0])


def _frame_times(fps, start_time, final_time):
    number_of_frames = int(fps * (final_time - start_time))
    dt = (final_time - start_time) / number_of_frames
    return [start_time + i * dt for i in range(number_of_frames)]


def create_animation(scene, samples_per_pixel, fps, start_time, final_time,
                     update_scene, name, frames_dir="./frames",
                     progress=False):
    """Render frames to PNG files frames/<name>_<i>.png (reference
    animation.py:6-31 API).  Returns measured frames/s.

    Assemble with e.g.:
    ffmpeg -r 60 -f image2 -i frames/name_%d.png -vcodec libx264 -crf 1 -pix_fmt yuv420p out.mp4
    """
    from PIL import Image

    out = Path(frames_dir)
    out.mkdir(exist_ok=True)
    times = _frame_times(fps, start_time, final_time)
    t0 = time.time()
    for i, frame in enumerate(render_frames(scene, samples_per_pixel, times,
                                            update_scene)):
        Image.fromarray(frame).save(str(out / f"{name}_{i}.png"))
        if progress:
            print(f"frame {i + 1}/{len(times)} {time.time() - t0:.2f}s",
                  flush=True)
    wall = time.time() - t0
    return len(times) / wall if wall > 0 else 0.0


def create_animation_using_opencv(scene, samples_per_pixel, fps, start_time,
                                  final_time, update_scene, name):
    """Stream frames straight into an MJPG video (reference
    animation.py:34-54 API).  Returns measured frames/s."""
    import cv2

    times = _frame_times(fps, start_time, final_time)
    size = (scene.camera.screen_width, scene.camera.screen_height)
    writer = cv2.VideoWriter(name, cv2.VideoWriter_fourcc(*"MJPG"), fps, size)
    t0 = time.time()
    n = 0
    for frame in render_frames(scene, samples_per_pixel, times, update_scene):
        writer.write(frame[..., ::-1])          # RGB -> BGR without cvtColor
        n += 1
    writer.release()
    wall = time.time() - t0
    return n / wall if wall > 0 else 0.0
