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
from .core.camera import generate_rays
from .core.compile import compile_scene_cached, derive_max_bounces, derive_split_k
from .core.integrator import RenderSettings, trace
from .utils.colour import srgb_linear_to_srgb


def _frame_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("frame",))


def _build_frame_step(static, settings, mesh, width, height, spp):
    """Compile: (keys (D,2), stacked data, cam (D,16), textures)
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
        cam_vec = cam_vec.reshape(16)
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
                    settings.sampler)
            else:
                from .ops.pallas_record import pallas_record_chunk
                L, _ = pallas_record_chunk(
                    seed_vec, data, cam_vec, static, width, height, spp,
                    settings.max_bounces, False, settings.split_k,
                    settings.sampler)
        else:
            k_ray, k_trace = jax.random.split(key)
            O, D = generate_rays(k_ray, _cam_from_vec(cam_vec),
                                 width, height, spp,
                                 sampler=settings.sampler,
                                 strat_seed=strat[0], sample0=strat[1])
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

    @jax.jit
    def tonemap(acc, n_samples):
        srgb = srgb_linear_to_srgb(acc / n_samples)
        srgb = srgb.reshape(acc.shape[0], height, width, 3)
        # truncating quantization, matching utils.image_io.array_to_pil
        return (jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    return run, tonemap


def _cam_from_vec(v):
    from .core.camera import CameraParams

    return CameraParams(origin=v[0:3], fwd=v[3:6], right=v[6:9], up=v[9:12],
                        cam_w=v[12], cam_h=v[13], lens_radius=v[14],
                        focal=v[15])


def _frame_data(scene):
    """Compile one frame's scene; textures split out (frame-invariant, big)."""
    static, data = compile_scene_cached(scene)
    cam = scene.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal])])
    nt = dataclasses.replace(data, textures=())
    return static, nt, data.textures, cam_vec


def render_frames(scene, samples_per_pixel, times, update_scene, seed=0,
                  mesh=None):
    """Render one frame per entry of `times`, yielding (H, W, 3) uint8 arrays.

    Frames are rendered in device-count-sized batches, one frame per device
    (frame-axis data parallelism), and the host overlaps PNG/video encoding
    of batch i with the device rendering of batch i+1.
    """
    mesh = mesh or _frame_mesh()
    n_dev = mesh.devices.size
    W, H = scene.camera.screen_width, scene.camera.screen_height

    # compile frame 0 to fix the scene structure + settings
    update_scene(scene, times[0])
    static0, _, textures, _ = _frame_data(scene)
    split_k = derive_split_k(static0)
    settings = RenderSettings(max_bounces=derive_max_bounces(static0),
                              split_k=split_k,
                              sampler=scene.settings.sampler)
    split_fan = 1 << split_k
    eff_spp = samples_per_pixel * scene._diffuse_fan() * split_fan
    eff_spp = -(-eff_spp // split_fan) * split_fan
    # HBM-bounded per-frame chunking, whole pattern blocks per chunk (the
    # record kernel's per-(ray, bounce) records are the binding buffer)
    from .core.scene import MAX_RAYS_PER_CHUNK

    chunk = max(1, min(eff_spp, MAX_RAYS_PER_CHUNK // (W * H)))
    chunk = max(split_fan, chunk - chunk % split_fan)
    n_chunks = -(-eff_spp // chunk)
    step, tonemap = _build_frame_step(static0, settings, mesh, W, H, chunk)

    def launch(batch_times, base_index):
        """Stack per-frame data and enqueue the sharded render (no sync)."""
        datas, cams = [], []
        for bt in batch_times:
            update_scene(scene, bt)
            static_i, nt, _, cam_vec = _frame_data(scene)
            if static_i != static0:
                raise ValueError(
                    "update_scene changed the scene STRUCTURE between frames "
                    "(object/material/light counts must stay constant; only "
                    "traced parameters may animate)")
            datas.append(nt)
            cams.append(cam_vec)
        while len(datas) < n_dev:           # pad the tail batch
            datas.append(datas[-1])
            cams.append(cams[-1])
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
        base = jax.random.PRNGKey(seed)
        frame_keys = [jax.random.fold_in(base, base_index + j)
                      for j in range(n_dev)]
        # R2 rotation seed from the BASE key — the same derivation as
        # Scene.render (frame 0 stays bit-identical to it) and the same
        # lattice on every frame (temporally stable AA, no sample shimmer)
        strat_seed = jax.random.randint(base, (), 0, 2 ** 31 - 1,
                                        dtype=jnp.int32)
        acc = None
        for c in range(n_chunks):
            # chunk 0 reuses the frame key itself, so a 1-chunk frame 0 is
            # bit-identical to Scene.render's first chunk
            keys = jnp.stack([k if c == 0 else jax.random.fold_in(k, c)
                              for k in frame_keys])
            strat = jnp.broadcast_to(
                jnp.stack([strat_seed, jnp.int32(c * chunk)]), (n_dev, 2))
            out = step(keys, stacked, jnp.stack(cams), textures, strat)
            acc = out if acc is None else acc + out
        return tonemap(acc, float(n_chunks * chunk)), len(batch_times)

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
    """
    from PIL import Image

    mesh = mesh or _frame_mesh()
    n_dev = mesh.devices.size
    W, H = scene.camera.screen_width, scene.camera.screen_height

    if slices is None:
        slices = max(1, min(32, samples_per_pixel))
    slice_spp = max(1, round(samples_per_pixel / slices))
    t0, t1 = shutter
    dt = (t1 - t0) / slices
    times = [t0 + (j + 0.5) * dt for j in range(slices)]

    # compile at the first slice time to fix scene structure + settings
    update_scene(scene, times[0])
    static0, _, textures, _ = _frame_data(scene)
    split_k = derive_split_k(static0)
    settings = RenderSettings(max_bounces=derive_max_bounces(static0),
                              split_k=split_k,
                              sampler=scene.settings.sampler)
    split_fan = 1 << split_k
    eff_spp = slice_spp * scene._diffuse_fan() * split_fan
    eff_spp = -(-eff_spp // split_fan) * split_fan
    from .core.scene import MAX_RAYS_PER_CHUNK

    chunk = max(1, min(eff_spp, MAX_RAYS_PER_CHUNK // (W * H)))
    chunk = max(split_fan, chunk - chunk % split_fan)
    n_chunks = -(-eff_spp // chunk)
    spp_slice = n_chunks * chunk            # per-slice samples actually drawn
    step, tonemap = _build_frame_step(static0, settings, mesh, W, H, chunk)

    base = jax.random.PRNGKey(seed)
    strat_seed = jax.random.randint(base, (), 0, 2 ** 31 - 1, dtype=jnp.int32)
    acc = None
    for b0 in range(0, slices, n_dev):
        batch = times[b0:b0 + n_dev]
        n_real = len(batch)
        datas, cams = [], []
        for bt in batch:
            update_scene(scene, bt)
            static_i, nt, _, cam_vec = _frame_data(scene)
            if static_i != static0:
                raise ValueError(
                    "update_scene changed the scene STRUCTURE between "
                    "shutter slices (object/material/light counts must stay "
                    "constant; only traced parameters may move)")
            datas.append(nt)
            cams.append(cam_vec)
        while len(datas) < n_dev:           # pad the tail batch
            datas.append(datas[-1])
            cams.append(cams[-1])
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
        keys = [jax.random.fold_in(base, b0 + j) for j in range(n_dev)]
        for c in range(n_chunks):
            ck = jnp.stack([k if c == 0 else jax.random.fold_in(k, c)
                            for k in keys])
            # every slice advances the ONE global lattice: slice j draws
            # samples [j*spp_slice, (j+1)*spp_slice) of the full-spp set
            strat = jnp.stack(
                [jnp.stack([strat_seed,
                            jnp.int32((b0 + j) * spp_slice + c * chunk)])
                 for j in range(n_dev)])
            out = step(ck, stacked, jnp.stack(cams), textures, strat)
            got = out[:n_real].sum(axis=0)  # drop tail padding duplicates
            acc = got if acc is None else acc + got
    if output == "linear":
        lin = np.asarray(acc, np.float32) / float(slices * spp_slice)
        return lin.reshape(H, W, 3)
    frames = tonemap(acc[None], float(slices * spp_slice))
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
