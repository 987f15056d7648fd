#!/usr/bin/env python
"""Split record-kernel vs texture-replay time for the textured path on TPU.

Times one example4-shaped chunk three ways (second run each, D2H-forced):
  full    pallas_record_chunk (record kernel + jnp replay, one jit)
  record  the Pallas record kernel alone
  replay  the jnp replay alone, on pre-recorded arrays

Run on a QUIET machine; first run per shape compiles through the axon
tunnel (minutes) and is cached persistently.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax
import jax.numpy as jnp


def main(spp=32):
    import example4
    from raytracer_tpu.core.compile import (compile_scene, derive_max_bounces,
                                            derive_split_k)
    from raytracer_tpu.ops import pallas_record as pr

    sc = example4.Sc
    W, H = sc.camera.screen_width, sc.camera.screen_height
    static, data = compile_scene(sc)
    assert static.pallas_tex_ok
    max_b = derive_max_bounces(static)
    split_k = derive_split_k(static)
    print(f"W={W} H={H} spp={spp} max_bounces={max_b} split_k={split_k}",
          flush=True)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    seed = jnp.asarray(7, jnp.int32)

    def timed(name, fn, *args):
        outs = fn(*args)   # compile + warmup
        jax.block_until_ready(outs)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = fn(*args)
            # force D2H of one leaf (block_until_ready returns early via axon)
            np.asarray(jax.tree_util.tree_leaves(outs)[0].ravel()[:1])
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.3f}s", flush=True)
        return outs, best

    # full chunk
    import functools
    full = functools.partial(pr.pallas_record_chunk, static=static, width=W,
                             height=H, spp=spp, max_bounces=max_b,
                             split_k=split_k)
    _, t_full = timed("full", lambda: full(seed, data, cam_vec))

    # record-only: same pallas_call, return raw records
    n_pix = W * H
    n = spp * n_pix

    @functools.partial(jax.jit, static_argnames=())
    def record_only(seed, data, cam_vec):
        # rebuild the call exactly as pallas_record_chunk does
        return pr._record_call(seed, data, cam_vec, static, W, H, spp,
                               max_b, False, split_k)

    (rec_g, rec_f, cnt), t_rec = timed("record", record_only, seed, data,
                                       cam_vec)

    @jax.jit
    def replay_only(rec_g, rec_f, data):
        return pr._replay(rec_g, rec_f, data, static, max_b, n)

    rg = rec_g.reshape(max_b, -1)[:, :n]
    rf = rec_f.reshape(max_b, 12, -1)[:, :, :n]
    _, t_rep = timed("replay", replay_only, rg, rf, data)
    print(f"sum check: record {t_rec:.3f} + replay {t_rep:.3f} "
          f"~ full {t_full:.3f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
