"""Decompose the tiled-order cost + finish the banding matrix (example4).

probe_tiled_banding measured (pipelined ms/chunk): flat/0 118.7,
tiled/0 140.5, tiled/4 123.1, tiled/10 151.5.  This probe answers:
  - where do tiled/0's extra ~22 ms/chunk go?  (record kernel alone,
    flat vs tiled; replay-only = chunk - record)
  - does flat-order banding or a finer tiled group change the verdict?
"""
import sys
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import raytracer_tpu  # noqa: E402
from raytracer_tpu.core.compile import (compile_scene_cached,
                                        derive_max_bounces,
                                        derive_split_k)  # noqa: E402
from raytracer_tpu.ops import pallas_record as prec  # noqa: E402

REPS = 5


def main(which="example4"):
    import importlib
    mod = importlib.import_module(which)
    Sc = mod.Sc
    static, data = compile_scene_cached(Sc)
    W, H = Sc.camera.screen_width, Sc.camera.screen_height
    B = derive_max_bounces(static)
    sk = derive_split_k(static)
    eff = 16 * (1 << sk)
    chunk_spp = max(1 << sk, min(eff, (1 << 20) // (W * H)) // (1 << sk)
                    * (1 << sk))
    n_chunks = -(-eff // chunk_spp)
    cam = Sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    print(f"{which}: B={B} chunk={chunk_spp}spp x {n_chunks}")

    rec_only = {}
    for om in ("flat", "tiled"):
        rec_only[om] = jax.jit(lambda s, om=om: prec._record_call(
            s, data, cam_vec, static, W, H, chunk_spp, B,
            split_k=sk, sampler="r2", order_mode=om)[2].sum())

    def pipelined(f, tag):
        outs = [f(jnp.asarray([1000 + i, 77, i * chunk_spp], jnp.int32))
                for i in range(n_chunks)]
        return sum(np.asarray(o) for o in outs)

    def timed(f, tag):
        pipelined(f, tag)                      # warm/compile
        ws = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            pipelined(f, tag)
            ws.append(time.perf_counter() - t0)
        ws.sort()
        print(f"  {tag:22s}: {ws[len(ws)//2]/n_chunks*1e3:7.1f} ms/chunk "
              f"({[round(w, 3) for w in ws]})", flush=True)

    for om in ("flat", "tiled"):
        timed(rec_only[om], f"record-only {om}")

    for om, bg in (("flat", 4), ("tiled", 2)):
        f = lambda s, om=om, bg=bg: prec.pallas_record_chunk(
            s, data, cam_vec, static, W, H, chunk_spp, B,
            split_k=sk, sampler="r2", order_mode=om, banding=bg)[0].sum()
        timed(f, f"chunk {om}/band={bg}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "example4")
