#!/usr/bin/env python
"""Bisect the texture-replay cost on TPU: gathers vs the rest.

Uses example4's real textures and record shapes (B=6 bounces, N=3.84M rays)
with synthetic records, timing each part in its own jit.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import jax
import jax.numpy as jnp


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.time() - t0)
    print(f"{name}: {best:.3f}s", flush=True)
    return best


def main(spp=32):
    import example4
    from raytracer_tpu.core.compile import (compile_scene, derive_max_bounces)
    from raytracer_tpu.ops import pallas_record as pr

    sc = example4.Sc
    W, H = sc.camera.screen_width, sc.camera.screen_height
    static, data = compile_scene(sc)
    B = derive_max_bounces(static)
    n = spp * W * H
    M = B * n
    print(f"B={B} n={n} M={M}", flush=True)
    for i, t in enumerate(data.textures):
        print(f"  tex[{i}]: {t.shape}", flush=True)

    rng = np.random.default_rng(0)
    rec_g = jnp.asarray(rng.integers(0, 3, size=(B, n), dtype=np.int32))
    rec_f = jnp.asarray(rng.random((B, 12, n), dtype=np.float32))

    # 1. full replay
    @jax.jit
    def full(rec_g, rec_f, data):
        return pr._replay(rec_g, rec_f, data, static, B, n)
    timed("replay_full", full, rec_g, rec_f, data)

    # 2. gathers only: fetch each distinct texture once over all M uvs
    @jax.jit
    def gathers_only(rec_f, data):
        u_ = rec_f[:, 0, :].reshape(M)
        v_ = rec_f[:, 1, :].reshape(M)
        acc = jnp.zeros((M,), jnp.float32)
        for t in data.textures:
            Hh, Ww = t.shape[0], t.shape[1]
            iu = jnp.mod((u_ * Ww).astype(jnp.int32), Ww)
            iv = jnp.mod((v_ * Hh).astype(jnp.int32), Hh)
            idx = jnp.mod(-iv, Hh) * Ww + iu
            flat = t.reshape(-1, 3)
            for c in range(3):
                acc = acc + jnp.take(flat[:, c], idx)
        return acc
    timed("gathers_only(all tex x3ch)", gathers_only, rec_f, data)

    # 3. one texture, 3 channels
    @jax.jit
    def gather_one(rec_f, data):
        u_ = rec_f[:, 0, :].reshape(M)
        v_ = rec_f[:, 1, :].reshape(M)
        t = data.textures[0]
        Hh, Ww = t.shape[0], t.shape[1]
        iu = jnp.mod((u_ * Ww).astype(jnp.int32), Ww)
        iv = jnp.mod((v_ * Hh).astype(jnp.int32), Hh)
        idx = jnp.mod(-iv, Hh) * Ww + iu
        flat = t.reshape(-1, 3)
        return sum(jnp.take(flat[:, c], idx) for c in range(3))
    timed("gather_tex0_x3ch", gather_one, rec_f, data)

    # 4. integration only (no gathers): selects + product chain
    @jax.jit
    def integrate_only(rec_g, rec_f):
        word = rec_g.reshape(M)
        gid = word & 0xFFFF
        hit = gid > 0
        out = []
        for c in range(3):
            add = jnp.where(hit, rec_f[:, 3 + c, :].reshape(M)
                            + rec_f[:, 6 + c, :].reshape(M), 0.0).reshape(B, n)
            beta = jnp.where(hit, rec_f[:, 9 + c, :].reshape(M), 1.0).reshape(B, n)
            Lc = add[0]
            bb = beta[0]
            for k in range(1, B):
                Lc = Lc + bb * add[k]
                bb = bb * beta[k]
            out.append(Lc)
        return jnp.stack(out, axis=-1)
    timed("integrate_only", integrate_only, rec_g, rec_f)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
