"""Probe: do low-discrepancy camera samples cut Cornell MSE at equal spp?

Swaps the i.i.d. AA jitter in generate_rays for a Cranley-Patterson-rotated
R2 lattice (exact uint32 fixed-point additive recurrence keyed by the global
sample index, rotation hashed per pixel) and compares MSE vs a high-spp
truth across seeds.  CPU, 32x32 Cornell.

Run: python scripts/probe_lds.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "examples"))

import raytracer_tpu.core.camera as camera_mod
import raytracer_tpu.core.scene as scene_mod
from example_cornellbox import build_cornell
from raytracer_tpu.core import rng

# R2 sequence generator constants in 32-bit fixed point (Roberts 2018):
# g = plastic constant root; alpha_k = frac(1/g^k)
_G = 1.32471795724474602596
K1 = np.uint32(int((1.0 / _G) * 2**32) & 0xFFFFFFFF)
K2 = np.uint32(int((1.0 / _G**2) * 2**32) & 0xFFFFFFFF)


def _hash32(x, seed):
    x = (x.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)) ^ jnp.uint32(seed)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def generate_rays_lds(key, params, width, height, spp, dtype=jnp.float32,
                      row0=0, rows=None):
    if rows is None:
        rows = height
    n_pix = width * rows
    n = spp * n_pix
    # derive a 32-bit seed from the chunk key (fold chunk index in so
    # rotations differ per chunk -- NO, rotations must be SHARED across
    # chunks for cross-chunk stratification; use a fixed seed from key[0]?
    # For this probe: single chunk, use key data directly.
    kd = jax.random.key_data(key)
    seed = kd.reshape(-1)[-1].astype(jnp.uint32)

    idx = jnp.arange(n, dtype=jnp.uint32)
    pix = idx % np.uint32(n_pix)
    s = idx // np.uint32(n_pix)

    rot1 = _hash32(pix, 0x12345678)
    rot2 = _hash32(pix, 0x9ABCDEF0)
    u1 = ((rot1 + s * K1) >> 8).astype(dtype) * (1.0 / (1 << 24))
    u2 = ((rot2 + s * K2) >> 8).astype(dtype) * (1.0 / (1 << 24))

    py_i = (pix // np.uint32(width)).astype(dtype)
    px_i = (pix % np.uint32(width)).astype(dtype)
    # the original's pixel-center + jitter formula, with R2 jitter
    x = (px_i / (width - 1) - 0.5) * params.cam_w + (u1 - 0.5) * (params.cam_w / width)
    y = (0.5 - (row0 + py_i) / (height - 1)) * params.cam_h + (u2 - 0.5) * (params.cam_h / height)

    k_disk = jax.random.split(key, 3)[2]
    rx, ry = rng.random_in_unit_disk(k_disk, (n,))
    origin = (params.origin[None, :]
              + params.right[None, :] * (rx * params.lens_radius)[:, None]
              + params.up[None, :] * (ry * params.lens_radius)[:, None])
    target = (params.origin[None, :]
              + params.up[None, :] * (y * params.focal)[:, None]
              + params.right[None, :] * (x * params.focal)[:, None]
              + params.fwd[None, :] * params.focal)
    d = target - origin
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return origin, d


def mse(a, b):
    return float(((np.asarray(a) - np.asarray(b)) ** 2).mean())


def main():
    S = 32
    sc = build_cornell(S, S)
    truth = sc.render(512, seed=999, output="linear")

    seeds = range(5)
    spp = 16
    base = [mse(sc.render(spp, seed=s, output="linear"), truth)
            for s in seeds]

    orig = scene_mod.generate_rays
    scene_mod.generate_rays = generate_rays_lds
    try:
        scene_mod._render_chunk.clear_cache()
        strat = [mse(sc.render(spp, seed=s, output="linear"), truth)
                 for s in seeds]
    finally:
        scene_mod.generate_rays = orig
        scene_mod._render_chunk.clear_cache()

    print(f"baseline MSE @ {spp}spp: {np.mean(base):.6f} +- {np.std(base):.6f}")
    print(f"R2-AA    MSE @ {spp}spp: {np.mean(strat):.6f} +- {np.std(strat):.6f}")
    print(f"ratio: {np.mean(base) / np.mean(strat):.3f}x")


if __name__ == "__main__":
    main()
