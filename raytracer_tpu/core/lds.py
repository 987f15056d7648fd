"""Low-discrepancy camera sampling: Cranley-Patterson-rotated R2 lattices.

The reference draws every camera AA / lens jitter from the global unseeded
`np.random` (sightpy/camera.py:56-69) — i.i.d. uniforms whose pixel error
shrinks as O(1/sqrt(N)).  Here each pixel instead walks the R2 additive
recurrence (Roberts 2018, "The Unreasonable Effectiveness of
Quasirandom Sequences"): sample s of pixel p uses

    u_d(p, s) = frac(rot_d(p) + s * alpha_d),  alpha = (1/g, 1/g^2),

with g the plastic constant and rot_d(p) a per-(pixel, dimension) hash of
the render seed — a Cranley-Patterson rotation that keeps every pixel's
lattice independent and the estimator unbiased.  Measured on the Cornell
box at 16 spp this cuts whole-image MSE 2.2x vs i.i.d. jitter at equal
sample count (scripts/probe_lds.py).

TPU-first shape: the recurrence runs in 32-bit FIXED POINT — `frac(s * a)`
is one uint32 multiply whose natural wraparound IS the frac, exact at any
s (an f32 frac loses stratification past a few thousand samples).  All
helpers are pure uint32 jnp ops, so the SAME code runs in the jnp
wavefront and inside the Pallas kernels (which already do identical
integer mixing in `_TileRng`); only the final bits->float conversion
differs per side (Mosaic needs a bitcast, `to_float` / the kernels'
`pltpu.bitcast` idiom).

Draw-dimension registry (keep kernel and wavefront in sync):
  0, 1: camera AA jitter (x, y)
  2, 3: thin-lens aperture (r, phi)
"""

from __future__ import annotations

import jax.numpy as jnp

# plastic constant g: the unique real root of x^3 = x + 1
_G = 1.32471795724474602596
# R2 generator in 32-bit fixed point (exact frac via uint32 wraparound)
ALPHA = (int((1.0 / _G) * 2 ** 32) & 0xFFFFFFFF,
         int((1.0 / _G ** 2) * 2 ** 32) & 0xFFFFFFFF)
# per-dimension rotation salts (arbitrary odd constants)
_DIM_SALT = (0x3C6EF372, 0x9E3779B9, 0x85EBCA77, 0xC2B2AE3D)

INV_2_24 = 1.0 / (1 << 24)


def mix32(x):
    """murmur3 finalizer — same mixing the kernels' _TileRng uses."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def r2_bits(pix, s, seed, dim):
    """32-bit fixed-point R2 sample: uint32 bits of u_dim(pix, s).

    pix: uint32 global pixel index (any shape); s: uint32 global sample
    index (same shape or scalar); seed: uint32/int32 scalar render seed;
    dim: python-static draw dimension (see registry above).
    """
    rot = mix32(pix * jnp.uint32(0x9E3779B1)
                ^ (seed.astype(jnp.uint32) + jnp.uint32(_DIM_SALT[dim % 4])))
    return rot + s * jnp.uint32(ALPHA[dim % 2])


def to_float(bits):
    """uint32 bits -> f32 in [0, 1) (jnp side; kernels bitcast instead)."""
    return (bits >> 8).astype(jnp.float32) * INV_2_24
