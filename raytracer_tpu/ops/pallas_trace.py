"""Fused path-tracing mega-kernel (Pallas TPU).

The jnp wavefront integrator (core/integrator.py) round-trips the full ray
state through HBM at every kernel boundary — ~100 XLA fusions per bounce.
This kernel is the TPU-native answer: a tile of rays lives ENTIRELY in
VMEM/vregs from camera ray generation through every bounce to the final
radiance write-back.  HBM traffic per ray is one (3,) radiance write, total;
the scene (geometry, material, light tables) is a few KB resident in VMEM.

Scope (static.pallas_ok, core/compile.py): solid-color materials
(Diffuse / Glossy / Refractive / Emissive), any mix of spheres / planes /
boxes / triangles (<= PALLAS_MAX_OBJECTS objects AND <= PALLAS_MAX_GROUPS
shading groups — the group count is the compiler's hard wall, see
compile.py), directional + point lights with shadow rays, spherical-cap
importance sampling.  Scenes with image textures /
environment maps / thin-film LUTs render through the jnp path (texture
gathers from HBM are not lane-addressable inside a TPU kernel).

Everything is unrolled over the *static* scene structure: the object list,
material bindings, light list and bounce count are compile-time constants
(SceneStatic.obj_records), so per-ray dispatch is pure mask selects on the
VPU — no gathers at all.

Randomness: the on-core PRNG (pltpu.prng_seed / prng_random_bits), seeded per
(tile, render-chunk).  Deterministic for a fixed seed; streams differ from the
jnp threefry path (both are valid samplers of the same estimator).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import lds
from ..materials.base import MAT_DIFFUSE, MAT_EMISSIVE, MAT_GLOSSY, MAT_REFRACTIVE
from ..utils.constants import (MISS_THRESHOLD, SKYBOX_DISTANCE, WAVELENGTHS_NM)

FARAWAY = 1.0e30
TILE_ROWS = 128            # rays per program = TILE_ROWS * 128
_INV_2_24 = lds.INV_2_24


def solid_tile_rows(static):
    """Rays-per-program rows for the solid kernel.

    128 rows for small scenes; 64 past 16 objects: the unrolled
    intersection sweep + shading blocks' live tile temporaries scale with
    the object count, and a 48-object glossy+refractive scene measured
    16.31M of scoped VMEM at 128 rows — 2% past Mosaic's 16M stack limit
    (R5 scripts/probe_group_gate.py; the r2 probe_obj_cap scene passed at
    the r2 kernel, the r5 kernel's extra live values tipped it).  Halving
    rows is estimator-identical (the global ray index is
    partition-independent) and measured perf-flat (probe_tile_rows r2:
    64/128/256 rows within 2%)."""
    return TILE_ROWS if static.n_objects <= 16 else TILE_ROWS // 2


# ---------------------------------------------------------------------------
# tile helpers
# ---------------------------------------------------------------------------


class _TileRng:
    """Counter-based per-ray RNG: murmur3 finalizer over (ray index, draw#, seed).

    Plain integer VPU ops — identical streams on hardware and in the Pallas
    interpreter (the on-core prng_random_bits primitive is TPU-only), and a
    unique stream per (ray, draw) with no cross-bounce state to carry.
    """

    def __init__(self, idx, seed):
        self.idx = idx.astype(jnp.uint32)
        self.seed = seed.astype(jnp.uint32)
        self.counter = 0

    def uniform(self):
        self.counter += 1
        x = self.idx * jnp.uint32(0x9E3779B1)
        x = x ^ (self.seed + jnp.uint32((self.counter * 0x85EBCA6B) & 0xFFFFFFFF))
        x = lds.mix32(x)
        # >>8 leaves 24 bits, so the int32 reinterpretation is non-negative
        # (Mosaic has no uint32->f32 cast)
        return pltpu.bitcast(x >> 8, jnp.int32).astype(jnp.float32) * _INV_2_24


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


# complex arithmetic on (re, im) tile pairs — Pallas has no complex dtype
def _cmul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _cdiv(a, b):
    d = jnp.maximum(b[0] * b[0] + b[1] * b[1], 1e-30)
    return (a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d


def _csqrt(a):
    mag = jnp.sqrt(a[0] * a[0] + a[1] * a[1])
    re = jnp.sqrt(jnp.maximum((mag + a[0]) * 0.5, 0.0))
    im = jnp.sqrt(jnp.maximum((mag - a[0]) * 0.5, 0.0))
    return re, jnp.where(a[1] < 0, -im, im)


def _cabs2(a):
    return a[0] * a[0] + a[1] * a[1]


def _atan2(y, x):
    """Polynomial atan2 (~1e-5 rad) — Mosaic has no atan2/asin lowering."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    a = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-30)
    s = a * a
    r = a * (0.9998660 + s * (-0.3302995 + s * (0.1801410
             + s * (-0.0851330 + s * 0.0208351))))
    r = jnp.where(ay > ax, (math.pi / 2) - r, r)
    r = jnp.where(x < 0, math.pi - r, r)
    return jnp.where(y < 0, -r, r)


def _asin(x):
    x = jnp.clip(x, -1.0, 1.0)
    return _atan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))


def _sincos_2pi(u):
    """(sin, cos) of 2*pi*u for u in [0, 1) — quarter-wave polynomials.

    Mosaic's sin/cos lowering measured 33.7 slot-equivalents EACH on this
    chip (scripts/vpu_peak.py, VPU_PEAK.json) — it pays for large-argument
    range reduction that phases drawn as uniforms never need.  One fold
    serves both outputs: ~30 single-cycle ops for the pair (sin |err| <=
    1.3e-8, cos <= 1.1e-7 — tighter than the kernels' existing polynomial
    atan2 at ~1e-5 rad).  R5 eqn diet."""
    t = u - jnp.floor(u)
    x4 = t * 4.0
    q = jnp.floor(x4)
    r = x4 - q                  # quarter-phase fraction in [0, 1)
    r2 = r * r
    s = r * (1.57079632 + r2 * (-0.64596375 + r2 * (0.07968996
             + r2 * (-0.00467430 + r2 * 0.00015179))))
    c = 0.99999996 + r2 * (-1.23369862 + r2 * (0.25365306
        + r2 * (-0.02081478 + r2 * 0.00086048)))
    q1, q2, q3 = q == 1.0, q == 2.0, q == 3.0
    sin_v = jnp.where(q1, c, jnp.where(q2, -s, jnp.where(q3, -c, s)))
    cos_v = jnp.where(q1, -s, jnp.where(q2, -c, jnp.where(q3, s, c)))
    return sin_v, cos_v


def _raygen(cam, px_i, py_i, width, height, u1, u2, u3, u4, projection,
            shape, diet=True):
    """Per-lane camera ray generation, all projections (core/camera.py
    generate_rays twin — same pixel/jitter conventions per projection, so
    kernels and the jnp wavefront consume the identical sample set; the
    angular projections use the polynomial atan2, directions agree to
    ~1e-5 rad).  cam: j -> cam_ref[0, j] accessor over the 17-float packed
    camera (origin, fwd, right, up, cam_w, cam_h, lens_r, focal, half_fov).
    Returns (ox, oy, oz, dx, dy, dz) tile planes."""
    o0x, o0y, o0z = cam(0), cam(1), cam(2)
    fwx, fwy, fwz = cam(3), cam(4), cam(5)
    rix, riy, riz = cam(6), cam(7), cam(8)
    upx, upy, upz = cam(9), cam(10), cam(11)
    cw, ch, lens_r, focal = cam(12), cam(13), cam(14), cam(15)
    zf = jnp.zeros(shape, jnp.float32)

    if projection in ("fisheye", "equirect"):
        # angular projections: pixel index -> direction; thin lens no-op
        half_fov = cam(16)
        col = px_i.astype(jnp.float32)
        grw = py_i.astype(jnp.float32)
        if projection == "fisheye":
            # circular equidistant (camera.py generate_rays fisheye branch)
            m = float(min(width, height))
            xn = (2.0 * (col + u1) - width) / m
            yn = (height - 2.0 * (grw + u2)) / m
            r = jnp.sqrt(xn * xn + yn * yn)
            theta = r * half_fov
            phi = _atan2(yn, xn)
            sin_t = jnp.sin(theta)
            cos_t = jnp.cos(theta)
            cp, sp = jnp.cos(phi), jnp.sin(phi)
            dx = cos_t * fwx + sin_t * cp * rix + sin_t * sp * upx
            dy = cos_t * fwy + sin_t * cp * riy + sin_t * sp * upy
            dz = cos_t * fwz + sin_t * cp * riz + sin_t * sp * upz
        else:
            # equirect 360x180: column -> azimuth around look_at's heading,
            # row -> elevation; directions in WORLD axes
            u_img = (col + u1) / width
            el = math.pi * (0.5 - (grw + u2) / height)
            phi0 = _atan2(fwz, fwx)
            phi = phi0 + (2.0 * math.pi) * (u_img - 0.5)
            rho = jnp.cos(el)
            dx = rho * jnp.cos(phi)
            dy = jnp.sin(el)
            dz = rho * jnp.sin(phi)
        return zf + o0x, zf + o0y, zf + o0z, dx, dy, dz

    x = (px_i.astype(jnp.float32) / (width - 1) - 0.5) * cw \
        + (u1 - 0.5) * (cw / width)
    y = (0.5 - py_i.astype(jnp.float32) / (height - 1)) * ch \
        + (u2 - 0.5) * (ch / height)
    if projection == "orthographic":
        # parallel rays along fwd over the pinhole's focal-plane footprint
        ox = o0x + rix * (x * focal) + upx * (y * focal)
        oy = o0y + riy * (x * focal) + upy * (y * focal)
        oz = o0z + riz * (x * focal) + upz * (y * focal)
        return ox, oy, oz, zf + fwx, zf + fwy, zf + fwz
    # pinhole + thin lens
    r_d = jnp.sqrt(u3)
    if diet:
        sp_d, cp_d = _sincos_2pi(u4)      # u4 IS the phase fraction
    else:
        phi_d = u4 * (2.0 * math.pi)
        cp_d, sp_d = jnp.cos(phi_d), jnp.sin(phi_d)
    rx = r_d * cp_d * lens_r
    ry = r_d * sp_d * lens_r
    ox = o0x + rix * rx + upx * ry
    oy = o0y + riy * rx + upy * ry
    oz = o0z + riz * rx + upz * ry
    tx = o0x + upx * (y * focal) + rix * (x * focal) + fwx * focal - ox
    ty = o0y + upy * (y * focal) + riy * (x * focal) + fwy * focal - oy
    tz = o0z + upz * (y * focal) + riz * (x * focal) + fwz * focal - oz
    dx, dy, dz = _normalize3(tx, ty, tz)
    return ox, oy, oz, dx, dy, dz


def _orthobasis(nx, ny, nz):
    """(u, v) orthonormal to n — reference random.py:63-66 construction."""
    big = jnp.abs(nx) > 0.9
    ax = jnp.where(big, 0.0, 1.0)
    ay = jnp.where(big, 1.0, 0.0)
    # v = n x a, normalized
    vx = ny * 0.0 - nz * ay
    vy = nz * ax - nx * 0.0
    vz = nx * ay - ny * ax
    vx, vy, vz = _normalize3(vx, vy, vz)
    # u = n x v
    ux = ny * vz - nz * vy
    uy = nz * vx - nx * vz
    uz = nx * vy - ny * vx
    return (ux, uy, uz), (vx, vy, vz)


# ---------------------------------------------------------------------------
# per-object intersection / normal formulas (scalar params, tile rays)
# ---------------------------------------------------------------------------


def _isect_sphere(g, ox, oy, oz, dx, dy, dz):
    cx, cy, cz, r = g[0], g[1], g[2], g[3]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    tca = -(dx * ocx + dy * ocy + dz * ocz)
    px, py, pz = ocx + tca * dx, ocy + tca * dy, ocz + tca * dz
    d2 = px * px + py * py + pz * pz
    disc = r * r - d2
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    h0, h1 = tca - sq, tca + sq
    h = jnp.where((h0 > 0) & (h0 < h1), h0, h1)
    ndd = ((ox + dx * h) - cx) * dx + ((oy + dy * h) - cy) * dy + ((oz + dz * h) - cz) * dz
    valid = (disc > 0) & (h > 0) & (ndd != 0)
    t = jnp.where(valid, h, FARAWAY)
    orient = jnp.where(ndd < 0, 1.0, -1.0)
    return t, orient


def _isect_plane(g, ox, oy, oz, dx, dy, dz, aa=None):
    cx, cy, cz = g[0], g[1], g[2]
    w2, h2 = g[12], g[13]
    if aa is not None:
        # axis-aligned frame (ObjRecord.aa): statically select components
        # instead of three full dot products — bit-identical to the
        # generic path (the dropped terms are exact *0/+0; |uu| makes the
        # u/v signs irrelevant).  ~22 tile-ops instead of ~48.
        (nax, nsg), (uax, usg), (vax, vsg) = aa
        o = (ox, oy, oz)
        d = (dx, dy, dz)
        c = (cx, cy, cz)
        ndd = d[nax] if nsg > 0 else -d[nax]
        ndd = jnp.where(ndd == 0.0, ndd + 1e-4, ndd)
        ndco = (c[nax] - o[nax]) if nsg > 0 else (o[nax] - c[nax])
        tt = ndco / ndd
        uu = o[uax] + d[uax] * tt - c[uax]
        vv = o[vax] + d[vax] * tt - c[vax]
        inside = ((jnp.abs(uu) <= w2) & (jnp.abs(vv) <= h2)
                  & (ndco * ndd > 0))
        t = jnp.where(inside, tt, FARAWAY)
        orient = jnp.where(ndd < 0, 1.0, -1.0)
        return t, orient
    ux, uy, uz = g[3], g[4], g[5]
    vx, vy, vz = g[6], g[7], g[8]
    nx, ny, nz = g[9], g[10], g[11]
    ndd = nx * dx + ny * dy + nz * dz
    ndd = jnp.where(ndd == 0.0, ndd + 1e-4, ndd)
    ndco = nx * (cx - ox) + ny * (cy - oy) + nz * (cz - oz)
    tt = ndco / ndd
    mx, my, mz = ox + dx * tt - cx, oy + dy * tt - cy, oz + dz * tt - cz
    uu = ux * mx + uy * my + uz * mz
    vv = vx * mx + vy * my + vz * mz
    # inside implies ndco*ndd > 0 implies tt > 0 — no abs needed on the
    # selected branch (bit-identical, one fewer tile op per plane)
    inside = (jnp.abs(uu) <= w2) & (jnp.abs(vv) <= h2) & (ndco * ndd > 0)
    t = jnp.where(inside, tt, FARAWAY)
    orient = jnp.where(ndd < 0, 1.0, -1.0)
    return t, orient


def _isect_box(g, ox, oy, oz, dx, dy, dz):
    b = g[:9]           # basis rows
    lbl = g[9:12]
    rtl = g[12:15]
    # local-frame origin/direction
    ol = [b[3 * i] * ox + b[3 * i + 1] * oy + b[3 * i + 2] * oz for i in range(3)]
    dl = [b[3 * i] * dx + b[3 * i + 1] * dy + b[3 * i + 2] * dz for i in range(3)]
    tmin = None
    tmax = None
    for i in range(3):
        inv = 1.0 / dl[i]
        t1 = (lbl[i] - ol[i]) * inv
        t2 = (rtl[i] - ol[i]) * inv
        lo, hi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
        tmin = lo if tmin is None else jnp.maximum(tmin, lo)
        tmax = hi if tmax is None else jnp.minimum(tmax, hi)
    miss = (tmax < 0) | (tmin > tmax)
    inside = tmin < 0
    t = jnp.where(miss, FARAWAY, jnp.where(inside, tmax, tmin))
    orient = jnp.where(inside, -1.0, 1.0)
    return t, orient


def _isect_tri(g, ox, oy, oz, dx, dy, dz):
    p1 = g[0:3]
    p2 = g[3:6]
    p3 = g[6:9]
    n = g[9:12]
    n31 = g[12:15]
    n12 = g[15:18]
    n23 = g[18:21]
    cx = (p1[0] + p2[0] + p3[0]) / 3.0
    cy = (p1[1] + p2[1] + p3[1]) / 3.0
    cz = (p1[2] + p2[2] + p3[2]) / 3.0
    ndd = n[0] * dx + n[1] * dy + n[2] * dz
    ndd = jnp.where(ndd == 0.0, ndd + 1e-4, ndd)
    ndco = n[0] * (cx - ox) + n[1] * (cy - oy) + n[2] * (cz - oz)
    tt = ndco / ndd
    mx, my, mz = ox + dx * tt, oy + dy * tt, oz + dz * tt
    inside = (
        (n31[0] * (mx - p1[0]) + n31[1] * (my - p1[1]) + n31[2] * (mz - p1[2]) >= 0)
        & (n12[0] * (mx - p2[0]) + n12[1] * (my - p2[1]) + n12[2] * (mz - p2[2]) >= 0)
        & (n23[0] * (mx - p3[0]) + n23[1] * (my - p3[1]) + n23[2] * (mz - p3[2]) >= 0)
        & (ndco * ndd > 0)
    )
    t = jnp.where(inside, tt, FARAWAY)   # inside => tt > 0 (as _isect_plane)
    orient = jnp.where(ndd < 0, 1.0, -1.0)
    return t, orient


def _isect_disc(g, ox, oy, oz, dx, dy, dz):
    """Disc/annulus (geometry/intersect.py intersect_discs twin).
    g: [center(3), normal(3), u_axis(3), v_axis(3), r_out, r_in]."""
    cx, cy, cz = g[0], g[1], g[2]
    nx, ny, nz = g[3], g[4], g[5]
    r_out, r_in = g[12], g[13]
    ndd = nx * dx + ny * dy + nz * dz
    ndd = jnp.where(ndd == 0.0, ndd + 1e-4, ndd)
    ndco = nx * (cx - ox) + ny * (cy - oy) + nz * (cz - oz)
    tt = ndco / ndd
    mx, my, mz = ox + dx * tt - cx, oy + dy * tt - cy, oz + dz * tt - cz
    rho2 = mx * mx + my * my + mz * mz
    hit = ((rho2 <= r_out * r_out) & (rho2 >= r_in * r_in)
           & (ndco * ndd > 0))
    t = jnp.where(hit, tt, FARAWAY)      # hit => tt > 0 (as _isect_plane)
    orient = jnp.where(ndd < 0, 1.0, -1.0)
    return t, orient


def _cyl_local(g, px, py, pz):
    """Hit point -> cylinder local coords (x radial-u, y axial, z radial-v)."""
    cx, cy, cz = g[0], g[1], g[2]
    mx, my, mz = px - cx, py - cy, pz - cz
    x = g[6] * mx + g[7] * my + g[8] * mz
    y = g[3] * mx + g[4] * my + g[5] * mz
    z = g[9] * mx + g[10] * my + g[11] * mz
    return x, y, z


def _isect_cyl(g, ox, oy, oz, dx, dy, dz):
    """Finite (optionally capped) cylinder (intersect_cylinders twin).
    g: [center(3), axis(3), u_axis(3), v_axis(3), radius, half_h, capped]."""
    r, hh, cap_on = g[12], g[13], g[14] > 0.5
    lox, loy, loz = _cyl_local(g, ox, oy, oz)
    ldx = g[6] * dx + g[7] * dy + g[8] * dz
    ldy = g[3] * dx + g[4] * dy + g[5] * dz
    ldz = g[9] * dx + g[10] * dy + g[11] * dz
    r2 = r * r

    a = ldx * ldx + ldz * ldz
    a_s = jnp.maximum(a, 1e-12)
    hb = lox * ldx + loz * ldz
    c = lox * lox + loz * loz - r2
    disc = hb * hb - a_s * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-hb - sq) / a_s
    t1 = (-hb + sq) / a_s
    side_ok = disc > 0

    def side_valid(t):
        y = loy + ldy * t
        return side_ok & (t > 0) & (jnp.abs(y) <= hh)

    ldy_s = jnp.where(jnp.abs(ldy) < 1e-12, 1e-12, ldy)

    def cap_t(y_plane):
        t = (y_plane - loy) / ldy_s
        x = lox + ldx * t
        z = loz + ldz * t
        return t, cap_on & (t > 0) & (x * x + z * z <= r2)

    t_top, v_top = cap_t(hh)
    t_bot, v_bot = cap_t(-hh)

    t = jnp.where(side_valid(t0), t0, FARAWAY)
    t = jnp.minimum(t, jnp.where(side_valid(t1), t1, FARAWAY))
    t = jnp.minimum(t, jnp.where(v_top, t_top, FARAWAY))
    t = jnp.minimum(t, jnp.where(v_bot, t_bot, FARAWAY))

    x = lox + ldx * t
    y = loy + ldy * t
    z = loz + ldz * t
    rho_hat = jnp.sqrt(jnp.maximum((x * x + z * z) / r2, 0.0))
    is_cap = cap_on & (jnp.abs(y) / hh >= rho_hat)
    nd = jnp.where(is_cap, jnp.sign(y) * ldy, x * ldx + z * ldz)
    orient = jnp.where(nd < 0, 1.0, -1.0)
    return t, orient


_ISECT = {"sphere": _isect_sphere, "plane": _isect_plane,
          "box": _isect_box, "tri": _isect_tri,
          "disc": _isect_disc, "cyl": _isect_cyl}


def _isect_for(rec, aa_planes=True):
    """Per-record intersector: planes with an axis-aligned frame take the
    static component-selected fast path (ObjRecord.aa).  aa_planes=False
    keeps the generic formula for A/B probes (bit-identical either way)."""
    if (aa_planes and rec.kind == "plane"
            and getattr(rec, "aa", None) is not None):
        return functools.partial(_isect_plane, aa=rec.aa)
    return _ISECT[rec.kind]


def _normal_for(rec, g, px, py, pz):
    if rec.kind == "sphere":
        inv_r = 1.0 / g[3]
        return (px - g[0]) * inv_r, (py - g[1]) * inv_r, (pz - g[2]) * inv_r
    if rec.kind == "plane":
        shp = px.shape
        return (jnp.full(shp, g[9]), jnp.full(shp, g[10]), jnp.full(shp, g[11]))
    if rec.kind == "tri":
        shp = px.shape
        return (jnp.full(shp, g[9]), jnp.full(shp, g[10]), jnp.full(shp, g[11]))
    if rec.kind == "disc":
        shp = px.shape
        return (jnp.full(shp, g[3]), jnp.full(shp, g[4]), jnp.full(shp, g[5]))
    if rec.kind == "cyl":
        # side radial / cap axial, classified by the intersector's rule
        # (geometry/attrs.py cylinder_attrs twin)
        r, hh, cap_on = g[12], g[13], g[14] > 0.5
        x, y, z = _cyl_local(g, px, py, pz)
        rho = jnp.sqrt(jnp.maximum(x * x + z * z, 1e-20))
        is_cap = cap_on & (jnp.abs(y) / hh >= rho / r)
        sy = jnp.sign(y)
        nx = jnp.where(is_cap, sy * g[3], (x * g[6] + z * g[9]) / rho)
        ny = jnp.where(is_cap, sy * g[4], (x * g[7] + z * g[10]) / rho)
        nz = jnp.where(is_cap, sy * g[5], (x * g[8] + z * g[11]) / rho)
        return nx, ny, nz
    # box: max-|axis| face normal in the local frame (reference cuboid.py:142-151)
    b = g[:9]
    cx, cy, cz = g[15], g[16], g[17]
    whl = g[18:21]
    mx, my, mz = px - cx, py - cy, pz - cz
    pl_ = [b[3 * i] * mx + b[3 * i + 1] * my + b[3 * i + 2] * mz for i in range(3)]
    ap = [jnp.abs(pl_[i]) / whl[i] for i in range(3)]
    pmax = jnp.maximum(jnp.maximum(ap[0], ap[1]), ap[2])
    nl = [jnp.where(pmax == ap[i], jnp.sign(pl_[i]), 0.0) for i in range(3)]
    nx = b[0] * nl[0] + b[3] * nl[1] + b[6] * nl[2]
    ny = b[1] * nl[0] + b[4] * nl[1] + b[7] * nl[2]
    nz = b[2] * nl[0] + b[5] * nl[1] + b[8] * nl[2]
    return nx, ny, nz


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_kernel(static, width, height, spp, max_bounces, n_pix, split_k=0,
                 lam=WAVELENGTHS_NM, sampler="iid", projection="pinhole",
                 merge_groups=True, diet=True, tile_rows=None,
                 aa_planes=True):
    records = static.obj_records
    # shading groups: objects sharing (material KIND, depth-cap, mc[, static
    # code shape]) shade together — ONE unrolled block per kind with per-lane
    # selection of the member materials' parameters.  Same-kind materials run
    # identical sampling/shading math (only the parameter table rows differ),
    # so merging slots into one block removes whole duplicated blocks from
    # the issue-bound kernel (R4.11; the kernel is VPU-issue-bound per the
    # roofline, so equation count is the wall).  Per-lane selection is
    # bit-identical per lane: group masks are disjoint and the RNG draws
    # were already shared across groups.
    groups = {}
    for i, rec in enumerate(records):
        extra = (bool(static.refr_disp[rec.mat_slot])
                 if rec.mat_type == MAT_REFRACTIVE else None)
        key = (rec.mat_type, rec.max_depth, rec.mc, extra)
        if not merge_groups:      # pre-merge grouping, kept for A/B probes
            key = key + (rec.mat_slot,)
        groups.setdefault(key, []).append(i)
    shadow_ids = [i for i, rec in enumerate(records) if rec.shadow]
    t_rows = tile_rows if tile_rows is not None else TILE_ROWS

    def kernel(seed_ref, cam_ref, geom_ref, dif_ref, glo_ref, refr_ref,
               emi_ref, light_ref, is_ref, const_ref, L_ref, cnt_ref):
        pid = pl.program_id(0)
        shape = (t_rows, 128)

        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        idx = (pid * t_rows + rows) * 128 + lanes
        rng = _TileRng(idx, seed_ref[0])
        pix = jnp.remainder(idx, n_pix)
        py_i = pix // width
        px_i = pix - py_i * width

        cam = lambda j: cam_ref[0, j]

        if sampler == "r2":
            # Cranley-Patterson-rotated R2 lattice (core/lds.py): the SAME
            # bit math as the jnp wavefront, so both paths see the identical
            # camera sample set; Mosaic needs the int32 bitcast for the
            # bits->float step (no uint32->f32 cast)
            su = (idx // n_pix + seed_ref[2]).astype(jnp.uint32)
            pixu = pix.astype(jnp.uint32)
            to_f = lambda b: pltpu.bitcast(
                b >> 8, jnp.int32).astype(jnp.float32) * _INV_2_24
            # camera AA / lens / first-diffuse-bounce draws, one shared
            # definition (lds.raygen_draws) so kernels and wavefront agree
            u1, u2, u3, u4, sb_mix, sb_phi, sb_r2 = lds.raygen_draws(
                pixu, su, seed_ref[1], to_f)
        else:
            u1 = rng.uniform()
            u2 = rng.uniform()
            u3 = rng.uniform()
            u4 = rng.uniform()
            sb_mix = sb_phi = sb_r2 = None
        ox, oy, oz, dx, dy, dz = _raygen(cam, px_i, py_i, width, height,
                                         u1, u2, u3, u4, projection, shape,
                                         diet=diet)

        c = lambda j: const_ref[0, j]
        ambient = (c(0), c(1), c(2))
        scene_nre = (c(3), c(4), c(5))
        scene_nim = (c(6), c(7), c(8))

        f0 = jnp.zeros(shape, jnp.float32)
        Lx, Ly, Lz = f0, f0, f0
        bx = jnp.ones(shape, jnp.float32)
        by, bz_ = bx, bx
        nre = [jnp.full(shape, scene_nre[k]) for k in range(3)]
        nim = [jnp.full(shape, scene_nim[k]) for k in range(3)]
        alive = jnp.ones(shape, bool)
        depth = jnp.zeros(shape, jnp.int32)
        dcnt = jnp.zeros(shape, jnp.int32)
        scnt = jnp.zeros(shape, jnp.int32)
        # deterministic Fresnel-split pattern: sample index mod 2^split_k
        # (same enumeration as core/integrator.py; spp is a multiple of the
        # block so each pixel covers every pattern equally)
        pattern = jnp.remainder(idx // n_pix, 1 << split_k) if split_k else None
        count = jnp.zeros((), jnp.int32)

        grow = [[geom_ref[i, j] for j in range(24)] for i in range(len(records))]

        def nearest(ox, oy, oz, dx, dy, dz):
            best_t = jnp.full(shape, FARAWAY)
            best_o = jnp.ones(shape, jnp.float32)
            best_id = jnp.full(shape, -1, jnp.int32)
            for i, rec in enumerate(records):
                t_i, o_i = _isect_for(rec, aa_planes)(grow[i], ox, oy, oz, dx, dy, dz)
                better = t_i < best_t
                best_t = jnp.where(better, t_i, best_t)
                best_o = jnp.where(better, o_i, best_o)
                best_id = jnp.where(better, i, best_id)
            return best_t, best_o, best_id

        for bounce in range(max_bounces):
            # the FINAL bounce's continuation state (sampled directions,
            # throughput updates, new origins/media) is dead — the loop
            # ends and only `add` reaches L.  Whole blocks whose sole
            # effect is the continuation (diffuse, refractive) are skipped
            # on it, as are the normals when no block left needs them
            # (R5 eqn diet; Mosaic DCE would remove SOME of this after
            # lowering, but the traced-eqn count is also the compile-time
            # and scheduling wall)
            last = diet and (bounce == max_bounces - 1)
            t, orient, obj = nearest(ox, oy, oz, dx, dy, dz)
            miss = t >= MISS_THRESHOLD
            hit = alive & ~miss
            count = count + jnp.sum(alive.astype(jnp.int32))

            px = ox + dx * t
            py = oy + dy * t
            pz = oz + dz * t

            # on the last bounce, normals only matter to glossy's direct
            # lighting (emissive reads none; diffuse/refractive are dead)
            need_normals = (not last) or any(
                k[0] == MAT_GLOSSY for k in groups)
            nx = jnp.zeros(shape, jnp.float32)
            ny = jnp.zeros(shape, jnp.float32)
            nz = jnp.zeros(shape, jnp.float32)
            if need_normals:
                for i, rec in enumerate(records):
                    nxi, nyi, nzi = _normal_for(rec, grow[i], px, py, pz)
                    m = obj == i
                    nx = jnp.where(m, nxi, nx)
                    ny = jnp.where(m, nyi, ny)
                    nz = jnp.where(m, nzi, nz)
                nx, ny, nz = nx * orient, ny * orient, nz * orient

            eps = 1e-6 * jnp.maximum(
                1.0, jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py), jnp.abs(pz))))

            # accumulators for this bounce's state transition
            new_alive = jnp.zeros(shape, bool)
            add = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
            bmul = [jnp.ones(shape, jnp.float32) for _ in range(3)]
            ndx, ndy, ndz = dx, dy, dz
            nox, noy, noz = px, py, pz
            new_nre = list(nre)
            new_nim = list(nim)
            inc_d = jnp.zeros(shape, bool)

            # pre-draw the per-bounce random numbers (shared across groups —
            # each ray belongs to exactly one group).  The last bounce's
            # draws feed only the skipped continuation blocks; skipping
            # them moves no other draw (the counter is per-draw static).
            ru = [None] * 6 if last else [rng.uniform() for _ in range(6)]

            for gkey, ids in groups.items():
                mt, maxd, mc, extra = gkey[:4]
                if last and mt in (MAT_DIFFUSE, MAT_REFRACTIVE):
                    continue     # contribution is continuation-only
                if diet and mt == MAT_REFRACTIVE and bounce >= maxd:
                    # alive lanes at bounce b carry depth == b EXACTLY
                    # (depth increments once per survived transition), so
                    # the depth-cap test `depth < maxd` is python-static —
                    # past the cap this block's only effect (the
                    # continuation) is provably dead for every lane.
                    # Cornell: the glass sphere's maxd=3 kills its block
                    # on bounces 3+ (R5 eqn diet).
                    continue
                mmasks = [obj == i for i in ids]
                g = mmasks[0]
                for m_i in mmasks[1:]:
                    g = g | m_i
                g = g & hit
                # unique member slots + their lane masks for per-lane
                # parameter selection; single-slot groups read plain scalars
                # (identical code to the pre-merge per-slot kernel)
                slots, slot_masks = [], []
                for i, m_i in zip(ids, mmasks):
                    s = records[i].mat_slot
                    if s in slots:
                        ks = slots.index(s)
                        slot_masks[ks] = slot_masks[ks] | m_i
                    else:
                        slots.append(s)
                        slot_masks.append(m_i)

                def param(ref, j, _slots=slots, _masks=slot_masks):
                    v = ref[_slots[0], j]
                    if len(_slots) == 1:
                        return v
                    out = jnp.full(shape, v)
                    for s, ms in zip(_slots[1:], _masks[1:]):
                        out = jnp.where(ms, ref[s, j], out)
                    return out

                if mt == MAT_EMISSIVE:
                    col = [param(emi_ref, k) for k in range(3)]
                    for k in range(3):
                        add[k] = jnp.where(g, col[k], add[k])
                    # terminal: new_alive stays False for g

                elif mt == MAT_DIFFUSE:
                    col = [param(dif_ref, k) for k in range(3)]
                    aw = param(dif_ref, 3)
                    nux, nuy, nuz = px + nx * eps, py + ny * eps, pz + nz * eps
                    ax_u, ax_v = _orthobasis(nx, ny, nz)
                    # stratified lattice draws override the hash draws at
                    # the FIRST diffuse bounce (mirrors shade_diffuse: one
                    # (mix, phi, r2) set per ray, shared by both branches)
                    u_phi1, u_r21 = ru[0], ru[1]
                    u_phi2, u_r22 = ru[3], ru[4]
                    u_mixv = ru[5]
                    if sb_mix is not None:
                        fd = dcnt == 0
                        u_phi1 = jnp.where(fd, sb_phi, u_phi1)
                        u_r21 = jnp.where(fd, sb_r2, u_r21)
                        u_phi2 = jnp.where(fd, sb_phi, u_phi2)
                        u_r22 = jnp.where(fd, sb_r2, u_r22)
                        u_mixv = jnp.where(fd, sb_mix, u_mixv)
                    # cosine lobe sample
                    r2 = u_r21
                    zc = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
                    sr2 = jnp.sqrt(r2)       # hoisted (was traced twice)
                    if diet:
                        sphi, cphi = _sincos_2pi(u_phi1)
                    else:
                        phi = u_phi1 * (2.0 * math.pi)
                        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
                    xc = cphi * sr2
                    yc = sphi * sr2
                    cdx = ax_u[0] * xc + ax_v[0] * yc + nx * zc
                    cdy = ax_u[1] * xc + ax_v[1] * yc + ny * zc
                    cdz = ax_u[2] * xc + ax_v[2] * yc + nz * zc
                    K = static.n_is_targets
                    if K > 0:
                        # spherical-cap sample toward a uniformly-picked target
                        pick = jnp.minimum((ru[2] * K).astype(jnp.int32), K - 1)
                        wxs, cms = [], []
                        for kk in range(K):
                            tcx, tcy, tcz, tr = (is_ref[kk, 0], is_ref[kk, 1],
                                                 is_ref[kk, 2], is_ref[kk, 3])
                            wx, wy, wz = tcx - nux, tcy - nuy, tcz - nuz
                            dist = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-20))
                            wx, wy, wz = wx / dist, wy / dist, wz / dist
                            sin_m = jnp.clip(tr / dist, 0.0, 1.0)
                            cm = jnp.sqrt(jnp.maximum(1.0 - sin_m * sin_m, 0.0))
                            wxs.append((wx, wy, wz))
                            cms.append(cm)
                        # select the picked cap
                        swx = wxs[0][0]; swy = wxs[0][1]; swz = wxs[0][2]; scm = cms[0]
                        for kk in range(1, K):
                            m = pick == kk
                            swx = jnp.where(m, wxs[kk][0], swx)
                            swy = jnp.where(m, wxs[kk][1], swy)
                            swz = jnp.where(m, wxs[kk][2], swz)
                            scm = jnp.where(m, cms[kk], scm)
                        (cu, cv) = _orthobasis(swx, swy, swz)
                        zq = 1.0 + u_r22 * (scm - 1.0)
                        sq = jnp.sqrt(jnp.maximum(1.0 - zq * zq, 0.0))
                        # hoisted: cos/sin(phi2)*sq were traced 3x each
                        if diet:
                            sphi2, cphi2 = _sincos_2pi(u_phi2)
                        else:
                            phi2 = u_phi2 * (2.0 * math.pi)
                            cphi2 = jnp.cos(phi2)
                            sphi2 = jnp.sin(phi2)
                        cps = cphi2 * sq
                        sps = sphi2 * sq
                        qdx = cu[0] * cps + cv[0] * sps + swx * zq
                        qdy = cu[1] * cps + cv[1] * sps + swy * zq
                        qdz = cu[2] * cps + cv[2] * sps + swz * zq
                        use_cos = u_mixv < aw
                        sdx = jnp.where(use_cos, cdx, qdx)
                        sdy = jnp.where(use_cos, cdy, qdy)
                        sdz = jnp.where(use_cos, cdz, qdz)
                        # mixture pdf at the sampled direction
                        ndl = jnp.clip(sdx * nx + sdy * ny + sdz * nz, 0.0, 1.0)
                        pdf_cos = ndl / math.pi
                        pdf_cap = jnp.zeros(shape, jnp.float32)
                        for kk in range(K):
                            cosk = sdx * wxs[kk][0] + sdy * wxs[kk][1] + sdz * wxs[kk][2]
                            inside = cosk > cms[kk]
                            pdf_cap = pdf_cap + jnp.where(
                                inside, 1.0 / ((1.0 - cms[kk]) * 2.0 * math.pi), 0.0)
                        pdf_cap = pdf_cap / K
                        pdf = aw * pdf_cos + (1.0 - aw) * pdf_cap
                    else:
                        sdx, sdy, sdz = cdx, cdy, cdz
                        ndl = jnp.clip(sdx * nx + sdy * ny + sdz * nz, 0.0, 1.0)
                        pdf = ndl / math.pi
                    w = ndl / jnp.maximum(pdf, 1e-9) / math.pi
                    cont = (dcnt < 2)
                    gc = g & cont
                    for k in range(3):
                        bmul[k] = jnp.where(gc, col[k] * w, bmul[k])
                    ndx = jnp.where(gc, sdx, ndx)
                    ndy = jnp.where(gc, sdy, ndy)
                    ndz = jnp.where(gc, sdz, ndz)
                    nox = jnp.where(gc, nux, nox)
                    noy = jnp.where(gc, nuy, noy)
                    noz = jnp.where(gc, nuz, noz)
                    inc_d = inc_d | gc
                    new_alive = new_alive | gc

                elif mt == MAT_REFRACTIVE:
                    m_re = [param(refr_ref, k) for k in range(3)]
                    m_im = [param(refr_ref, k + 3) for k in range(3)]
                    cos_i = -(dx * nx + dy * ny + dz * nz)          # V.N
                    entering = orient > 0
                    F = []
                    n2r_l, n2i_l = [], []
                    for k in range(3):
                        n1 = (nre[k], nim[k])
                        n2r = jnp.where(entering, m_re[k], scene_nre[k])
                        n2i = jnp.where(entering, m_im[k], scene_nim[k])
                        n2 = (n2r, n2i)
                        ratio = _cdiv(n1, n2)
                        r2 = _cmul(ratio, ratio)
                        s2 = (1.0 - cos_i * cos_i)
                        cos_t = _csqrt((1.0 - r2[0] * s2, -r2[1] * s2))
                        a = (n1[0] * cos_i, n1[1] * cos_i)
                        bt = _cmul(n2, cos_t)
                        at = _cmul(n1, cos_t)
                        bb = (n2[0] * cos_i, n2[1] * cos_i)
                        if diet:
                            # |num/den|^2 == |num|^2 / |den|^2 — skip the
                            # two complex divisions (12 tile-ops each); the
                            # kernel is VPU-issue-bound so traced tile ops
                            # ARE the wall (R5 eqn diet; estimator-exact,
                            # rounding-level difference only)
                            F_per = (_cabs2((a[0] - bt[0], a[1] - bt[1]))
                                     / jnp.maximum(_cabs2((a[0] + bt[0],
                                                           a[1] + bt[1])),
                                                   1e-30))
                            F_par = (_cabs2((bb[0] - at[0], bb[1] - at[1]))
                                     / jnp.maximum(_cabs2((at[0] + bb[0],
                                                           at[1] + bb[1])),
                                                   1e-30))
                            F.append((F_per + F_par) * 0.5)
                        else:
                            r_per = _cdiv((a[0] - bt[0], a[1] - bt[1]),
                                          (a[0] + bt[0], a[1] + bt[1]))
                            r_par = _cdiv((bb[0] - at[0], bb[1] - at[1]),
                                          (at[0] + bb[0], at[1] + bb[1]))
                            F.append((_cabs2(r_per) + _cabs2(r_par)) * 0.5)
                        n2r_l.append(n2r)
                        n2i_l.append(n2i)
                    T = [1.0 - F[k] for k in range(3)]
                    # spectral dispersion (static per slot): transmitted
                    # paths refract at ONE uniformly-chosen channel's IoR
                    # and carry 3x that channel's throughput — the same
                    # hero-wavelength estimator as shade_refractive
                    disp = bool(extra)  # static per merged group (key)
                    if disp:
                        hu = rng.uniform()
                        h0 = hu < (1.0 / 3.0)
                        h1 = (hu >= (1.0 / 3.0)) & (hu < (2.0 / 3.0))
                        hero = (h0, h1, ~(h0 | h1))
                        rat = [nre[k] / jnp.maximum(n2r_l[k], 1e-9)
                               for k in range(3)]
                        ratio_avg = jnp.where(h0, rat[0],
                                              jnp.where(h1, rat[1], rat[2]))
                    else:
                        ratio_avg = (nre[0] / jnp.maximum(n2r_l[0], 1e-9)
                                     + nre[1] / jnp.maximum(n2r_l[1], 1e-9)
                                     + nre[2] / jnp.maximum(n2r_l[2], 1e-9)) / 3.0
                    sin2t = ratio_avg * ratio_avg * (1.0 - cos_i * cos_i)
                    non_tir = sin2t <= 1.0
                    croot = jnp.sqrt(1.0 - jnp.clip(sin2t, 0.0, 1.0))
                    rfx = dx * ratio_avg + nx * (ratio_avg * cos_i - croot)
                    rfy = dy * ratio_avg + ny * (ratio_avg * cos_i - croot)
                    rfz = dz * ratio_avg + nz * (ratio_avg * cos_i - croot)
                    rfx, rfy, rfz = _normalize3(rfx, rfy, rfz)
                    ddn = dx * nx + dy * ny + dz * nz
                    rlx = dx - nx * (2.0 * ddn)
                    rly = dy - ny * (2.0 * ddn)
                    rlz = dz - nz * (2.0 * ddn)
                    rlx, rly, rlz = _normalize3(rlx, rly, rlz)
                    T_avg = (T[0] + T[1] + T[2]) / 3.0
                    p_refr = jnp.where(non_tir, jnp.clip(T_avg, 0.0, 1.0), 0.0)
                    take_refr = (ru[0] < p_refr) & non_tir
                    if diet:
                        # fold the python-float constant chain (-2 * 2pi/lam
                        # * 1e9) before it touches a tile: 3 tile-ops per
                        # channel instead of 5
                        absorb = [jnp.exp(nim[k]
                                          * ((-4.0 * math.pi / lam[k]) * 1e9
                                             * t))
                                  for k in range(3)]
                    else:
                        absorb = [jnp.exp(-2.0 * nim[k]
                                          * (2.0 * math.pi / lam[k]) * 1e9 * t)
                                  for k in range(3)]
                    # depth == bounce for alive lanes (see the static
                    # group skip above), so under diet the cap test is
                    # free: this block only traces when bounce < maxd
                    cont = None if diet else (depth < maxd)
                    if split_k and not mc:
                        # deterministic branch from the pattern bit, weight
                        # 2F / 2T (half of each pattern block takes each
                        # branch) — core/integrator.py has the derivation
                        det = scnt < split_k
                        bit = jnp.bitwise_and(
                            jnp.right_shift(pattern, scnt), 1) == 1
                        # mask logic, not where(): Mosaic cannot select
                        # between mixed-width bool vectors (i8 vs i1)
                        take_refr = ((det & bit & non_tir)
                                     | (~det & take_refr))
                        kill = det & bit & ~non_tir
                        cont = ~kill if cont is None else (cont & ~kill)
                    gc = g if cont is None else (g & cont)
                    if split_k and not mc:
                        scnt = scnt + (gc & det).astype(jnp.int32)
                    for k in range(3):
                        if split_k and not mc:
                            w_r = jnp.where(det, 2.0 * T[k],
                                            T[k] / jnp.maximum(p_refr, 1e-9))
                            w_l = jnp.where(det, 2.0 * F[k],
                                            F[k] / jnp.maximum(1.0 - p_refr, 1e-9))
                        else:
                            w_r = T[k] / jnp.maximum(p_refr, 1e-9)
                            w_l = F[k] / jnp.maximum(1.0 - p_refr, 1e-9)
                        if disp:
                            # hero channel carries 3x, the others zero; the
                            # channel-independent mirror branch is untouched
                            w_r = w_r * jnp.where(hero[k], 3.0, 0.0)
                        bmul[k] = jnp.where(gc, absorb[k] * jnp.where(take_refr, w_r, w_l),
                                            bmul[k])
                        new_nre[k] = jnp.where(gc & take_refr, n2r_l[k], new_nre[k])
                        new_nim[k] = jnp.where(gc & take_refr, n2i_l[k], new_nim[k])
                    ndx = jnp.where(gc, jnp.where(take_refr, rfx, rlx), ndx)
                    ndy = jnp.where(gc, jnp.where(take_refr, rfy, rly), ndy)
                    ndz = jnp.where(gc, jnp.where(take_refr, rfz, rlz), ndz)
                    sgn = jnp.where(take_refr, -1.0, 1.0)
                    nox = jnp.where(gc, px + nx * eps * sgn, nox)
                    noy = jnp.where(gc, py + ny * eps * sgn, noy)
                    noz = jnp.where(gc, pz + nz * eps * sgn, noz)
                    new_alive = new_alive | gc

                elif mt == MAT_GLOSSY:
                    col = [param(glo_ref, k) for k in range(3)]
                    g_re = [param(glo_ref, 3 + k) for k in range(3)]
                    g_im = [param(glo_ref, 6 + k) for k in range(3)]
                    rough = param(glo_ref, 9)
                    spec_c = param(glo_ref, 10)
                    diff_c = param(glo_ref, 11)
                    dc = [col[k] * diff_c for k in range(3)]
                    vx, vy, vz = -dx, -dy, -dz
                    nux, nuy, nuz = px + nx * eps, py + ny * eps, pz + nz * eps
                    acc = [ambient[k] * dc[k] for k in range(3)]
                    n_lights = (static.n_dir_lights + static.n_point_lights
                                + static.n_spot_lights)
                    for li in range(n_lights):
                        lx_, ly_, lz_ = light_ref[li, 0], light_ref[li, 1], light_ref[li, 2]
                        lr, lg, lb = light_ref[li, 3], light_ref[li, 4], light_ref[li, 5]
                        is_point = li >= static.n_dir_lights
                        is_spot = li >= static.n_dir_lights + static.n_point_lights
                        if is_point:
                            wx, wy, wz = lx_ - px, ly_ - py, lz_ - pz
                            dist = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-20))
                            lxn, lyn, lzn = wx / dist, wy / dist, wz / dist
                        else:
                            lxn = jnp.full(shape, lx_)
                            lyn = jnp.full(shape, ly_)
                            lzn = jnp.full(shape, lz_)
                            dist = jnp.full(shape, SKYBOX_DISTANCE)
                        ndl = jnp.maximum(nx * lxn + ny * lyn + nz * lzn, 0.0)
                        if is_point:
                            fall = ndl / (dist * dist) * 100.0
                            if is_spot:
                                # point falloff x smooth cone factor
                                # (materials/shade.py spot-light twin)
                                sdx, sdy, sdz = (light_ref[li, 6],
                                                 light_ref[li, 7],
                                                 light_ref[li, 8])
                                ci, co = light_ref[li, 9], light_ref[li, 10]
                                cos_t = -(lxn * sdx + lyn * sdy + lzn * sdz)
                                tt = jnp.clip((cos_t - co)
                                              / jnp.maximum(ci - co, 1e-6),
                                              0.0, 1.0)
                                fall = fall * (tt * tt * (3.0 - 2.0 * tt))
                            lv = [lr * fall, lg * fall, lb * fall]
                        else:
                            lv = [lr * ndl, lg * ndl, lb * ndl]
                        # shadow: any shadow-flagged object closer than the light
                        occ = jnp.zeros(shape, bool)
                        for si in shadow_ids:
                            t_s, _ = _isect_for(records[si], aa_planes)(
                                grow[si], nux, nuy, nuz, lxn, lyn, lzn)
                            occ = occ | (t_s < dist)
                        see = 1.0 - occ.astype(jnp.float32)
                        for k in range(3):
                            acc[k] = acc[k] + dc[k] * lv[k] * see
                        # Blinn-Phong specular (skipped entirely when the
                        # material's roughness is 0, reference glossy.py:62)
                        hx, hy, hz = _normalize3(lxn + vx, lyn + vy, lzn + vz)
                        F0s = []
                        for k in range(3):
                            num = _cabs2((nre[k] - g_re[k], nim[k] - g_im[k]))
                            den = jnp.maximum(_cabs2((nre[k] + g_re[k], nim[k] + g_im[k])), 1e-20)
                            F0s.append(num / den)
                        cos_vh = jnp.clip(vx * hx + vy * hy + vz * hz, 0.0, 1.0)
                        p5 = (1.0 - cos_vh) ** 5
                        a_ph = 2.0 / jnp.maximum(rough, 1e-6) ** 2 - 2.0
                        dph = jnp.clip(nx * hx + ny * hy + nz * hz, 0.0, 1.0) ** a_ph \
                            * (a_ph + 2.0) / (2.0 * math.pi)
                        denom = 4.0 * jnp.clip((nx * vx + ny * vy + nz * vz) * ndl, 0.001, 1.0)
                        sw = jnp.where(rough != 0.0, dph / denom * see * spec_c, 0.0)
                        for k in range(3):
                            Fk = F0s[k] + (1.0 - F0s[k]) * p5
                            acc[k] = acc[k] + Fk * sw * lv[k]
                    for k in range(3):
                        add[k] = jnp.where(g, acc[k], add[k])
                    if last:
                        continue     # mirror continuation is dead here
                    if diet and bounce >= maxd:
                        continue     # depth == bounce: statically capped
                    # mirror continuation vs the scene medium (glossy.py:87-104)
                    cos_vn = jnp.clip(vx * nx + vy * ny + vz * nz, 0.0, 1.0)
                    p5r = (1.0 - cos_vn) ** 5
                    ddn = dx * nx + dy * ny + dz * nz
                    rlx, rly, rlz = _normalize3(dx - nx * 2.0 * ddn,
                                                dy - ny * 2.0 * ddn,
                                                dz - nz * 2.0 * ddn)
                    gc = g if diet else (g & (depth < maxd))
                    for k in range(3):
                        num = _cabs2((scene_nre[k] - g_re[k], scene_nim[k] - g_im[k]))
                        den = jnp.maximum(
                            _cabs2((scene_nre[k] + g_re[k], scene_nim[k] + g_im[k])), 1e-20)
                        F0 = num / den
                        bmul[k] = jnp.where(gc, F0 + (1.0 - F0) * p5r, bmul[k])
                    ndx = jnp.where(gc, rlx, ndx)
                    ndy = jnp.where(gc, rly, ndy)
                    ndz = jnp.where(gc, rlz, ndz)
                    nox = jnp.where(gc, nux, nox)
                    noy = jnp.where(gc, nuy, noy)
                    noz = jnp.where(gc, nuz, noz)
                    new_alive = new_alive | gc

            # radiance + state update (post-loop, only L and the cnt sum
            # are read — the final bounce's ray-state update is dead)
            Lx = Lx + jnp.where(hit, bx * add[0], 0.0)
            Ly = Ly + jnp.where(hit, by * add[1], 0.0)
            Lz = Lz + jnp.where(hit, bz_ * add[2], 0.0)
            if last:
                continue
            bx = jnp.where(new_alive, bx * bmul[0], bx)
            by = jnp.where(new_alive, by * bmul[1], by)
            bz_ = jnp.where(new_alive, bz_ * bmul[2], bz_)
            ox = jnp.where(new_alive, nox, ox)
            oy = jnp.where(new_alive, noy, oy)
            oz = jnp.where(new_alive, noz, oz)
            dx = jnp.where(new_alive, ndx, dx)
            dy = jnp.where(new_alive, ndy, dy)
            dz = jnp.where(new_alive, ndz, dz)
            for k in range(3):
                nre[k] = jnp.where(new_alive, new_nre[k], nre[k])
                nim[k] = jnp.where(new_alive, new_nim[k], nim[k])
            if not diet:
                # under diet the depth-cap tests are python-static (depth
                # == bounce for alive lanes) and nothing reads `depth`
                depth = depth + new_alive.astype(jnp.int32)
            dcnt = dcnt + (new_alive & inc_d).astype(jnp.int32)
            alive = new_alive

        L_ref[0, :, :] = Lx
        L_ref[1, :, :] = Ly
        L_ref[2, :, :] = Lz
        cnt_ref[...] = jnp.full((1, 8, 128), count, jnp.int32)

    return kernel


# ---------------------------------------------------------------------------
# host-side glue
# ---------------------------------------------------------------------------


def _pad_rows(a, min_rows=1):
    if a.shape[0] == 0:
        return jnp.zeros((min_rows,) + a.shape[1:], a.dtype)
    return a


def _light_table(lt):
    """(L, 11) packed light rows for the kernels: [pos_or_dir(3), color(3),
    spot_dir(3), cos_inner, cos_outer] — directional rows first, then point,
    then spot (the kernels' unrolled loops classify by static light counts;
    the trailing 5 floats are zero for dir/point rows)."""
    nd = lt.dir_l.shape[0]
    npt = lt.point_pos.shape[0]
    ns = lt.spot_pos.shape[0]
    if nd + npt + ns == 0:
        return jnp.zeros((1, 11), jnp.float32)
    z = lambda n: jnp.zeros((n, 5), jnp.float32)
    return jnp.concatenate([
        jnp.concatenate([lt.dir_l, lt.dir_color, z(nd)], axis=1),
        jnp.concatenate([lt.point_pos, lt.point_color, z(npt)], axis=1),
        jnp.concatenate([lt.spot_pos, lt.spot_color, lt.spot_dir,
                         lt.spot_cos_in[:, None], lt.spot_cos_out[:, None]],
                        axis=1),
    ], axis=0)


@functools.partial(jax.jit, static_argnames=("static", "width", "height",
                                             "spp", "max_bounces", "interpret",
                                             "split_k", "sampler",
                                             "projection", "merge_groups",
                                             "diet", "aa_planes"))
def pallas_trace_chunk(seed, data, cam_vec, static, width, height, spp,
                       max_bounces, interpret=False, split_k=0,
                       sampler="iid", projection="pinhole",
                       merge_groups=True, diet=True, aa_planes=True):
    """Trace one spp-chunk with the mega-kernel.

    seed: int32 scalar array, or (3,) [chunk seed, R2 rotation seed, global
    index of the chunk's first sample] when sampler="r2" (core/lds.py);
    cam_vec: (17,) f32 (see _raygen; trailing half_fov used by the angular
    projections).
    split_k: deterministic Fresnel-split levels (RenderSettings.split_k);
    spp must then be a multiple of 2^split_k.
    Returns (L (spp*H*W, 3) float32, rays_traced int32 scalar).
    """
    n_pix = width * height
    n = spp * n_pix
    R = -(-n // 128)
    TR = solid_tile_rows(static)
    G = -(-R // TR)

    mats = data.mats
    dif = jnp.concatenate([_pad_rows(mats.diffuse_color),
                           _pad_rows(mats.diffuse_ambient_weight[:, None])], axis=1)
    glo = jnp.concatenate([
        _pad_rows(mats.glossy_color), _pad_rows(mats.glossy_n_re),
        _pad_rows(mats.glossy_n_im), _pad_rows(mats.glossy_roughness[:, None]),
        _pad_rows(mats.glossy_spec[:, None]), _pad_rows(mats.glossy_diff[:, None])],
        axis=1)
    refr = jnp.concatenate([_pad_rows(mats.refr_n_re),
                            _pad_rows(mats.refr_n_im)], axis=1)
    emi = _pad_rows(mats.emissive_color)
    lights = _light_table(data.lights)
    is_tab = (jnp.concatenate([data.is_center, data.is_radius[:, None]], axis=1)
              if data.is_center.shape[0] else jnp.zeros((1, 4), jnp.float32))
    consts = jnp.concatenate([data.ambient_color, data.scene_n_re,
                              data.scene_n_im,
                              jnp.zeros(7, jnp.float32)])[None, :]

    kernel = _make_kernel(static, width, height, spp, max_bounces, n_pix,
                          split_k, sampler=sampler, projection=projection,
                          merge_groups=merge_groups, diet=diet,
                          tile_rows=TR, aa_planes=aa_planes)
    rep = lambda *shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                                    memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # seed (3,)
            rep(1, 17),                                      # cam
            rep(*data.pallas_geom.shape),                    # geom
            rep(*dif.shape), rep(*glo.shape), rep(*refr.shape), rep(*emi.shape),
            rep(*lights.shape), rep(*is_tab.shape), rep(1, 16),
        ],
        out_specs=[
            pl.BlockSpec((3, TR, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # per-program ray counter, replicated across one (8, 128) tile
            # (SMEM scalar outputs don't lower on hardware)
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, G * TR, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        ],
        # TPU-semantics interpreter (supports prng_seed etc.) runs the CPU
        # test suite; plain interpret=True lacks the TPU primitives
        interpret=(pltpu.InterpretParams() if interpret else False),
    )
    seed = jnp.atleast_1d(seed)
    if seed.shape[0] < 3:      # scalar-seed callers: zero lattice state
        seed = jnp.concatenate([seed, jnp.zeros(3 - seed.shape[0],
                                                seed.dtype)])
    L, cnt = call(seed, cam_vec[None, :], data.pallas_geom, dif,
                  glo, refr, emi, lights, is_tab, consts)
    L = L.reshape(3, G * TR * 128)[:, :n].T
    return L, cnt[:, 0, 0].sum()
