"""Pinhole / thin-lens camera and jit-compatible ray generation.

Reference: sightpy/camera.py.  The camera splits into a host-side config
(`Camera`, same constructor kwargs as the reference) and a traced parameter
pytree (`CameraParams`) so animating the camera does NOT recompile the
render program — frames reuse one XLA executable with new parameter arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import NUDGE_EPS  # noqa: F401  (re-exported constants namespace)
from . import lds, rng
from .vec import as_float3


@jax.tree_util.register_dataclass
@dataclass
class CameraParams:
    origin: Any        # (3,) look_from
    fwd: Any           # (3,)
    right: Any         # (3,)
    up: Any            # (3,)
    cam_w: Any         # () film width at unit distance
    cam_h: Any         # ()
    lens_radius: Any   # ()
    focal: Any         # () focal distance
    half_fov: Any      # () field_of_view/2 in radians (fisheye θ_max)


class Camera:
    """Host-side camera description (reference camera.py:8-49)."""

    def __init__(self, look_from, look_at, screen_width=400, screen_height=300,
                 field_of_view=90.0, aperture=0.0, focal_distance=1.0,
                 projection="pinhole"):
        if projection not in ("pinhole", "equirect", "fisheye",
                              "orthographic"):
            raise ValueError(
                "projection must be 'pinhole', 'equirect', 'fisheye' or "
                f"'orthographic', got {projection!r}")
        self.screen_width = int(screen_width)
        self.screen_height = int(screen_height)
        self.aspect_ratio = float(screen_width) / screen_height
        self.look_from = as_float3(look_from, "look_from")
        self.look_at = as_float3(look_at, "look_at")
        self.field_of_view = float(field_of_view)
        self.aperture = float(aperture)
        self.focal_distance = float(focal_distance)
        # Projections beyond the reference's pinhole + thin lens
        # (camera.py:8-49); every projection renders on every execution
        # path (the Pallas kernels raygen all of these in-kernel since
        # R3.3 — see ops/pallas_trace.py _raygen):
        #  "equirect"     — full 360x180 panorama; pixel (u, v) maps to
        #                   azimuth/elevation, image center at look_at's
        #                   azimuth.
        #  "fisheye"      — circular equidistant fisheye (angle from the
        #                   view axis is linear in image radius; the image
        #                   circle touches the smaller frame dimension and
        #                   spans field_of_view across its diameter; pixels
        #                   outside the circle are black, see
        #                   projection_mask).
        #  "orthographic" — parallel rays along fwd; the film spans the
        #                   same world-space footprint the pinhole sees at
        #                   focal_distance, so swapping projections keeps
        #                   the framing of the focal plane.
        self.projection = projection

    def params(self) -> CameraParams:
        cam_w = np.tan(self.field_of_view * np.pi / 180 / 2.0) * 2.0
        cam_h = cam_w / self.aspect_ratio
        fwd = self.look_at - self.look_from
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
        right = right / np.linalg.norm(right)
        up = np.cross(right, fwd)
        f = lambda v: jnp.asarray(np.asarray(v, dtype=np.float32))
        return CameraParams(
            origin=f(self.look_from), fwd=f(fwd), right=f(right), up=f(up),
            cam_w=f(cam_w), cam_h=f(cam_h),
            lens_radius=f(self.aperture / 2.0), focal=f(self.focal_distance),
            half_fov=f(self.field_of_view * np.pi / 360.0),
        )


def projection_mask(projection, width, height):
    """Static per-pixel validity mask, (H*W,) float32, or None.

    Circular-fisheye frames black out pixels beyond the image circle (the
    circle touches the smaller frame dimension); every other projection
    covers the full frame.  Applied to the accumulated radiance at output
    time (core/scene.py, parallel/sharded.py) so the traced program never
    branches on it.
    """
    if projection != "fisheye":
        return None
    m = min(width, height)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float64)
    xn = (2.0 * (xs + 0.5) - width) / m
    yn = (height - 2.0 * (ys + 0.5)) / m
    return (xn * xn + yn * yn <= 1.0).astype(np.float32).reshape(-1)


def generate_rays(key, params: CameraParams, width: int, height: int, spp: int,
                  dtype=jnp.float32, row0=0, rows=None, sampler="r2",
                  strat_seed=None, sample0=None, projection="pinhole"):
    """Generate a (spp * rows * W, 3) wavefront of camera rays.

    Per-sample sub-pixel AA jitter and thin-lens depth of field exactly as
    the reference (camera.py:51-85).  Ray ordering is [sample,
    pixel(row-major)] so a (spp, rows*W, 3) reshape gives per-sample frames.

    sampler: "r2" (default) draws the AA/lens jitter from a per-pixel
    Cranley-Patterson-rotated R2 lattice (core/lds.py — ~2.2x lower image
    MSE at equal spp); "iid" draws i.i.d. threefry uniforms (the reference's
    estimator).  For "r2", `strat_seed` (uint32/int32 scalar, constant for
    the whole render) keys the rotations and `sample0` (int32 scalar) is the
    global index of this call's first sample, so chunked renders continue
    one lattice instead of restarting it; both default to key-derived values
    for single-chunk callers.

    row0/rows select a horizontal band of the film — the unit of pixel
    sharding across devices (parallel/sharded.py).  `rows` must be static;
    `row0` may be traced (e.g. derived from a mesh axis index).
    """
    if rows is None:
        rows = height
    n_pix = width * rows
    n = spp * n_pix
    k_jx, k_jy, k_disk = jax.random.split(key, 3)

    if projection in ("equirect", "fisheye"):
        # angular projections: pixel index -> direction directly.  equirect:
        # column -> azimuth around look_at's heading, row -> elevation (row
        # 0 = zenith).  fisheye: equidistant — angle from fwd is linear in
        # distance from the image center, the image circle touches the
        # smaller frame dimension and spans field_of_view across its
        # diameter.  AA jitter uses the same draw dimensions (0, 1) as the
        # pinhole path; the thin lens is a no-op.
        idx = jnp.arange(n, dtype=jnp.uint32)
        band_pix = idx % jnp.uint32(n_pix)
        col = (band_pix % jnp.uint32(width)).astype(dtype)
        grow = (jnp.asarray(row0, dtype)
                + (band_pix // jnp.uint32(width)).astype(dtype))
        if sampler == "r2":
            if strat_seed is None:
                strat_seed = jax.random.randint(k_jx, (), 0, 2 ** 31 - 1,
                                                dtype=jnp.int32)
            if sample0 is None:
                sample0 = jnp.int32(0)
            gpix = band_pix + jnp.asarray(row0, jnp.float32).astype(
                jnp.uint32) * jnp.uint32(width)
            s = (idx // jnp.uint32(n_pix)
                 + jnp.asarray(sample0).astype(jnp.uint32))
            u1 = lds.to_float(lds.r2_bits(gpix, s, strat_seed, 0)).astype(dtype)
            u2 = lds.to_float(lds.r2_bits(gpix, s, strat_seed, 1)).astype(dtype)
        elif sampler == "iid":
            u1 = jax.random.uniform(k_jx, (n,), dtype)
            u2 = jax.random.uniform(k_jy, (n,), dtype)
        else:
            raise ValueError(f"sampler must be 'r2' or 'iid', got {sampler!r}")
        if projection == "fisheye":
            m = float(min(width, height))
            xn = (2.0 * (col + u1) - width) / m
            yn = (height - 2.0 * (grow + u2)) / m
            r = jnp.sqrt(xn * xn + yn * yn)
            theta = r * params.half_fov
            phi = jnp.arctan2(yn, xn)
            sin_t = jnp.sin(theta)
            d = (jnp.cos(theta)[:, None] * params.fwd[None, :]
                 + (sin_t * jnp.cos(phi))[:, None] * params.right[None, :]
                 + (sin_t * jnp.sin(phi))[:, None] * params.up[None, :])
            origin = jnp.broadcast_to(params.origin[None, :], d.shape)
            return origin, d
        u_img = (col + u1) / width
        el = jnp.pi * (0.5 - (grow + u2) / height)     # +pi/2 zenith .. -pi/2
        phi0 = jnp.arctan2(params.fwd[2], params.fwd[0])
        phi = phi0 + 2.0 * jnp.pi * (u_img - 0.5)
        rho = jnp.cos(el)
        d = jnp.stack([rho * jnp.cos(phi), jnp.sin(el), rho * jnp.sin(phi)],
                      axis=-1)
        origin = jnp.broadcast_to(params.origin[None, :], d.shape)
        return origin, d

    # pixel centers in camera units (reference camera.py:36-49)
    xs = (jnp.arange(width, dtype=dtype) / (width - 1) - 0.5) * params.cam_w
    ys = (0.5 - (row0 + jnp.arange(rows, dtype=dtype)) / (height - 1)) * params.cam_h
    gx = jnp.tile(xs[None, :], (rows, 1)).reshape(-1)       # (rows*W,)
    gy = jnp.tile(ys[:, None], (1, width)).reshape(-1)
    gx = jnp.tile(gx, (spp,))
    gy = jnp.tile(gy, (spp,))

    if sampler == "r2":
        if strat_seed is None:
            strat_seed = jax.random.randint(k_jx, (), 0, 2 ** 31 - 1,
                                            dtype=jnp.int32)
        if sample0 is None:
            sample0 = jnp.int32(0)
        idx = jnp.arange(n, dtype=jnp.uint32)
        band_pix = idx % jnp.uint32(n_pix)
        # rotations key on the GLOBAL pixel so film bands stay consistent
        gpix = band_pix + jnp.asarray(row0, jnp.float32).astype(
            jnp.uint32) * jnp.uint32(width)
        s = idx // jnp.uint32(n_pix) + jnp.asarray(sample0).astype(jnp.uint32)
        to_f = lambda b: lds.to_float(b).astype(dtype)
        u1 = to_f(lds.r2_bits(gpix, s, strat_seed, 0))
        u2 = to_f(lds.r2_bits(gpix, s, strat_seed, 1))
        x = gx + (u1 - 0.5) * (params.cam_w / width)
        y = gy + (u2 - 0.5) * (params.cam_h / height)
        rx = ry = None
        if projection != "orthographic":    # parallel rays have no lens
            # thin-lens disk: same (sqrt(r), 2*pi*phi) mapping as the kernels
            u3 = to_f(lds.r2_bits(gpix, s, strat_seed, 2))
            u4 = to_f(lds.r2_bits(gpix, s, strat_seed, 3))
            r_d = jnp.sqrt(u3)
            phi = u4 * (2.0 * jnp.pi)
            rx = r_d * jnp.cos(phi)
            ry = r_d * jnp.sin(phi)
    elif sampler == "iid":
        x = gx + (jax.random.uniform(k_jx, (n,), dtype) - 0.5) * (params.cam_w / width)
        y = gy + (jax.random.uniform(k_jy, (n,), dtype) - 0.5) * (params.cam_h / height)
        rx = ry = None
        if projection != "orthographic":
            rx, ry = rng.random_in_unit_disk(k_disk, (n,))
    else:
        raise ValueError(f"sampler must be 'r2' or 'iid', got {sampler!r}")
    if projection == "orthographic":
        # parallel rays along fwd; the film spans the world-space footprint
        # the pinhole sees at focal_distance (swap projections, keep the
        # focal-plane framing).  The thin lens is a no-op.
        origin = (params.origin[None, :]
                  + params.right[None, :] * (x * params.focal)[:, None]
                  + params.up[None, :] * (y * params.focal)[:, None])
        d = jnp.broadcast_to(params.fwd[None, :], origin.shape)
        return origin, d
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
