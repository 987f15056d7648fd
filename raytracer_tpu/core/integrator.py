"""Wavefront path-tracing integrator.

Replaces the reference's recursive `get_raycolor` (sightpy/ray.py:122-148).
One fixed-size ray wavefront iterates over bounces:

  bounce k:  intersect ALL primitive tables  ->  nearest hit (argmin)
             -> hit attributes (normal, uv)  ->  per-material-type shading
             -> radiance/throughput update   ->  continuation rays

Everything is fixed-shape masked execution: no stream compaction
(reference's np.extract/place, ray.py:137-146), no dynamic shapes, no Python
recursion — the whole loop jit-compiles into one XLA program per scene
structure.  Path state lives in a flat SoA pytree in HBM; XLA fuses the
elementwise shading math into the intersection sweeps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..geometry.attrs import hit_attributes
from ..geometry.intersect import nearest_hit
from .compile import (PACKED_DEPTH_SHIFT, PACKED_MC_SHIFT, PACKED_SLOT_SHIFT)
from ..materials import shade
from ..materials.base import (MAT_CUSTOM, MAT_DIFFUSE, MAT_EMISSIVE, MAT_ENV,
                              MAT_GLOSSY, MAT_REFRACTIVE, MAT_THINFILM)
from .safemath import safe_norm
from ..utils.constants import MISS_THRESHOLD, NUDGE_EPS, WAVELENGTHS_NM

_SHADERS = {
    MAT_EMISSIVE: shade.shade_emissive,
    MAT_GLOSSY: shade.shade_glossy,
    MAT_DIFFUSE: shade.shade_diffuse,
    MAT_REFRACTIVE: shade.shade_refractive,
    MAT_THINFILM: shade.shade_thinfilm,
    MAT_ENV: shade.shade_env,
}


@dataclass(frozen=True)
class RenderSettings:
    """Static knobs of the compiled render program.

    The reference buries these in hard-coded constants (SURVEY.md §5):
    nudge eps 1e-6 (glossy.py:35), diffuse cap 2 (diffuse.py:22), etc.
    """

    max_bounces: int = 8
    nudge_eps: float = NUDGE_EPS
    # deterministic Fresnel branch-splitting depth: the reference carries
    # BOTH branches at every refractive (mc=False, refractive.py:102-110) and
    # thin-film (thin_film_interference.py:75-113) hit — 2^depth recursion.
    # The wavefront equivalent enumerates the 2^split_k branch patterns as
    # extra samples: each path carries a static `pattern` integer and takes
    # branch bit[j] at its j-th split with weight F or T (no probability
    # division); summed over a full pattern block this reproduces the
    # reference's deterministic tree exactly up to split_k levels (stochastic
    # beyond).  0 = fully stochastic selection.
    split_k: int = 0
    # camera-sample generator: "r2" = per-pixel Cranley-Patterson-rotated R2
    # lattice (core/lds.py, ~2.2x lower image MSE at equal spp), "iid" = the
    # reference's independent uniforms
    sampler: str = "r2"
    # camera projection ("pinhole", "fisheye", "orthographic" or "equirect"
    # 360 panorama); derived from Camera.projection by
    # Scene._settings_for_render.  ALL projections ride every execution
    # path — the Pallas kernels raygen every projection in-kernel since
    # R3.3 (ops/pallas_trace.py _raygen); routing is decided solely by
    # compile.py's pallas_ok/pallas_tex_ok gate.
    projection: str = "pinhole"
    # collect per-bounce ray counts for the Mrays/s metric
    collect_stats: bool = False
    # unroll factor of the lax.scan bounce loop (1 = single compiled body;
    # higher trades compile time for scheduling freedom)
    unroll: int = 1
    # "auto": use the fused Pallas mega-kernel (ops/pallas_trace.py) on TPU
    # when the scene qualifies (static.pallas_ok); "always" forces it (in
    # interpreter mode off-TPU, for tests); "never" uses the jnp wavefront
    use_pallas: str = "auto"


@dataclass
class ShadeCtx:
    """Read-only view handed to the per-material shading kernels."""

    data: Any        # SceneData
    static: Any      # SceneStatic
    bounce: int      # python int (loop is unrolled at trace time)
    key: Any         # per-(bounce, material) PRNG key
    # ray state
    D: Any           # (N, 3) incoming ray directions
    n_re: Any        # (N, 3) current medium IoR
    n_im: Any
    depth: Any       # (N,) int32
    diffuse_reflections: Any
    # hit state
    t: Any           # (N,) hit distance
    P: Any           # (N, 3) hit points
    N: Any           # (N, 3) shading normal (oriented, normal-mapped)
    uv: Any          # (N, 2)
    orient: Any      # (N,) +1 entering / -1 exiting
    mat_slot: Any    # (N,) int32
    obj_max_depth: Any   # (N,) int32
    obj_mc: Any      # (N,) bool
    eps: Any         # (N,) scale-aware nudge offsets
    # deterministic-split state (see RenderSettings.split_k)
    pattern: Any = None    # (N,) int32 branch pattern, bit j = j-th split
    split_cnt: Any = None  # (N,) int32 deterministic splits consumed so far
    split_k: int = 0
    # stratified first-diffuse-bounce draws (core/lds.py dims 6, 4, 5):
    # (u_mix, u_phi, u_r2) per ray, or None for fully key-driven sampling
    strat_u: Any = None
    wavelengths: Any = WAVELENGTHS_NM


def _apply_normal_maps(N_geo, P, uv, obj_id, data, static):
    """Tangent-space normal mapping (reference material.py:18-36).

    Each normal-mapped object is a static entry: fetch the map, decode to
    [-1,1], rotate by the object's (u, v, n) basis, renormalize.
    """
    if not static.normal_maps:
        return N_geo
    N = N_geo
    tri_off = (static.n_spheres + static.n_planes + static.n_boxes
               + static.n_discs + static.n_cylinders)
    for ref in static.normal_maps:
        tex = data.textures[ref.tex]
        m = shade.fetch_texture(tex, uv, ref.repeat,
                                getattr(ref, "bilinear", False)) - 0.5
        if ref.basis_kind == "sphere":
            # per-ray tangent frame from the spherical parameterization:
            # T = dP/du (longitude), B = dP/dv (latitude) = cross(T, N).
            # N_geo IS the sphere normal on the rays this ref masks.
            s = jnp.sqrt(jnp.maximum(
                N_geo[..., 0] ** 2 + N_geo[..., 2] ** 2, 1e-12))
            T = jnp.stack([-N_geo[..., 2] / s, jnp.zeros_like(s),
                           N_geo[..., 0] / s], axis=-1)
            B = jnp.cross(T, N_geo)
            Nm = 2.0 * (m[..., 0:1] * T + m[..., 1:2] * B
                        + m[..., 2:3] * N_geo)
            Nm = Nm / jnp.maximum(safe_norm(Nm, keepdims=True), 1e-20)
            N = jnp.where((obj_id == ref.obj)[..., None], Nm, N)
            continue
        if ref.basis_kind == "tri":
            # mesh faces: per-ray tangent frame — the compile-time
            # uv-aligned tangent orthonormalized against the (possibly
            # vertex-interpolated) shading normal.  Under MeshInstances the
            # object id is virtual: map to (physical row, instance) and
            # rotate the object-space tangent into world first.
            row = obj_id - tri_off
            if data.geom.tri_virt_row.shape[0]:
                virt = jnp.clip(row, 0, data.geom.tri_virt_row.shape[0] - 1)
                row = jnp.take(data.geom.tri_virt_row, virt, mode="clip")
                inst = jnp.take(data.geom.tri_virt_inst, virt, mode="clip")
                R_i = jnp.take(data.geom.inst_rot, inst, axis=0, mode="clip")
            else:
                row = jnp.clip(row, 0, max(data.geom.tri_tan.shape[0] - 1, 0))
                R_i = None
            mask = ((obj_id >= tri_off)
                    & (jnp.take(data.geom.tri_nm_slot, row, mode="clip")
                       == ref.local_id))
            T = jnp.take(data.geom.tri_tan, row, axis=0, mode="clip")
            if R_i is not None:
                T = jnp.einsum("nij,nj->ni", R_i, T)
            T = T - N_geo * jnp.sum(T * N_geo, axis=-1, keepdims=True)
            T = T / jnp.maximum(safe_norm(T, keepdims=True), 1e-20)
            sgn = jnp.take(data.geom.tri_tan_sign, row, mode="clip")
            B = sgn[..., None] * jnp.cross(N_geo, T)
            Nm = 2.0 * (m[..., 0:1] * T + m[..., 1:2] * B
                        + m[..., 2:3] * N_geo)
            Nm = Nm / jnp.maximum(safe_norm(Nm, keepdims=True), 1e-20)
            N = jnp.where(mask[..., None], Nm, N)
            continue
        if ref.basis_kind == "plane":
            u_ax = data.geom.plane_u_axis[ref.local_id]
            v_ax = data.geom.plane_v_axis[ref.local_id]
            n_ax = data.geom.plane_normal[ref.local_id]
            basis = jnp.stack([u_ax, v_ax, n_ax], axis=-1)    # columns
        else:  # box: inverse basis columns are the box axes = basis rows
            basis = data.geom.box_basis[ref.local_id].T
        Nm = (m * 2.0) @ basis.T
        Nm = Nm / jnp.maximum(safe_norm(Nm, keepdims=True), 1e-20)
        N = jnp.where((obj_id == ref.obj)[..., None], Nm, N)
    return N


def trace(key, origin, direction, n_re, n_im, data, static, settings,
          pattern=None, strat_u=None):
    """Trace a wavefront of rays to completion.

    origin/direction: (N, 3); n_re/n_im: (N, 3) starting medium IoR.
    pattern: (N,) int32 deterministic branch patterns (required when
    settings.split_k > 0; Scene.render derives it from the sample index so
    every block of 2^split_k samples enumerates all branch combinations).
    strat_u: optional (u_mix, u_phi, u_r2) per-ray stratified uniforms for
    the FIRST diffuse bounce (core/lds.py; each path scatters diffusely at
    most once per dimension set, so one 2D+1D draw per ray covers it).
    Returns (radiance (N, 3), stats dict of scalar counters).
    """
    n = origin.shape[0]
    f3 = lambda v: jnp.full((n, 3), v, origin.dtype)
    if static.n_objects == 0:
        # empty scene: every ray misses -> black (reference ray.py:128-131)
        stats = {"rays_traced": jnp.asarray(n, jnp.int32)} if settings.collect_stats else {}
        return f3(0.0), stats

    if pattern is None:
        pattern = jnp.zeros((n,), jnp.int32)

    def bounce_body(carry, bounce):
        (L, beta, alive, depth, diffuse_refl, split_cnt,
         O, D, n_re, n_im, rays_traced) = carry

        t, orient, obj = nearest_hit(O, D, data.geom)
        miss = t >= MISS_THRESHOLD

        P = O + D * t[..., None]
        N_geo, uv = hit_attributes(P, obj, data.geom, static)
        N_shad = _apply_normal_maps(N_geo, P, uv, obj, data, static)
        N_shad = N_shad * orient[..., None]

        # one gather for all per-object attributes (packed int32 word)
        packed = jnp.take(data.obj.packed, obj, mode="clip")
        mat_type = packed & 0x7
        mat_slot = (packed >> PACKED_SLOT_SHIFT) & 0x3FF
        obj_max_depth = (packed >> PACKED_DEPTH_SHIFT) & 0x3FF
        obj_mc = ((packed >> PACKED_MC_SHIFT) & 1).astype(bool)

        # scale-aware surface nudge: the reference's absolute 1e-6
        # (glossy.py:35) vanishes in float32 at Cornell-box coordinate scales
        eps = settings.nudge_eps * jnp.maximum(1.0, jnp.max(jnp.abs(P), axis=-1))

        key_b = jax.random.fold_in(key, bounce)
        add = f3(0.0)
        beta_mult = f3(1.0)
        new_O, new_D = P, D
        new_n_re, new_n_im = n_re, n_im
        cont = jnp.zeros((n,), bool)
        inc_refl = jnp.zeros((n,), bool)
        inc_trans = jnp.zeros((n,), bool)
        inc_diff = jnp.zeros((n,), bool)
        inc_split = jnp.zeros((n,), bool)

        # (shader fn, per-ray mask, key salt) per present material type; a
        # CustomMaterial type unrolls into one entry per registered instance,
        # masked by slot (user shading hook, materials/base.py CustomMaterial)
        dispatch = []
        for mt in static.mat_types_present:
            if mt == MAT_CUSTOM:
                for slot, cm in enumerate(static.custom_mats):
                    dispatch.append((cm.shade,
                                     (mat_type == mt) & (mat_slot == slot),
                                     (mt << 10) | slot))
            elif mt in _SHADERS:
                dispatch.append((_SHADERS[mt], mat_type == mt, mt))

        for shader_fn, m, salt in dispatch:
            ctx = ShadeCtx(
                data=data, static=static, bounce=bounce,
                key=jax.random.fold_in(key_b, salt),
                D=D, n_re=n_re, n_im=n_im, depth=depth,
                diffuse_reflections=diffuse_refl,
                t=t, P=P, N=N_shad, uv=uv, orient=orient,
                mat_slot=mat_slot, obj_max_depth=obj_max_depth,
                obj_mc=obj_mc, eps=eps,
                pattern=pattern, split_cnt=split_cnt,
                split_k=settings.split_k, strat_u=strat_u,
            )
            out = shader_fn(ctx)
            m3 = m[..., None]
            add = jnp.where(m3, out.add, add)
            beta_mult = jnp.where(m3, out.beta_mult, beta_mult)
            new_O = jnp.where(m3, out.new_origin, new_O)
            new_D = jnp.where(m3, out.new_dir, new_D)
            new_n_re = jnp.where(m3, out.new_n_re, new_n_re)
            new_n_im = jnp.where(m3, out.new_n_im, new_n_im)
            cont = jnp.where(m, out.cont, cont)
            inc_refl = jnp.where(m, out.is_reflection, inc_refl)
            inc_trans = jnp.where(m, out.is_transmission, inc_trans)
            inc_diff = jnp.where(m, out.is_diffuse, inc_diff)
            if out.did_split is not None:   # optional for custom shaders
                inc_split = jnp.where(m, out.did_split, inc_split)

        shaded = alive & ~miss
        L = L + jnp.where(shaded[..., None], beta * add, 0.0)
        if settings.collect_stats:
            rays_traced = rays_traced + jnp.sum(alive.astype(jnp.int32))

        alive = shaded & cont
        a3 = alive[..., None]
        beta = jnp.where(a3, beta * beta_mult, beta)
        # Dead rays keep their stale O/D and are re-swept each later bounce.
        # Parking them at a far origin (so dead tiles skip every cluster) was
        # measured NEUTRAL-to-worse on the mesh bench (scripts/probe_park_ab:
        # interleaved A/B, 7.53s vs 7.19s median at 20k tris): rays there
        # live through the whole bounce budget, and all-parked blocks sweep
        # ~40% slower (scripts/probe_parked.py — huge-coordinate inputs hit
        # a VPU slow path).  Keep the simple select.
        O = jnp.where(a3, new_O, O)
        D = jnp.where(a3, new_D, D)
        n_re = jnp.where(a3, new_n_re, n_re)
        n_im = jnp.where(a3, new_n_im, n_im)
        depth = depth + alive.astype(jnp.int32)
        diffuse_refl = diffuse_refl + (alive & inc_diff).astype(jnp.int32)
        split_cnt = split_cnt + (shaded & inc_split).astype(jnp.int32)
        del inc_refl, inc_trans  # reflection/transmission counts are not
        # consumed by any termination rule (the reference tracks them on the
        # Ray record but never reads them, ray.py:31-33) — keeping them in the
        # scan carry would cost two (N,) HBM round-trips per bounce.
        carry = (L, beta, alive, depth, diffuse_refl, split_cnt,
                 O, D, n_re, n_im, rays_traced)
        return carry, None

    # derive inits from `origin` so they inherit its device-varying axes —
    # a plain jnp.zeros carry is rejected by shard_map's varying-axis check
    z3 = origin * 0.0
    z1 = z3[..., 0]
    n_re = n_re + z3   # medium IoR usually broadcasts from replicated scene
    n_im = n_im + z3   # tables; mix in z3 so it is varying like the rays
    init = (
        z3,                            # L
        z3 + 1.0,                      # beta
        z1 < 1.0,                      # alive (all True)
        z1.astype(jnp.int32),          # depth
        z1.astype(jnp.int32),          # diffuse_reflections
        z1.astype(jnp.int32) + pattern * 0,  # split_cnt (varying like rays)
        origin, direction, n_re, n_im,
        z1.astype(jnp.int32).sum(),    # rays_traced
    )
    # lax.scan: the bounce body compiles ONCE (unrolling the loop in Python
    # multiplies XLA compile time by max_bounces with no measured runtime win)
    carry, _ = jax.lax.scan(bounce_body, init,
                            jnp.arange(settings.max_bounces, dtype=jnp.int32),
                            unroll=settings.unroll)
    L = carry[0]
    stats = {}
    if settings.collect_stats:
        stats["rays_traced"] = carry[-1]
    return L, stats


def trace_distances(origin, direction, data, max_r_distance=10.0):
    """Depth AOV for debugging (reference ray.py:151-163, scene.py:142-166).

    Routes through nearest_hit rather than intersect_all: the blocked /
    clustered triangle sweeps keep the intermediates bounded where the flat
    (num_objects, N) matrix would OOM on mesh scenes."""
    nearest, _, _ = nearest_hit(origin, direction, data.geom)
    r = jnp.minimum(nearest, max_r_distance) / max_r_distance
    return jnp.stack([r, r, r], axis=-1)
