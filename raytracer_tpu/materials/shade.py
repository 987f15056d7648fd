"""Wavefront shading kernels, one per material type.

The reference shades by recursion: each material's get_color() re-enters the
integrator (sightpy/ray.py:122-148) with numpy stream compaction.  On TPU the
integrator is an iterative per-bounce loop over a fixed-size ray wavefront
(core/integrator.py); every bounce, each material type present in the scene
produces a `ShadeOut` for ALL rays (masked execution, fixed shapes) and the
integrator selects per-ray by hit material type:

  L    += beta * add            (local radiance emitted toward the ray)
  beta *= beta_mult             (path throughput update)
  ray  <- (new_origin, new_dir) (continuation, if cont)

Branching recursions (reference Refractive splits into reflection+refraction,
refractive.py:103-110; Diffuse fans out x20, diffuse.py:36-47) become
stochastic single-branch continuations with per-channel throughput
compensation — the estimator matches the reference in expectation and keeps
the color dependency of Fresnel that the reference's own mc=True path loses
(refractive.py:95-101).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.safemath import safe_norm, safe_sqrt
from ..geometry.intersect import occluded
from ..utils.constants import SKYBOX_DISTANCE, UPWARDS


@dataclass
class ShadeOut:
    add: Any          # (N, 3) radiance contribution at this hit (pre-throughput)
    beta_mult: Any    # (N, 3) throughput multiplier for the continuation
    new_origin: Any   # (N, 3)
    new_dir: Any      # (N, 3)
    new_n_re: Any     # (N, 3) medium IoR carried by the continuation
    new_n_im: Any     # (N, 3)
    cont: Any         # (N,) bool — does the path continue?
    is_reflection: Any    # (N,) bool counter increments
    is_transmission: Any
    is_diffuse: Any
    did_split: Any = None    # (N,) bool — consumed a deterministic split bit


def default_shade_out(ctx):
    """A neutral ShadeOut (no emission, unit throughput, path terminates).

    Custom shaders (materials/base.py CustomMaterial) should start from this
    and overwrite the fields they care about with dataclasses.replace."""
    n = ctx.P.shape[0]
    f = jnp.zeros((n, 3), ctx.P.dtype)
    b = jnp.zeros((n,), bool)
    return ShadeOut(add=f, beta_mult=jnp.ones_like(f), new_origin=ctx.P,
                    new_dir=ctx.D, new_n_re=ctx.n_re, new_n_im=ctx.n_im,
                    cont=b, is_reflection=b, is_transmission=b, is_diffuse=b,
                    did_split=b)


_zeros_out = default_shade_out


def _split_branch(ctx, cont):
    """Deterministic Fresnel branch selection (reference refractive.py:102-110,
    thin_film_interference.py:75-113 carry BOTH branches).

    Returns (det, take_second, did_split): det marks rays whose branch is
    chosen by bit[split_cnt] of the enumerated pattern instead of a coin flip;
    their throughput uses weight 2*F or 2*T — exactly half of a full
    2^split_k pattern block takes each branch, so the block average
    reproduces F*L_reflect + T*L_refract with ZERO branch-selection noise,
    the reference's deterministic recursion tree.
    """
    if ctx.split_k <= 0 or ctx.pattern is None:
        n = ctx.P.shape[0]
        z = jnp.zeros((n,), bool)
        return z, z, z
    det = (~ctx.obj_mc) & (ctx.split_cnt < ctx.split_k) & cont
    bit = jnp.bitwise_and(
        jnp.right_shift(ctx.pattern, jnp.minimum(ctx.split_cnt, 30)), 1) == 1
    return det, bit, det


# ---------------------------------------------------------------------------
# texture fetch
# ---------------------------------------------------------------------------


def fetch_texture(tex, uv, repeat=1.0, bilinear=False):
    """Texture fetch in the reference's wrap-around indexing convention
    (sightpy/textures/texture.py:32-39): row index is the *negated* scaled v
    (python negative indexing), column is scaled u, both modulo the size.

    bilinear=False is the reference-exact nearest fetch; bilinear=True
    wrap-interpolates the four neighbours in the same convention (a
    constant texture fetches identically either way).
    """
    H, W = tex.shape[0], tex.shape[1]
    flat_tex = tex.reshape(-1, tex.shape[-1])

    def tap(iu, iv):
        col = jnp.mod(iu, W)
        row = jnp.mod(-iv, H)
        return jnp.take(flat_tex, row * W + col, axis=0)

    if not bilinear:
        iu = (uv[..., 0] * (W * repeat)).astype(jnp.int32)
        iv = (uv[..., 1] * (H * repeat)).astype(jnp.int32)
        return tap(iu, iv)

    x = uv[..., 0] * (W * repeat) - 0.5
    y = uv[..., 1] * (H * repeat) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)
    return ((1 - fx) * (1 - fy) * tap(ix, iy)
            + fx * (1 - fy) * tap(ix + 1, iy)
            + (1 - fx) * fy * tap(ix, iy + 1)
            + fx * fy * tap(ix + 1, iy + 1))


def _slot_color(solid_table, slot, uv, tex_refs, textures):
    """Per-ray color: solid color table overridden by per-slot image textures."""
    color = jnp.take(solid_table, slot, axis=0, mode="clip")
    for ref in tex_refs:
        c = fetch_texture(textures[ref.tex], uv, ref.repeat,
                          getattr(ref, "bilinear", False))
        color = jnp.where((slot == ref.slot)[..., None], c, color)
    return color


def _g1(table, slot):
    return jnp.take(table, slot, axis=0, mode="clip")


def _reflect(D, N):
    r = D - N * (2.0 * jnp.sum(D * N, axis=-1, keepdims=True))
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)


def _cmag2(re, im):
    return re * re + im * im


def _c_mul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _c_div(a, b):
    d = jnp.maximum(b[0] * b[0] + b[1] * b[1], 1e-30)
    return (a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d


def _c_sqrt(a):
    # safe_sqrt throughout: at TIR with a real IoR this evaluates sqrt(0),
    # whose backward pass would poison every gradient (see core/safemath.py)
    mag = safe_sqrt(a[0] * a[0] + a[1] * a[1])
    re = safe_sqrt((mag + a[0]) * 0.5)
    im = safe_sqrt((mag - a[0]) * 0.5)
    return re, jnp.where(a[1] < 0, -im, im)


# ---------------------------------------------------------------------------
# emissive
# ---------------------------------------------------------------------------


def shade_emissive(ctx):
    """Area-light surface: emit the texture color, terminate the path
    (reference emissive.py:21-23)."""
    out = _zeros_out(ctx)
    out.add = _slot_color(ctx.data.mats.emissive_color, ctx.mat_slot, ctx.uv,
                          ctx.static.emissive_tex, ctx.data.textures)
    return out


# ---------------------------------------------------------------------------
# environment (skybox / panorama)
# ---------------------------------------------------------------------------


def shade_env(ctx):
    """Environment fetch + optional lightmap IBL for secondary rays
    (reference skybox.py:51-94)."""
    out = _zeros_out(ctx)
    n = ctx.P.shape[0]
    color = jnp.zeros((n, 3), ctx.P.dtype)
    for env in ctx.static.env_slots:
        c = fetch_texture(ctx.data.textures[env.tex], ctx.uv, 1.0)
        if env.lightmap is not None:
            # lightmap applies to secondary rays only (depth != 0) —
            # reference skybox.py:74-88
            li = _g1(ctx.data.mats.env_light_intensity, ctx.mat_slot)
            lm = fetch_texture(ctx.data.textures[env.lightmap], ctx.uv, 1.0)
            c = c + jnp.where((ctx.depth != 0)[..., None],
                              li[..., None] * lm, 0.0)
        color = jnp.where((ctx.mat_slot == env.slot)[..., None], c, color)
    out.add = color
    return out


# ---------------------------------------------------------------------------
# glossy
# ---------------------------------------------------------------------------


def shade_glossy(ctx):
    """Ambient + per-light Lambert/Cook-Torrance with shadow rays + Fresnel
    mirror continuation (reference glossy.py:25-110)."""
    mats, data, static = ctx.data.mats, ctx.data, ctx.static
    slot = ctx.mat_slot
    N = ctx.N
    V = -ctx.D
    out = _zeros_out(ctx)

    diff_coeff = _g1(mats.glossy_diff, slot)
    diff_color = _slot_color(mats.glossy_color, slot, ctx.uv,
                             static.glossy_tex, data.textures) * diff_coeff[..., None]
    add = data.ambient_color[None, :] * diff_color

    nudged = ctx.P + N * ctx.eps[..., None]
    roughness = _g1(mats.glossy_roughness, slot)
    spec_coeff = _g1(mats.glossy_spec, slot)
    m_n_re = _g1(mats.glossy_n_re, slot)
    m_n_im = _g1(mats.glossy_n_im, slot)

    def light_term(L, dist_light, irradiance):
        NdotL = jnp.maximum(jnp.sum(N * L, axis=-1), 0.0)
        lv = irradiance(NdotL)
        if static.has_shadow_objects:
            d = jnp.broadcast_to(jnp.asarray(dist_light, N.dtype), NdotL.shape)
            occ = occluded(nudged, L, data.geom, data.obj.shadow, d)
            seelight = 1.0 - occ.astype(N.dtype)
        else:
            seelight = jnp.ones_like(NdotL)
        term = diff_color * lv * seelight[..., None]
        # Schlick-Fresnel * normalized Blinn-Phong specular lobe
        # (reference glossy.py:64-84); guarded so roughness == 0 contributes 0.
        H = L + V
        H = H / jnp.maximum(safe_norm(H, keepdims=True), 1e-20)
        # F0 uses the *ray medium* IoR (glossy.py:65)
        num2 = _cmag2(ctx.n_re - m_n_re, ctx.n_im - m_n_im)
        den2 = _cmag2(ctx.n_re + m_n_re, ctx.n_im + m_n_im)
        F0 = num2 / jnp.maximum(den2, 1e-20)
        cos_vh = jnp.clip(jnp.sum(V * H, axis=-1), 0.0, 1.0)
        F = F0 + (1.0 - F0) * (1.0 - cos_vh[..., None]) ** 5
        a = 2.0 / jnp.maximum(roughness, 1e-6) ** 2 - 2.0
        Dphong = (jnp.clip(jnp.sum(N * H, axis=-1), 0.0, 1.0) ** a) * (a + 2.0) / (2.0 * jnp.pi)
        denom = 4.0 * jnp.clip(jnp.sum(N * V, axis=-1) * NdotL, 0.001, 1.0)
        spec = F * (Dphong / denom * seelight * spec_coeff)[..., None] * lv
        return term + jnp.where((roughness != 0.0)[..., None], spec, 0.0)

    for i in range(static.n_dir_lights):
        Ldir = data.lights.dir_l[i]
        color = data.lights.dir_color[i]
        L = jnp.broadcast_to(Ldir, N.shape)
        add = add + light_term(L, SKYBOX_DISTANCE,
                               lambda NdotL, c=color: c[None, :] * NdotL[..., None])
    for i in range(static.n_point_lights):
        pos = data.lights.point_pos[i]
        color = data.lights.point_color[i]
        d = pos[None, :] - ctx.P
        dist = safe_norm(d, axis=-1)
        L = d / jnp.maximum(dist, 1e-20)[..., None]
        add = add + light_term(
            L, dist,
            lambda NdotL, c=color, dd=dist: c[None, :] * (NdotL / dd ** 2 * 100.0)[..., None])
    for i in range(static.n_spot_lights):
        # point falloff x smooth cone factor: 1 inside the inner half-angle,
        # smoothstep to 0 at the outer (lights.SpotLight — no reference
        # counterpart, sightpy has point/directional only, lights.py:25-52)
        pos = data.lights.spot_pos[i]
        color = data.lights.spot_color[i]
        ci = data.lights.spot_cos_in[i]
        co = data.lights.spot_cos_out[i]
        d = pos[None, :] - ctx.P
        dist = safe_norm(d, axis=-1)
        L = d / jnp.maximum(dist, 1e-20)[..., None]
        cos_t = jnp.sum(-L * data.lights.spot_dir[i][None, :], axis=-1)
        t = jnp.clip((cos_t - co) / jnp.maximum(ci - co, 1e-6), 0.0, 1.0)
        cone = t * t * (3.0 - 2.0 * t)
        add = add + light_term(
            L, dist,
            lambda NdotL, c=color, dd=dist, k=cone:
                c[None, :] * (NdotL * k / dd ** 2 * 100.0)[..., None])

    # mirror continuation weighted by Schlick-Fresnel vs the *scene* medium
    # (reference glossy.py:87-104)
    num2 = _cmag2(data.scene_n_re[None, :] - m_n_re, data.scene_n_im[None, :] - m_n_im)
    den2 = _cmag2(data.scene_n_re[None, :] + m_n_re, data.scene_n_im[None, :] + m_n_im)
    F0 = num2 / jnp.maximum(den2, 1e-20)
    cos_vn = jnp.clip(jnp.sum(V * N, axis=-1), 0.0, 1.0)
    F = F0 + (1.0 - F0) * (1.0 - cos_vn[..., None]) ** 5

    out.add = add
    out.beta_mult = F
    out.new_origin = nudged
    out.new_dir = _reflect(ctx.D, N)
    out.cont = ctx.depth < ctx.obj_max_depth
    out.is_reflection = out.cont
    return out


# ---------------------------------------------------------------------------
# diffuse
# ---------------------------------------------------------------------------


def shade_diffuse(ctx):
    """Monte-Carlo Lambertian with cosine / light-cap importance mixture
    (reference diffuse.py:25-124).

    The reference fans out `diffuse_rays` samples at the first diffuse bounce
    and averages; here each wavefront path carries one continuation and the
    fan-out is folded into samples-per-pixel — identical estimator in
    expectation.  Termination: at most 2 diffuse bounces per path
    (diffuse.py:22, hard-coded in the reference).
    """
    mats, data, static = ctx.data.mats, ctx.data, ctx.static
    N = ctx.N
    out = _zeros_out(ctx)

    diff_color = _slot_color(mats.diffuse_color, ctx.mat_slot, ctx.uv,
                             static.diffuse_tex, data.textures)
    nudged = ctx.P + N * ctx.eps[..., None]

    # draws: key-driven uniforms, overridden by the per-ray stratified
    # lattice values at the FIRST diffuse bounce (core/lds.py dims 6,4,5 —
    # a path scatters diffusely at most twice, and only the first bounce
    # carries enough energy variance to be worth stratifying)
    batch = ctx.t.shape
    k_mix, k_phi, k_r2 = jax.random.split(ctx.key, 3)
    u = (jax.random.uniform(k_mix, batch), jax.random.uniform(k_phi, batch),
         jax.random.uniform(k_r2, batch))
    if ctx.strat_u is not None:
        first = ctx.diffuse_reflections == 0
        u = tuple(jnp.where(first, s, i) for s, i in zip(ctx.strat_u, u))

    has_env_is = static.env_is_shape != (0, 0)
    if has_env_is:
        # cosine ⊕ caps ⊕ environment mixture (the env component sends rays
        # toward bright map regions — alias tables built at compile time)
        w = _g1(mats.diffuse_ambient_weight, ctx.mat_slot)
        env_tabs = (data.env_is_prob, data.env_is_alias, data.env_is_pdf,
                    static.env_is_shape)
        d, pdf = rng.mixed_diffuse_sample(
            ctx.key, N, nudged,
            data.is_center if static.n_is_targets > 0 else None,
            data.is_radius, env_tabs, w, uniforms=u)
    elif static.n_is_targets > 0:
        w = _g1(mats.diffuse_ambient_weight, ctx.mat_slot)
        d, pdf = rng.mixed_cosine_caps_sample(
            ctx.key, N, nudged, data.is_center, data.is_radius, w,
            uniforms=u)
    else:
        d = rng.cosine_sample(ctx.key, N, uniforms=(u[1], u[2]))
        pdf = rng.cosine_pdf_value(d, N)

    NdotL = jnp.clip(jnp.sum(d * N, axis=-1), 0.0, 1.0)
    weight = NdotL / jnp.maximum(pdf, 1e-9) / jnp.pi

    out.add = jnp.zeros_like(diff_color)
    out.beta_mult = diff_color * weight[..., None]
    out.new_origin = nudged
    out.new_dir = d
    out.cont = ctx.diffuse_reflections < 2
    out.is_reflection = out.cont
    out.is_diffuse = out.cont
    return out


# ---------------------------------------------------------------------------
# refractive
# ---------------------------------------------------------------------------


def shade_refractive(ctx):
    """Complex-IoR Fresnel dielectric (reference refractive.py:24-123).

    Full per-channel complex Fresnel; refraction direction from the
    channel-averaged real IoR ratio (refractive.py:76-82); Beer-Lambert
    absorption from the imaginary part of the *current* medium over the
    distance just travelled (refractive.py:114-122).  The reflect/refract
    split is sampled stochastically with per-channel throughput compensation.
    """
    mats, data = ctx.data.mats, ctx.data
    N = ctx.N
    V = -ctx.D
    out = _zeros_out(ctx)

    m_re = _g1(mats.refr_n_re, ctx.mat_slot)
    m_im = _g1(mats.refr_n_im, ctx.mat_slot)
    entering = (ctx.orient == UPWARDS)[..., None]
    n2_re = jnp.where(entering, m_re, data.scene_n_re[None, :])
    n2_im = jnp.where(entering, m_im, data.scene_n_im[None, :])

    # explicit (re, im) pair arithmetic — XLA's TPU complex64 lowering emits
    # non-finite values for a ~35 ppm tail of grazing rays; the pair form
    # (shared with the Pallas kernel) is clean over hundreds of M rays
    cos_i = jnp.sum(V * N, axis=-1)[..., None]          # (N, 1)
    n1 = (ctx.n_re, ctx.n_im)
    n2 = (n2_re, n2_im)
    ratio = _c_div(n1, n2)
    r2 = _c_mul(ratio, ratio)
    s2 = 1.0 - cos_i * cos_i
    cos_t = _c_sqrt((1.0 - r2[0] * s2, -r2[1] * s2))
    a = (n1[0] * cos_i, n1[1] * cos_i)
    bt = _c_mul(n2, cos_t)
    r_per = _c_div((a[0] - bt[0], a[1] - bt[1]), (a[0] + bt[0], a[1] + bt[1]))
    at = _c_mul(n1, cos_t)
    bb = (n2[0] * cos_i, n2[1] * cos_i)
    r_par = _c_div((bb[0] - at[0], bb[1] - at[1]), (at[0] + bb[0], at[1] + bb[1]))
    F = (_cmag2(*r_per) + _cmag2(*r_par)) / 2.0             # (N, 3) real
    T = 1.0 - F

    # refraction direction from channel-averaged real ratio (refractive.py:76-82)
    ratio_ch = ctx.n_re / jnp.maximum(n2_re, 1e-9)            # (N, 3)
    ratio_avg = jnp.mean(ratio_ch, axis=-1)
    cos_i1 = cos_i[..., 0]
    hero_w = None
    if ctx.static.has_dispersion:
        # spectral dispersion (hero-wavelength): transmitted paths of a
        # dispersion=True material refract at ONE uniformly-chosen channel's
        # IoR and carry 3x that channel's throughput — per-channel Snell,
        # unbiased per channel.  The reference averages the IoRs instead
        # ("Spectrum dispersion is not implemented", refractive.py:76).
        disp = _g1(mats.refr_dispersive, ctx.mat_slot) > 0.5
        hero = jax.random.randint(jax.random.fold_in(ctx.key, 77),
                                  cos_i1.shape, 0, 3)
        ratio_h = jnp.take_along_axis(ratio_ch, hero[..., None],
                                      axis=-1)[..., 0]
        ratio_avg = jnp.where(disp, ratio_h, ratio_avg)
        hero_w = jnp.where(disp[..., None],
                           3.0 * jax.nn.one_hot(hero, 3, dtype=ctx.P.dtype),
                           1.0)
    sin2_t = ratio_avg ** 2 * (1.0 - cos_i1 ** 2)
    non_tir = sin2_t <= 1.0
    refr_dir = (ctx.D * ratio_avg[..., None]
                + N * (ratio_avg * cos_i1 - safe_sqrt(1.0 - sin2_t))[..., None])
    refr_norm = safe_sqrt(jnp.sum(refr_dir * refr_dir, axis=-1, keepdims=True))
    refr_dir = refr_dir / jnp.maximum(refr_norm, 1e-20)
    refl_dir = _reflect(ctx.D, N)

    # Beer-Lambert absorption over the segment just travelled (refractive.py:114-122)
    lam = jnp.asarray(ctx.wavelengths, ctx.P.dtype)
    absorb = jnp.exp(-2.0 * ctx.n_im * (2.0 * jnp.pi / lam[None, :]) * 1e9 * ctx.t[..., None])

    # stochastic branch selection with balance-heuristic weights
    T_avg = jnp.mean(T, axis=-1)
    p_refr = jnp.where(non_tir, jnp.clip(T_avg, 0.0, 1.0), 0.0)
    u = jax.random.uniform(ctx.key, p_refr.shape)
    take_refr = (u < p_refr) & non_tir
    w_refr = T / jnp.maximum(p_refr, 1e-9)[..., None]
    w_refl = F / jnp.maximum(1.0 - p_refr, 1e-9)[..., None]

    cont = ctx.depth < ctx.obj_max_depth
    # deterministic two-branch splitting (reference default, mc=False):
    # bit[split_cnt] of the sample's pattern picks the branch; raw F/T weight
    det, bit, did_split = _split_branch(ctx, cont)
    take_refr = jnp.where(det, bit & non_tir, take_refr)
    w = jnp.where(take_refr[..., None],
                  jnp.where(det[..., None], 2.0 * T, w_refr),
                  jnp.where(det[..., None], 2.0 * F, w_refl))
    # a pattern demanding refraction under TIR carries zero energy: kill it
    cont = cont & ~(det & bit & ~non_tir)

    out.add = jnp.zeros_like(F)
    out.beta_mult = absorb * w
    if hero_w is not None:
        # hero-channel selection applies to TRANSMITTED paths only (the
        # mirror reflection direction is channel-independent)
        out.beta_mult = out.beta_mult * jnp.where(take_refr[..., None],
                                                  hero_w, 1.0)
    out.new_dir = jnp.where(take_refr[..., None], refr_dir, refl_dir)
    out.new_origin = jnp.where(take_refr[..., None],
                               ctx.P - N * ctx.eps[..., None],
                               ctx.P + N * ctx.eps[..., None])
    out.new_n_re = jnp.where(take_refr[..., None], n2_re, ctx.n_re)
    out.new_n_im = jnp.where(take_refr[..., None], n2_im, ctx.n_im)
    out.cont = cont
    out.is_reflection = out.cont & ~take_refr
    out.is_transmission = out.cont & take_refr
    out.did_split = did_split
    return out


# ---------------------------------------------------------------------------
# thin-film interference
# ---------------------------------------------------------------------------


def shade_thinfilm(ctx):
    """Thin-film coating: reflectance from the (cos_theta, thickness) LUT,
    straight-through transmission (reference thin_film_interference.py:24-115)."""
    mats, data, static = ctx.data.mats, ctx.data, ctx.static
    N = ctx.N
    V = -ctx.D
    out = _zeros_out(ctx)
    n = ctx.P.shape[0]

    cos_i = jnp.clip(jnp.sum(V * N, axis=-1), 0.0, 1.0)
    thickness = _g1(mats.tf_thickness, ctx.mat_slot)
    noise_factor = _g1(mats.tf_noise, ctx.mat_slot)

    # per-slot noise-texture jitter of the film thickness
    # (thin_film_interference.py:47-58; fetch at repeat 0.5)
    for ref in static.thinfilm_noise:
        noise = fetch_texture(data.textures[ref.tex], ctx.uv, 0.5)[..., 0]
        jittered = thickness + noise_factor * (noise - 0.5)
        thickness = jnp.where(ctx.mat_slot == ref.slot, jittered, thickness)

    F = jnp.zeros((n, 3), ctx.P.dtype)
    for ref in static.thinfilm_lut:
        lut = data.textures[ref.tex]
        H, W = lut.shape[0], lut.shape[1]
        row = jnp.clip((cos_i * H).astype(jnp.int32), 0, H - 1)
        col = jnp.clip(thickness.astype(jnp.int32), 0, W - 1)
        val = jnp.take(lut.reshape(-1, 3), row * W + col, axis=0)
        F = jnp.where((ctx.mat_slot == ref.slot)[..., None], val, F)
    T = 1.0 - F

    out.cont = ctx.depth < ctx.obj_max_depth
    # reflect branch also collects the ambient term scaled by F
    # ((ambient + recursion) * F, thin_film_interference.py:83-99); like the
    # recursion itself, it only applies below the depth cap.
    out.add = jnp.where(out.cont[..., None], data.ambient_color[None, :] * F, 0.0)

    F_avg = jnp.mean(F, axis=-1)
    u = jax.random.uniform(ctx.key, F_avg.shape)
    take_refl = u < jnp.clip(F_avg, 0.0, 1.0)
    w_refl = F / jnp.maximum(F_avg, 1e-9)[..., None]
    w_tran = T / jnp.maximum(1.0 - F_avg, 1e-9)[..., None]

    # deterministic split (the reference ALWAYS carries both film branches,
    # thin_film_interference.py:75-113); bit=1 -> reflect here
    det, bit, did_split = _split_branch(ctx, out.cont)
    take_refl = jnp.where(det, bit, take_refl)
    out.did_split = did_split

    out.beta_mult = jnp.where(
        take_refl[..., None],
        jnp.where(det[..., None], 2.0 * F, w_refl),
        jnp.where(det[..., None], 2.0 * T, w_tran))
    out.new_dir = jnp.where(take_refl[..., None], _reflect(ctx.D, N), ctx.D)
    out.new_origin = jnp.where(take_refl[..., None],
                               ctx.P + N * ctx.eps[..., None],
                               ctx.P - N * ctx.eps[..., None])
    out.is_reflection = out.cont & take_refl
    out.is_transmission = out.cont & ~take_refl
    return out
