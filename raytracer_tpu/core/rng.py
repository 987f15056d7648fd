"""Counter-based sampling primitives (threefry) and importance-sampling PDFs.

Replaces sightpy/utils/random.py.  The reference draws from the *global*
unseeded numpy RNG (random.py:6-17 etc.), making renders irreproducible; here
every sample is a pure function of a `jax.random` key, so renders are
deterministic and each (pixel, sample, bounce) draws an independent stream.

All functions are jit-safe and operate on batched shapes: directions/normals
are arrays of shape (..., 3); returned samples match the batch shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .safemath import safe_sqrt

# ---------------------------------------------------------------------------
# basic geometric samplers
# ---------------------------------------------------------------------------


def random_in_unit_disk(key, shape):
    """Uniform points in the unit disk -> (rx, ry), each of `shape`.

    Reference: random.py:6-9.
    """
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, shape))
    phi = jax.random.uniform(k2, shape) * (2.0 * jnp.pi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def random_in_unit_sphere(key, shape):
    """Uniform directions on the unit sphere, shape (..., 3).

    Reference: random.py:12-17.
    """
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, shape) * (2.0 * jnp.pi)
    u = 2.0 * jax.random.uniform(k2, shape) - 1.0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - u * u))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), u], axis=-1)


def _orthonormal_basis(w):
    """Build (u, v) orthonormal to unit vectors w (..., 3).

    Same construction as the reference (random.py:63-66): pick a helper axis
    depending on |w.x|, then two cross products.
    """
    a = jnp.where(
        (jnp.abs(w[..., 0:1]) > 0.9),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], w.dtype), w.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], w.dtype), w.shape),
    )
    v = jnp.cross(w, a)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    u = jnp.cross(w, v)
    return u, v


# ---------------------------------------------------------------------------
# cosine-weighted hemisphere
# ---------------------------------------------------------------------------


def cosine_sample(key, normal, uniforms=None):
    """Cosine-weighted directions about `normal` (..., 3).

    Reference: cosine_pdf.generate, random.py:62-74.
    uniforms: optional explicit (u_phi, u_r2) in [0,1) (each batch-shaped) —
    the injection point for stratified draws (core/lds.py); `key` is unused
    when given.
    """
    ax_u, ax_v = _orthonormal_basis(normal)
    batch = normal.shape[:-1]
    if uniforms is None:
        k1, k2 = jax.random.split(key)
        u_phi = jax.random.uniform(k1, batch)
        r2 = jax.random.uniform(k2, batch)
    else:
        u_phi, r2 = uniforms
    phi = u_phi * (2.0 * jnp.pi)
    z = jnp.sqrt(1.0 - r2)
    x = jnp.cos(phi) * jnp.sqrt(r2)
    y = jnp.sin(phi) * jnp.sqrt(r2)
    return ax_u * x[..., None] + ax_v * y[..., None] + normal * z[..., None]


def cosine_pdf_value(direction, normal):
    """PDF of cosine_sample at `direction` (reference random.py:57-59)."""
    c = jnp.clip(jnp.sum(direction * normal, axis=-1), 0.0, 1.0)
    return c / jnp.pi


def hemisphere_sample(key, normal):
    """Uniform hemisphere about `normal` (reference random.py:44-46)."""
    r = random_in_unit_sphere(key, normal.shape[:-1])
    flip = jnp.sum(normal * r, axis=-1, keepdims=True) < 0.0
    return jnp.where(flip, -r, r)


def hemisphere_pdf_value(direction, normal):
    del direction, normal
    return 1.0 / (2.0 * jnp.pi)


# ---------------------------------------------------------------------------
# spherical caps toward importance-sampled targets
# ---------------------------------------------------------------------------


def caps_geometry(origin, targets_center, targets_radius):
    """Per-(ray, target) cap axis and cos(theta_max).

    origin: (..., 3) ray origins; targets_center: (K, 3); targets_radius: (K,).
    Returns ax_w (..., K, 3) unit axes toward each target and cos_max (..., K).
    Reference: spherical_caps_pdf, random.py:98-133.
    """
    d = targets_center - origin[..., None, :]                       # (..., K, 3)
    # safe_sqrt forms: an origin on/inside a target sphere saturates these
    # (dist = 0, sin_max = 1) and the plain-sqrt backward would be NaN
    dist = safe_sqrt(jnp.sum(d * d, axis=-1))                        # (..., K)
    ax_w = d / jnp.maximum(dist, 1e-20)[..., None]
    sin_max = jnp.clip(targets_radius / jnp.maximum(dist, 1e-20), 0.0, 1.0)
    cos_max = safe_sqrt(1.0 - sin_max * sin_max)
    return ax_w, cos_max


def caps_sample(key, origin, targets_center, targets_radius, uniforms=None):
    """Sample a direction in the union-of-caps mixture (uniform over targets).

    Reference: spherical_caps_pdf.generate, random.py:98-151.
    uniforms: optional explicit (u_phi, u_r2) for the in-cap draw (the target
    pick stays key-driven — a discrete choice gains nothing from the lattice).
    """
    k_pick, k_phi, k_r2 = jax.random.split(key, 3)
    batch = origin.shape[:-1]
    K = targets_center.shape[0]

    ax_w, cos_max = caps_geometry(origin, targets_center, targets_radius)
    pick = jax.random.randint(k_pick, batch, 0, K)                   # (...)
    ax_w_sel = jnp.take_along_axis(ax_w, pick[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    cos_sel = jnp.take_along_axis(cos_max, pick[..., None], axis=-1)[..., 0]

    ax_u, ax_v = _orthonormal_basis(ax_w_sel)
    if uniforms is None:
        u_phi = jax.random.uniform(k_phi, batch)
        r2 = jax.random.uniform(k_r2, batch)
    else:
        u_phi, r2 = uniforms
    phi = u_phi * (2.0 * jnp.pi)
    z = 1.0 + r2 * (cos_sel - 1.0)
    s = safe_sqrt(1.0 - z * z)
    return ax_u * (jnp.cos(phi) * s)[..., None] + ax_v * (jnp.sin(phi) * s)[..., None] + ax_w_sel * z[..., None]


def caps_pdf_value(direction, origin, targets_center, targets_radius):
    """Mixture PDF of caps_sample at `direction` (reference random.py:87-96)."""
    ax_w, cos_max = caps_geometry(origin, targets_center, targets_radius)
    K = targets_center.shape[0]
    inside = jnp.sum(direction[..., None, :] * ax_w, axis=-1) > cos_max     # (..., K)
    per_cap = jnp.where(inside, 1.0 / ((1.0 - cos_max) * 2.0 * jnp.pi), 0.0)
    return jnp.sum(per_cap, axis=-1) / K


def spherical_cap_sample(key, cos_max, normal):
    """Sample within the cap of half-angle acos(cos_max) about `normal`.

    Reference: random_in_unit_spherical_cap, random.py:239-253.
    """
    ax_u, ax_v = _orthonormal_basis(normal)
    k_phi, k_r2 = jax.random.split(key)
    batch = normal.shape[:-1]
    phi = jax.random.uniform(k_phi, batch) * (2.0 * jnp.pi)
    r2 = jax.random.uniform(k_r2, batch)
    z = 1.0 + r2 * (cos_max - 1.0)
    s = safe_sqrt(1.0 - z * z)
    return ax_u * (jnp.cos(phi) * s)[..., None] + ax_v * (jnp.sin(phi) * s)[..., None] + normal * z[..., None]


# ---------------------------------------------------------------------------
# environment-map importance sampling (alias method)
# ---------------------------------------------------------------------------
# The sampling distribution lives on a uniform (Hs, Ws) grid over the
# equirect (u, v) square (compile.py _env_is_tables builds the tables from
# the map's luminance).  Alias sampling is two gathers + elementwise trig —
# no binary search, no divergence: exactly the access pattern the VPU likes.
# Within a picked cell, v is jittered uniformly in sin(elevation), so the
# density is constant in SOLID ANGLE over the cell and pdf(d) is a single
# table lookup.  Direction <-> (u, v) uses the sphere_attrs convention
# (geometry/attrs.py): u = (atan2(z, x) + pi) / 2pi, v = (asin(y) + pi/2)/pi.


def env_alias_sample(u1, u2, prob, alias, hw):
    """Directions distributed per the env alias tables; u1/u2 in [0,1)."""
    Hs, Ws = hw
    n = Hs * Ws
    x = u1 * n
    k = jnp.clip(x.astype(jnp.int32), 0, n - 1)
    ju = x - k                         # fractional reuse: u-jitter
    p = jnp.take(prob, k, mode="clip")
    take = u2 < p
    k = jnp.where(take, k, jnp.take(alias, k, mode="clip"))
    jv = jnp.where(take, u2 / jnp.maximum(p, 1e-12),
                   (u2 - p) / jnp.maximum(1.0 - p, 1e-12))
    i = (k // Ws).astype(jnp.float32)
    j = (k % Ws).astype(jnp.float32)
    uu = (j + ju) / Ws
    # cell v-band [i/Hs, (i+1)/Hs] -> sin(elevation) in [-cos(pi v)] bounds;
    # uniform jv in that range == uniform in solid angle over the band
    s0 = -jnp.cos(jnp.pi * i / Hs)
    s1 = -jnp.cos(jnp.pi * (i + 1.0) / Hs)
    sy = s0 + jv * (s1 - s0)
    rho = safe_sqrt(1.0 - sy * sy)
    phi = 2.0 * jnp.pi * uu - jnp.pi
    return jnp.stack([rho * jnp.cos(phi), sy, rho * jnp.sin(phi)], axis=-1)


def env_pdf_value(direction, pdf_table, hw):
    """Solid-angle pdf of env_alias_sample at `direction` (one gather)."""
    Hs, Ws = hw
    u = (jnp.arctan2(direction[..., 2], direction[..., 0]) + jnp.pi) \
        / (2.0 * jnp.pi)
    v = (jnp.arcsin(jnp.clip(direction[..., 1], -1.0, 1.0)) + jnp.pi / 2.0) \
        / jnp.pi
    i = jnp.clip((v * Hs).astype(jnp.int32), 0, Hs - 1)
    j = jnp.mod((u * Ws).astype(jnp.int32), Ws)
    return jnp.take(pdf_table, i * Ws + j, mode="clip")


# ---------------------------------------------------------------------------
# mixture used by the Diffuse BRDF
# ---------------------------------------------------------------------------


def mixed_cosine_caps_sample(key, normal, origin, targets_center, targets_radius,
                             cosine_weight, uniforms=None):
    """Sample the Diffuse importance mixture and return (direction, pdf).

    With probability `cosine_weight` draw from the cosine lobe about the
    normal, otherwise from the union-of-caps toward the importance-sampled
    targets; the returned pdf is the full mixture density (reference
    mixed_pdf, random.py:153-174, as used by diffuse.py:49-61).

    uniforms: optional explicit (u_mix, u_phi, u_r2) — the (phi, r2) pair
    feeds whichever branch is selected (each branch is a proper map of the
    unit square, and only one survives the select).
    """
    k_mix, k_cos, k_caps = jax.random.split(key, 3)
    batch = normal.shape[:-1]
    if uniforms is None:
        u_mix, dir_u = jax.random.uniform(k_mix, batch), None
    else:
        u_mix, dir_u = uniforms[0], (uniforms[1], uniforms[2])
    use_cos = u_mix < cosine_weight
    d_cos = cosine_sample(k_cos, normal, uniforms=dir_u)
    d_caps = caps_sample(k_caps, origin, targets_center, targets_radius,
                         uniforms=dir_u)
    d = jnp.where(use_cos[..., None], d_cos, d_caps)
    pdf = (cosine_weight * cosine_pdf_value(d, normal)
           + (1.0 - cosine_weight) * caps_pdf_value(d, origin, targets_center, targets_radius))
    return d, pdf


def mixed_diffuse_sample(key, normal, origin, targets_center, targets_radius,
                         env_tabs, cosine_weight, uniforms=None):
    """General Diffuse importance mixture: cosine ⊕ light caps ⊕ environment.

    Extends mixed_cosine_caps_sample with an optional environment component
    (env_tabs = (prob, alias, pdf_table, (Hs, Ws)) from compile.py, or None);
    targets_center=None drops the caps component.  Weights: `cosine_weight`
    on the cosine lobe (the reference's ambient_weight semantics,
    diffuse.py:49-58), the remainder split equally over the present target
    components.  Every direction with NdotL > 0 keeps pdf > 0 through the
    cosine term, so adding components never biases the estimator.

    uniforms: optional explicit (u_mix, u_phi, u_r2); the (phi, r2) pair
    feeds whichever branch the mixture selects (each is a proper map of the
    unit square, and only one survives the select).
    """
    has_caps = targets_center is not None and targets_center.shape[0] > 0
    has_env = env_tabs is not None
    k_mix, k_cos, k_caps, k1, k2 = jax.random.split(key, 5)
    batch = normal.shape[:-1]
    if uniforms is None:
        u_mix = jax.random.uniform(k_mix, batch)
        dir_u = (jax.random.uniform(k1, batch), jax.random.uniform(k2, batch))
    else:
        u_mix, dir_u = uniforms[0], (uniforms[1], uniforms[2])

    w = cosine_weight
    seg = (1.0 - w) / (int(has_caps) + int(has_env))
    d = cosine_sample(k_cos, normal, uniforms=dir_u)
    if has_caps:
        d_caps = caps_sample(k_caps, origin, targets_center, targets_radius,
                             uniforms=dir_u)
        in_caps = (u_mix >= w) & (u_mix < w + seg)
        d = jnp.where(in_caps[..., None], d_caps, d)
    if has_env:
        prob, alias, pdf_tab, hw = env_tabs
        d_env = env_alias_sample(dir_u[0], dir_u[1], prob, alias, hw)
        in_env = u_mix >= 1.0 - seg
        d = jnp.where(in_env[..., None], d_env, d)
    pdf = w * cosine_pdf_value(d, normal)
    if has_caps:
        pdf = pdf + seg * caps_pdf_value(d, origin, targets_center,
                                         targets_radius)
    if has_env:
        pdf = pdf + seg * env_pdf_value(d, pdf_tab, hw)
    return d, pdf
