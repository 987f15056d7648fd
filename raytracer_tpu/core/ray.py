"""Public Ray record + functional integrator entry point.

API-parity layer for the reference's `Ray` / `get_raycolor`
(sightpy/ray.py:7-148): users who drove the reference integrator directly
with custom ray bundles can do the same here.  A Ray is a pytree of (N, 3)
arrays; `get_raycolor(ray, scene)` compiles the scene and traces the bundle
through the wavefront integrator, returning linear radiance per ray.

The per-bundle counters (depth / reflections / transmissions /
diffuse_reflections) exist for API compatibility; the wavefront integrator
tracks depth and diffuse counts per ray internally, starting from the values
given here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class Ray:
    origin: Any                     # (N, 3)
    dir: Any                        # (N, 3)
    n: Any = None                   # (N, 3) complex medium IoR (or None = scene)
    depth: int = field(default=0, metadata=dict(static=True))
    reflections: int = field(default=0, metadata=dict(static=True))
    transmissions: int = field(default=0, metadata=dict(static=True))
    diffuse_reflections: int = field(default=0, metadata=dict(static=True))

    @staticmethod
    def where(cond, x, y):
        c = cond[..., None]
        n = jnp.where(c, x.n, y.n) if (x.n is not None and y.n is not None) else x.n
        return Ray(jnp.where(c, x.origin, y.origin),
                   jnp.where(c, x.dir, y.dir), n,
                   max(x.depth, y.depth),
                   max(x.reflections, y.reflections),
                   max(x.transmissions, y.transmissions),
                   max(x.diffuse_reflections, y.diffuse_reflections))

    @staticmethod
    def concatenate(rays):
        n = (jnp.concatenate([r.n for r in rays])
             if all(r.n is not None for r in rays) else None)
        return Ray(jnp.concatenate([r.origin for r in rays]),
                   jnp.concatenate([r.dir for r in rays]), n,
                   rays[0].depth,
                   max(r.reflections for r in rays),
                   max(r.transmissions for r in rays),
                   max(r.diffuse_reflections for r in rays))

    def __len__(self):
        return self.origin.shape[0]


def get_raycolor(ray: Ray, scene, seed=0, max_bounces=None):
    """Trace a ray bundle through `scene`; returns (N, 3) linear radiance.

    Functional analogue of the reference integrator entry point
    (sightpy/ray.py:122-148).
    """
    from .compile import compile_scene_cached, derive_max_bounces
    from .integrator import RenderSettings, trace

    static, data = compile_scene_cached(scene)
    if max_bounces is None:
        # shared derivation — same path lengths as Scene.render
        max_bounces = derive_max_bounces(static)
    settings = RenderSettings(max_bounces=max_bounces)

    O = jnp.asarray(ray.origin, jnp.float32)
    D = jnp.asarray(ray.dir, jnp.float32)
    if ray.n is not None:
        n_arr = np.asarray(ray.n)
        n_re = jnp.broadcast_to(jnp.asarray(np.real(n_arr), jnp.float32), O.shape)
        n_im = jnp.broadcast_to(jnp.asarray(np.imag(n_arr), jnp.float32), O.shape)
    else:
        n_re = jnp.broadcast_to(data.scene_n_re, O.shape)
        n_im = jnp.broadcast_to(data.scene_n_im, O.shape)
    L, _ = trace(jax.random.PRNGKey(seed), O, D, n_re, n_im, data, static,
                 settings)
    return L


def get_distances(ray: Ray, scene):
    """Depth AOV for a ray bundle (reference ray.py:151-163)."""
    from .compile import compile_scene_cached
    from .integrator import trace_distances

    _, data = compile_scene_cached(scene)
    return trace_distances(jnp.asarray(ray.origin, jnp.float32),
                           jnp.asarray(ray.dir, jnp.float32), data)


@jax.tree_util.register_dataclass
@dataclass
class Hit:
    """Bundle-level hit record (reference `Hit`, sightpy/ray.py:97-119).

    The reference's Hit is a per-collider record with lazily cached uv and
    normal, produced inside its integrator loop; here all hit attributes are
    computed SoA-batched by the same kernels the integrator uses
    (geometry/attrs.py) and stored eagerly — one record describes the whole
    bundle.  Rays that miss everything have distance == FARAWAY and zeroed
    point/normal/uv.  `obj_id` is the COMPILED global object index, laid out
    type-major ([spheres..., planes..., boxes..., triangles...], each group
    in scene add-order; every TriangleMesh face gets its own id) — it
    matches the ids used by the integrator/attrs tables, NOT the position
    in Scene.scene_primitives.
    """

    distance: Any                   # (N,) nearest-hit distance, FARAWAY = miss
    orientation: Any                # (N,) +1 entering / -1 exiting
    point: Any = None               # (N, 3) hit points (0 on miss)
    normal: Any = None              # (N, 3) geometric normals (0 on miss)
    uv: Any = None                  # (N, 2) texture coordinates (0 on miss)
    obj_id: Any = None              # (N,) int32 compiled object index

    # lazy-cache accessors of the reference API (ray.py:111-119); values are
    # precomputed so these are plain reads
    def get_uv(self):
        return self.uv

    def get_normal(self):
        return self.normal


@partial(jax.jit, static_argnames=("static",))
def _first_hit_impl(O, D, data, static):
    from ..geometry.attrs import hit_attributes
    from ..geometry.intersect import nearest_hit
    from ..utils.constants import MISS_THRESHOLD

    t, orient, obj = nearest_hit(O, D, data.geom)
    miss = (t >= MISS_THRESHOLD)[..., None]
    P = jnp.where(miss, 0.0, O + D * t[..., None])
    N_geo, uv = hit_attributes(P, obj, data.geom, static, force_uv=True)
    return t, orient, P, jnp.where(miss, 0.0, N_geo), \
        jnp.where(miss, 0.0, uv), obj


def first_hit(ray: Ray, scene) -> Hit:
    """Intersect a ray bundle against `scene` and return the nearest hits.

    Functional analogue of the reference integrator's resolve step
    (sightpy/ray.py:124-143: per-collider intersect -> nearest reduce ->
    Hit construction) as a public debug/AOV entry point.  Compiled once per
    (scene structure, bundle shape): scene tables are jit ARGUMENTS, so
    moving objects or repeated calls reuse the cached executable.
    """
    from .compile import compile_scene_cached

    static, data = compile_scene_cached(scene)
    O = jnp.asarray(ray.origin, jnp.float32)
    D = jnp.asarray(ray.dir, jnp.float32)
    t, orient, P, N_geo, uv, obj = _first_hit_impl(O, D, data, static)
    return Hit(distance=t, orientation=orient, point=P, normal=N_geo,
               uv=uv, obj_id=obj)
