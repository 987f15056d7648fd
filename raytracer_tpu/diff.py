"""Differentiable rendering: inverse rendering by gradient descent.

The fork's distinguishing use case is simulation-based inference of material
parameters: `Training_raytracer.ipynb` renders per-ray data at known
refraction indices and trains likelihood-free models (NDE/ROLR/...) to
invert the renderer.  This engine's simulator is pure JAX, so the renderer
inverts *itself*: `jax.grad` flows through the wavefront integrator with
respect to the compiled scene tables — refraction indices, absorption,
material colors, light colors, ambient — and parameters can be recovered by
plain gradient descent on a pixel loss, no learned surrogate needed.
See `examples/inverse_rendering.py` and `tests/test_diff.py`.

What differentiates and what doesn't:

* Supported: any float leaf of the `SceneData` pytree that shading math
  consumes — `data.mats.*` (IoR, colors, roughness, film thickness scale),
  `data.lights.*`, `data.ambient_color`, `data.scene_n_*`, texture planes.
* Discrete events — which object a ray hits, refl/refr branch choice,
  texel indices — are piecewise-constant in the parameters: they contribute
  zero gradient (the standard "interior" derivative).  Geometry parameters
  (`data.geom.*`) therefore get shading gradients but NO silhouette
  gradients; moving an edge is invisible to `jax.grad` here.
* The estimator is fixed-sample Monte Carlo: with a fixed `seed` the image
  is a deterministic function of the parameters, so gradients are exact
  derivatives of the *estimate* (the reparameterization trick comes free —
  random draws depend only on counters, never on parameters).

Gradient numerics: the shading/intersection kernels use `safe_sqrt`
(core/safemath.py) at every masked-saturation site, so gradients stay
finite through total internal reflection, missed-sphere discriminants, and
grazing importance caps.

This path uses the jnp wavefront integrator (core/integrator.py) — the
Pallas kernels have no VJP rules.  Renders are chunked with the same
HBM/spp bounds as `Scene.render`, accumulated under a rematerialized
`lax.scan` (`jax.checkpoint`), so forward AND gradient memory stay bounded
by one chunk at any resolution/spp.  For optimizer robustness against the
rare degenerate float32 sample, wrap losses with `safe_value_and_grad`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .core.scene import MAX_RAYS_PER_CHUNK, _render_chunk
from .parallel.sharded import plan_spp_per_device

__all__ = ["differentiable_render", "differentiable_render_sharded",
           "safe_value_and_grad", "update_materials", "update_lights"]


def differentiable_render(scene, samples_per_pixel, seed=0):
    """Build a differentiable render function for `scene`.

    Returns `(render_fn, data)`:

    * `data` — the scene compiled to its `SceneData` pytree of flat device
      tables (the leaves are the differentiable parameters).
    * `render_fn(data) -> (H, W, 3)` linear-sRGB radiance, jit-compiled,
      deterministic in `seed`, differentiable w.r.t. `data`'s float leaves.

    `samples_per_pixel` follows `Scene.render` semantics (the diffuse fan
    and deterministic Fresnel split multiply the paths actually traced).

    Typical use::

        fn, data = differentiable_render(scene, samples_per_pixel=8)
        target = fn(data)                      # or a photograph
        def loss(n_re):
            d = update_materials(data, refr_n_re=n_re)
            return jnp.mean((fn(d) - target) ** 2)
        g = jax.grad(loss)(data.mats.refr_n_re)
    """
    if scene.camera is None:
        raise ValueError("scene has no camera; call add_Camera first")
    if samples_per_pixel < 1:
        raise ValueError("samples_per_pixel must be >= 1")
    static, data, settings = scene._settings_for_render(False)
    cam = scene.camera.params()
    width = scene.camera.screen_width
    height = scene.camera.screen_height
    # one shared eff-spp derivation (diffuse fan x 2^split_k pattern blocks)
    eff_spp = plan_spp_per_device(samples_per_pixel, scene._diffuse_fan(),
                                  settings.split_k, n_sample=1)
    # Scene.render's chunk bounds apply here too: the 4M-ray HBM bound
    # (tighter for clustered mesh scenes — relay stalls on long single
    # executions, core/scene.py) and the 128-spp Pallas-free chunk cap.
    max_rays = MAX_RAYS_PER_CHUNK
    if data.geom.tri_cl_lo.shape[0]:
        max_rays = 1 << 19
    split_fan = 1 << settings.split_k
    chunk = max(1, min(eff_spp, 128, max_rays // (width * height)))
    chunk = max(split_fan, chunk - chunk % split_fan)
    n_chunks = -(-eff_spp // chunk)
    total = n_chunks * chunk
    key = jax.random.PRNGKey(seed)

    # R2 lattice state, continued across chunks exactly as Scene.render does
    strat_seed = jax.random.randint(key, (), 0, 2 ** 31 - 1, dtype=jnp.int32)

    if n_chunks == 1:
        def render_fn(d):
            L, _ = _render_chunk(key, d, cam, static, settings,
                                 width, height, chunk,
                                 strat_seed=strat_seed, sample0=jnp.int32(0))
            return (L / total).reshape(height, width, 3)
    else:
        # accumulate chunks under lax.scan with a rematerialized body: the
        # backward pass re-traces one chunk at a time instead of storing
        # every chunk's wavefront residuals (jax.checkpoint), so gradient
        # memory is bounded by ONE chunk regardless of spp/resolution
        def render_fn(d):
            @jax.checkpoint
            def _body(acc, i):
                k_i = jax.random.fold_in(key, i)
                L, _ = _render_chunk(k_i, d, cam, static, settings,
                                     width, height, chunk,
                                     strat_seed=strat_seed,
                                     sample0=i.astype(jnp.int32) * chunk)
                return acc + L, None

            acc0 = jnp.zeros((height * width, 3), jnp.float32)
            L, _ = jax.lax.scan(_body, acc0, jnp.arange(n_chunks))
            return (L / total).reshape(height, width, 3)

    return render_fn, data


def differentiable_render_sharded(scene, samples_per_pixel, mesh=None,
                                  seed=0):
    """`differentiable_render` across a ("sample", "pixel") device mesh.

    Same contract — returns `(render_fn, data)` with `render_fn(data)` a
    jit-compiled `(H, W, 3)` linear-sRGB radiance mean — but the forward
    pass runs under `shard_map`: each device traces its shard of the
    samples and the per-pixel radiance sum is one `psum` over the sample
    axis.  `jax.grad` differentiates straight through the collective (the
    psum transposes to a broadcast), so every device computes its shard of
    the gradient and the result is exactly the data-parallel gradient —
    the multi-chip analogue of gradient accumulation.

    The sharded path is pinned to the differentiable jnp wavefront
    (`force_jnp=True`): the Pallas kernels have no VJP rules.
    """
    from .parallel.sharded import build_sharded_render, make_mesh

    if scene.camera is None:
        raise ValueError("scene has no camera; call add_Camera first")
    if samples_per_pixel < 1:
        raise ValueError("samples_per_pixel must be >= 1")
    mesh = mesh or make_mesh()
    static, data, settings = scene._settings_for_render(False)
    width = scene.camera.screen_width
    height = scene.camera.screen_height
    n_sample = mesh.shape["sample"]
    spp_per_device = plan_spp_per_device(samples_per_pixel,
                                         scene._diffuse_fan(),
                                         settings.split_k, n_sample)
    run = build_sharded_render(static, settings, mesh, width, height,
                               spp_per_device, force_jnp=True)
    key = jax.random.PRNGKey(seed)
    cam = scene.camera.params()
    total = n_sample * spp_per_device

    def render_fn(d):
        return (run(key, d, cam) / total).reshape(height, width, 3)

    return render_fn, data


def safe_value_and_grad(fun, **kwargs):
    """`jax.value_and_grad(fun)` with non-finite gradient leaves zeroed.

    The renderer's gradients are exact, but float32 path tracing has rare
    degenerate samples (grazing-angle roundoff, ~1e-7/ray historically;
    core/scene.py scrubs their forward VALUES).  A `where`-scrub cannot
    repair the backward pass — a zero cotangent times an infinite partial
    is still NaN — and a single such sample makes the summed gradient NaN
    for EVERY parameter leaf.  Over an optimization run tracing millions
    of samples, one bad draw would then NaN the parameters permanently
    (`optax.apply_updates(params, nan)` never recovers).

    This wrapper keeps optimization loops robust: any non-finite leaf of
    the gradient is replaced with zeros, so the optimizer simply takes no
    step from that leaf that iteration.  Use it anywhere you would use
    `jax.value_and_grad` on a loss through `differentiable_render`.
    """
    vg = jax.value_and_grad(fun, **kwargs)

    def wrapped(*args, **kw):
        v, g = vg(*args, **kw)
        g = jax.tree_util.tree_map(
            lambda x: jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x)), g)
        return v, g

    return wrapped


def update_materials(data, **fields):
    """Functionally replace `MaterialTables` leaves on a `SceneData`.

    `update_materials(data, refr_n_re=x)` returns a new SceneData whose
    material table has `refr_n_re = x` — the pattern for differentiating
    w.r.t. one named parameter table.
    """
    return dataclasses.replace(
        data, mats=dataclasses.replace(data.mats, **fields))


def update_lights(data, **fields):
    """Functionally replace `LightTables` leaves on a `SceneData`."""
    return dataclasses.replace(
        data, lights=dataclasses.replace(data.lights, **fields))
