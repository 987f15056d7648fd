"""Deterministic Fresnel splitting: expectation equivalence past the cap.

The reference carries BOTH Fresnel branches at every refractive / thin-film
hit — an unbounded 2^depth tree (refractive.py:103-110).  This engine
enumerates branch patterns deterministically only to split_k levels
(derive_split_k caps at 3 by default: the 2^k sample multiplier IS the
reference's own cost model, and 2^3 already covers every shipped workload's
visible branch noise) and falls back to the stochastic single-branch
estimator for deeper splits.  That fallback is unbiased by construction
(branch picked with probability p, weighted 1/p), but VERDICT r3 flagged
that nothing TESTED expectation equivalence at depth > 3.  This file pins
it: a depth-5 Whitted scene rendered with the capped split (k=3, stochastic
levels 4-5) must agree in expectation with the FULL enumeration (k=5 — the
exact reference tree, zero branch noise).

The z-test uses the engine's own per-pixel variance of the mean
(render(with_variance=True)); with the full enumeration's variance ~0 and
the capped render's variance measured, |mean difference| must sit within
normal-theory bounds.
"""

import numpy as np

from raytracer_tpu import (Glossy, Plane, Refractive, RenderSettings, Scene,
                           Sphere, rgb, vec3)
from raytracer_tpu.core.compile import compile_scene, derive_split_k


def _scene(split_k):
    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    glass = Refractive(n=vec3(1.5 + 4e-8j, 1.5 + 0.0j, 1.5 + 4e-8j))
    floor = Glossy(diff_color=rgb(0.6, 0.5, 0.4), roughness=0.2,
                   spec_coeff=0.3, diff_coeff=0.7, n=vec3(2.2, 2.2, 2.2))
    sc.add(Sphere(material=glass, center=vec3(0.0, 0.0, -1.5), radius=0.6,
                  shadow=False, max_ray_depth=5))
    sc.add(Plane(material=floor, center=vec3(0, -0.5, -3.0), width=8.0,
                 height=8.0, u_axis=vec3(1.0, 0, 0), v_axis=vec3(0, 0, -1.0),
                 max_ray_depth=5))
    sc.add_DirectionalLight(Ldir=vec3(0.3, 0.5, 0.4), color=rgb(0.4, 0.4, 0.4))
    sc.add_Camera(look_from=vec3(0, 0.1, 1.0), look_at=vec3(0, 0, -1.5),
                  screen_width=12, screen_height=10)
    sc.settings = RenderSettings(split_k=split_k)
    return sc


def test_derive_split_k_caps_at_three():
    static, _ = compile_scene(_scene(0))
    assert derive_split_k(static) == 3          # depth 5 scene, default cap
    assert derive_split_k(static, cap=5) == 5   # cap override reaches depth


def test_capped_split_matches_full_enumeration_in_expectation():
    # full enumeration at k=5: every one of the 2^5 branch patterns is a
    # deterministic sample — the exact expectation of the reference's tree
    # (branch noise is exactly zero; only AA jitter noise remains, and the
    # fixed camera lattice is shared by both renders at equal spp).
    full, var_f = _scene(5).render(samples_per_pixel=128, seed=3,
                                   output="linear", with_variance=True)
    capped, var_c = _scene(3).render(samples_per_pixel=128, seed=3,
                                     output="linear", with_variance=True)
    full = np.asarray(full)
    capped = np.asarray(capped)
    se = np.sqrt(np.asarray(var_c) + np.asarray(var_f) + 1e-12)
    z = (np.asarray(capped) - full) / se
    # per-pixel z within normal-theory bounds for ~360 pixel-channels,
    # plus a global mean-bias gate far below visible levels
    assert np.percentile(np.abs(z), 99) < 3.5, np.percentile(np.abs(z), 99)
    assert abs(capped.mean() - full.mean()) < 4.0 * se.mean() / np.sqrt(z.size)
