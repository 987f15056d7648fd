"""PDF class hierarchy — API parity with sightpy/utils/random.py:21-174.

The engine itself samples through the pure functions in core/rng.py (threefry
keys, jit-safe); these thin classes reproduce the reference's object API
(`pdf.generate()` / `pdf.value(dir)`) for users who built on it.  Each
`generate` takes an explicit PRNG key — the reference's hidden global numpy
RNG is exactly what made its renders irreproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng

random_in_unit_disk = rng.random_in_unit_disk
random_in_unit_sphere = rng.random_in_unit_sphere
random_in_unit_spherical_cap = rng.spherical_cap_sample


class PDF:
    """Probability density function over directions."""

    def value(self, ray_dir):
        raise NotImplementedError

    def generate(self, key):
        raise NotImplementedError


class hemisphere_pdf(PDF):
    def __init__(self, shape, normal):
        self.shape = shape
        self.normal = normal

    def value(self, ray_dir):
        return rng.hemisphere_pdf_value(ray_dir, self.normal)

    def generate(self, key):
        return rng.hemisphere_sample(key, self.normal)


class cosine_pdf(PDF):
    def __init__(self, shape, normal):
        self.shape = shape
        self.normal = normal

    def value(self, ray_dir):
        return rng.cosine_pdf_value(ray_dir, self.normal)

    def generate(self, key):
        return rng.cosine_sample(key, self.normal)


class spherical_caps_pdf(PDF):
    """Union-of-caps toward importance-sampled primitives.

    `importance_sampled_list` accepts primitives (with .center /
    .bounded_sphere_radius) like the reference, or explicit arrays.
    """

    def __init__(self, shape, origin, importance_sampled_list):
        self.shape = shape
        self.origin = origin
        if hasattr(importance_sampled_list[0], "center"):
            self.centers = jnp.asarray(
                [p.center for p in importance_sampled_list], jnp.float32)
            self.radii = jnp.asarray(
                [p.bounded_sphere_radius for p in importance_sampled_list],
                jnp.float32)
        else:
            self.centers, self.radii = importance_sampled_list

    def value(self, ray_dir):
        return rng.caps_pdf_value(ray_dir, self.origin, self.centers, self.radii)

    def generate(self, key):
        return rng.caps_sample(key, self.origin, self.centers, self.radii)


class mixed_pdf(PDF):
    def __init__(self, shape, pdf1, pdf2, pdf1_weight=0.5):
        self.shape = shape
        self.pdf1 = pdf1
        self.pdf2 = pdf2
        self.pdf1_weight = pdf1_weight
        self.pdf2_weight = 1.0 - pdf1_weight

    def value(self, ray_dir):
        return (self.pdf1.value(ray_dir) * self.pdf1_weight
                + self.pdf2.value(ray_dir) * self.pdf2_weight)

    def generate(self, key):
        k_mix, k1, k2 = jax.random.split(key, 3)
        d1 = self.pdf1.generate(k1)
        d2 = self.pdf2.generate(k2)
        use1 = jax.random.uniform(k_mix, d1.shape[:-1]) < self.pdf1_weight
        return jnp.where(use1[..., None], d1, d2)


def random_in_unit_spherical_caps(key, shape, origin, importance_sampled_list):
    """Sample the caps union and return (direction, pdf) — reference
    random.py:177-236."""
    pdf = spherical_caps_pdf(shape, origin, importance_sampled_list)
    d = pdf.generate(key)
    return d, pdf.value(d)
