"""Gradient-safe math primitives.

`jnp.sqrt(jnp.maximum(0.0, x))` is the standard masked-sqrt idiom on the
forward pass, but its backward pass is NaN at the saturation boundary:
sqrt'(0) = inf and the max-gradient is 0, so the chain rule evaluates
0 * inf.  One NaN cotangent then poisons every upstream gradient it is
accumulated into.  This bites exactly where ray tracers saturate — missed
sphere discriminants, total internal reflection, grazing spherical caps —
so `jax.grad` through the renderer returns NaN unless these sites use the
double-where form below.

`safe_sqrt` is value-identical to `sqrt(max(0, x))` except on the measure-
zero sliver 0 < x <= eps (where it returns sqrt(eps) ~ 1e-15 instead of a
smaller positive number), and its gradient is finite everywhere: 0 for
x <= 0, clamped near the boundary.
"""

import jax.numpy as jnp

__all__ = ["safe_sqrt", "safe_norm"]


def safe_sqrt(x, eps=1e-30):
    """sqrt(max(0, x)) with a finite gradient everywhere."""
    r = jnp.sqrt(jnp.maximum(x, eps))
    return jnp.where(x > 0, r, 0.0)


def safe_norm(v, axis=-1, keepdims=False, eps=1e-30):
    """``jnp.linalg.norm(v, axis)`` with a finite gradient at v = 0.

    norm's own VJP is v/||v|| = 0/0 at the origin, and a downstream
    ``maximum(norm, tiny)`` guard only protects the *division* that follows,
    not norm's backward pass.  Value-identical to the l2 norm away from 0.
    """
    return safe_sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims), eps)
