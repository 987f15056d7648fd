"""Custom-material showcase: user-defined wavefront shaders.

The reference's extensibility story is subclassing Material with a recursive
numpy get_color (sightpy/materials/material.py:11-44).  Here a material is a
wavefront hook: subclass CustomMaterial, implement shade(ctx) -> ShadeOut in
jax.numpy over the whole (N, ...) ray wavefront, and the integrator compiles
it into the per-bounce dispatch alongside the built-ins.

Two shaders the built-in set cannot express:
  * Iridescent — view-angle-dependent hue from N·D (a cheap pearlescent
    look), path terminates at the hit.
  * ToonMirror — quantized-diffuse toon bands toward the key light plus a
    mirror continuation, showing custom shaders can continue paths and mix
    with built-in materials (the glossy floor and emissive sky).
"""

import dataclasses
import sys
from pathlib import Path

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from raytracer_tpu import *  # noqa: E402,F401,F403
from raytracer_tpu import CustomMaterial, default_shade_out  # noqa: E402


class Iridescent(CustomMaterial):
    """Hue cycles with the view angle (N·D); no continuation."""

    def __init__(self, brightness=1.0):
        super().__init__()
        self.brightness = float(brightness)

    def shade(self, ctx):
        f = jnp.abs(jnp.sum(ctx.D * ctx.N, axis=-1, keepdims=True))
        col = self.brightness * jnp.concatenate(
            [0.5 + 0.5 * jnp.cos(6.2832 * (f + 0.00)),
             0.5 + 0.5 * jnp.cos(6.2832 * (f + 0.33)),
             0.5 + 0.5 * jnp.cos(6.2832 * (f + 0.67))], axis=-1)
        return dataclasses.replace(default_shade_out(ctx), add=col)


class ToonMirror(CustomMaterial):
    """Quantized Lambert toward a fixed key direction + mirror continuation."""

    def __init__(self, color=(0.2, 0.45, 0.8), key_dir=(0.4, 0.8, 0.45),
                 bands=3, mirror=0.35):
        super().__init__()
        self.color = tuple(color)
        # keep host-side (plain tuple): creating a device array here would
        # initialize the jax backend before the embedding code configures it
        s = sum(x * x for x in key_dir) ** 0.5
        self.key_dir = tuple(x / s for x in key_dir)
        self.bands = int(bands)
        self.mirror = float(mirror)

    def shade(self, ctx):
        n = ctx.P.shape[0]
        key_dir = jnp.asarray(self.key_dir, jnp.float32)
        lam = jnp.clip(jnp.sum(ctx.N * key_dir, axis=-1), 0.0, 1.0)
        toon = jnp.ceil(lam * self.bands) / self.bands
        add = toon[..., None] * jnp.asarray(self.color, jnp.float32)
        d = ctx.D - ctx.N * (2.0 * jnp.sum(ctx.D * ctx.N, axis=-1,
                                           keepdims=True))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return dataclasses.replace(
            default_shade_out(ctx),
            add=add,
            beta_mult=jnp.full((n, 3), self.mirror, ctx.P.dtype),
            new_origin=ctx.P + ctx.N * ctx.eps[..., None],
            new_dir=d,
            cont=ctx.depth < ctx.obj_max_depth,
            is_reflection=jnp.ones((n,), bool))


def build_scene(width=400, height=300):
    Sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    Sc.add_Camera(look_from=vec3(0, 0.35, 1), look_at=vec3(0, 0.25, -3),
                  screen_width=width, screen_height=height)
    Sc.add_DirectionalLight(Ldir=vec3(0.4, 0.8, 0.45),
                            color=rgb(0.2, 0.2, 0.2))
    Sc.add(Sphere(material=Iridescent(), center=vec3(-0.8, 0.1, -3.0),
                  radius=0.55, max_ray_depth=3))
    Sc.add(Sphere(material=ToonMirror(), center=vec3(0.8, 0.1, -3.0),
                  radius=0.55, max_ray_depth=3))
    Sc.add(Plane(material=Glossy(diff_color=rgb(0.65, 0.62, 0.6),
                                 n=vec3(1.5, 1.5, 1.5), roughness=0.3,
                                 spec_coeff=0.2, diff_coeff=0.8),
                 center=vec3(0, -0.45, -3), width=12.0, height=12.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1),
                 max_ray_depth=3))
    Sc.add(Sphere(material=Emissive(color=rgb(8.0, 8.0, 8.5)),
                  center=vec3(2.5, 4.0, -1.0), radius=1.2, shadow=False))
    return Sc


if __name__ == "__main__":
    Sc = build_scene()
    img = Sc.render(samples_per_pixel=32)
    img.save("EXAMPLE_CUSTOM.png")
    print("saved EXAMPLE_CUSTOM.png")
