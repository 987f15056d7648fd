"""Path-recording Pallas kernel + texture replay vs jnp wavefront (CPU interpreter)."""

import numpy as np
import pytest

from raytracer_tpu import (Glossy, Plane, RenderSettings, Scene, Sphere,
                           ThinFilmInterference, image, rgb, vec3)
from raytracer_tpu.backgrounds.environment import procedural_sky
from raytracer_tpu.core.compile import compile_scene
from raytracer_tpu.textures.procedural import checkerboard


def both(sc, spp, seed=0):
    a = np.asarray(sc.render(samples_per_pixel=spp, seed=seed), np.float32) / 255.0
    sc.settings = RenderSettings(use_pallas="always")
    b = np.asarray(sc.render(samples_per_pixel=spp, seed=seed), np.float32) / 255.0
    sc.settings = RenderSettings()
    return a, b


def textured_scene():
    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 0.25, 1), look_at=vec3(0, 0.25, -3),
                  screen_width=20, screen_height=16)
    sc.add_DirectionalLight(Ldir=vec3(0.52, 0.45, -0.5), color=rgb(0.15, 0.15, 0.15))
    gold = Glossy(diff_color=rgb(1.0, 0.572, 0.184),
                  n=vec3(0.15 + 3.58j, 0.4 + 2.37j, 1.54 + 1.91j),
                  roughness=0.0, spec_coeff=0.2, diff_coeff=0.8)
    sc.add(Sphere(material=gold, center=vec3(-0.5, 0.1, -3.0), radius=0.6,
                  max_ray_depth=3))
    floor = Glossy(diff_color=image(checkerboard(64), repeat=40.0),
                   n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j),
                   roughness=0.2, spec_coeff=0.3, diff_coeff=0.9)
    sc.add(Plane(material=floor, center=vec3(0, -0.5, -3.0), width=120.0,
                 height=120.0, u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1),
                 max_ray_depth=3))
    sc.add_Background(procedural_sky(128, 96))
    return sc


def test_routes_to_record_path():
    static, _ = compile_scene(textured_scene())
    assert not static.pallas_ok
    assert static.pallas_tex_ok


def test_textured_statistical_match():
    a, b = both(textured_scene(), 16)
    assert np.allclose(a.reshape(-1, 3).mean(0), b.reshape(-1, 3).mean(0),
                       atol=0.02)
    assert np.abs(a - b).mean() < 0.03


def test_thinfilm_ibl_statistical_match():
    sc = Scene(ambient_color=rgb(0.01, 0.01, 0.01))
    sc.add_Camera(screen_height=16, screen_width=20,
                  look_from=vec3(-4, 0, 0), look_at=vec3(0, 0.05, 0))
    sc.add(Sphere(material=ThinFilmInterference(thickness=330, noise=60.0),
                  center=vec3(1.0, 0.0, 1.5), radius=1.7, shadow=False,
                  max_ray_depth=5))
    sc.add_Background(procedural_sky(128, 96), light_intensity=3.0, blur=4.0)
    a, b = both(sc, 32)
    assert np.allclose(a.reshape(-1, 3).mean(0), b.reshape(-1, 3).mean(0),
                       atol=0.03)


def test_thinfilm_composed_table_matches_jnp():
    """Small custom LUT + noise compose under TF_COMP_LIMIT, so the replay
    resolves thin-film hits with its single-round composed table
    (core/compile.py _tf_composed) — estimator must match the wavefront's
    chained noise->LUT fetch (same quantization by construction)."""
    from raytracer_tpu.core.compile import compile_scene

    rng = np.random.default_rng(11)
    lut = rng.random((64, 128, 3)).astype(np.float32) * 0.9
    noise = rng.random((32, 32)).astype(np.float32)

    def build():
        sc = Scene(ambient_color=rgb(0.02, 0.02, 0.02))
        sc.add_Camera(screen_height=16, screen_width=20,
                      look_from=vec3(-4, 0, 0), look_at=vec3(0, 0.05, 0))
        sc.add(Sphere(material=ThinFilmInterference(
                          thickness=60, noise=40.0, lut=lut,
                          noise_texture=noise),
                      center=vec3(1.0, 0.0, 1.5), radius=1.7, shadow=False,
                      max_ray_depth=4))
        sc.add_Background(procedural_sky(128, 96), light_intensity=2.0,
                          blur=4.0)
        return sc

    static, _ = compile_scene(build())
    assert static.pallas_tex_ok
    assert len(static.thinfilm_comp) == 1    # composed, not fallback

    sc = build()
    a = np.asarray(sc.render(samples_per_pixel=32, seed=4), np.float32) / 255
    sc = build()
    sc.settings = RenderSettings(use_pallas="always")
    b = np.asarray(sc.render(samples_per_pixel=32, seed=4), np.float32) / 255
    assert np.allclose(a.reshape(-1, 3).mean(0), b.reshape(-1, 3).mean(0),
                       atol=0.03)
    assert np.abs(a - b).mean() < 0.03


def test_thinfilm_variance_matches_jnp():
    """Variance-matched cross-path CI (round-3 VERDICT item 8): the record
    kernel's thin-film branch chooser is q-proportional (SceneStatic.tf_selp
    cubic; replay weight F/q), not a fair coin — its per-pixel variance must
    stay within 1.5x of the jnp wavefront's F-proportional chooser (the
    fair coin measured 6.5x on this scene).  The diffuse floor forces
    derive_split_k == 0 so EVERY branch selection is stochastic."""
    from raytracer_tpu import Diffuse, Plane
    from raytracer_tpu.core.compile import compile_scene, derive_split_k

    def build():
        sc = Scene(ambient_color=rgb(0.01, 0.01, 0.01))
        sc.add_Camera(screen_height=16, screen_width=20,
                      look_from=vec3(-4, 0, 0), look_at=vec3(0, 0.05, 0))
        sc.add(Sphere(material=ThinFilmInterference(thickness=330, noise=60.0),
                      center=vec3(1.0, 0.0, 1.5), radius=1.7, shadow=False,
                      max_ray_depth=5))
        sc.add(Plane(material=Diffuse(diff_color=rgb(0.6, 0.5, 0.4)),
                     center=vec3(0, -2.0, 0), width=40.0, height=40.0,
                     u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
        sc.add_Background(procedural_sky(128, 96), light_intensity=3.0,
                          blur=4.0)
        return sc

    static, _ = compile_scene(build())
    assert static.pallas_tex_ok and derive_split_k(static) == 0

    out = {}
    for path, up in (("jnp", "never"), ("record", "always")):
        sc = build()
        sc.settings = RenderSettings(use_pallas=up)
        img, var = sc.render(samples_per_pixel=64, seed=3,
                             with_variance=True, output="linear")
        out[path] = (np.asarray(img), np.asarray(var))
    ratio = out["record"][1].mean() / out["jnp"][1].mean()
    assert ratio < 1.5, ratio
    # and the means still agree (unbiasedness of the F/q weighting)
    assert np.abs(out["record"][0] - out["jnp"][0]).mean() < 0.02


def test_deterministic_split_record_matches_jnp():
    """Thin-film furnace: both branches terminate on the same radiance, so
    with deterministic splitting (reference thin_film_interference.py:75-113
    always carries both) record+replay and jnp agree tightly, not just
    statistically."""
    import numpy as np
    from raytracer_tpu import (Emissive, RenderSettings, Scene, Sphere,
                               ThinFilmInterference, rgb, vec3)
    from raytracer_tpu.core.compile import compile_scene, derive_split_k

    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8, field_of_view=30)
    sc.add(Sphere(material=ThinFilmInterference(thickness=330, noise=0.0),
                  center=vec3(0, 0, 0), radius=0.7, shadow=False,
                  max_ray_depth=3))
    sc.add(Sphere(material=Emissive(color=rgb(0.6, 0.6, 0.6)),
                  center=vec3(0, 0, 0), radius=20.0, shadow=False))
    static, _ = compile_scene(sc)
    assert static.pallas_tex_ok and derive_split_k(static) == 3

    a = np.asarray(sc.render(samples_per_pixel=2, seed=0), np.float32) / 255.0
    sc.settings = RenderSettings(use_pallas="always")
    b = np.asarray(sc.render(samples_per_pixel=2, seed=0), np.float32) / 255.0
    assert np.abs(a[2:6, 2:6] - b[2:6, 2:6]).max() < 0.02, (
        np.abs(a[2:6, 2:6] - b[2:6, 2:6]).max())


def test_rgb9e5_pack_accuracy():
    """Host-side RGB9E5 pack: every texel decodes within 2^-9 of its own
    dominant channel (the shared-exponent error bound), including bright
    HDR outliers that a 10-bit global scale would band to ~max/1023."""
    from raytracer_tpu.core.compile import _pack_e5

    rng = np.random.default_rng(0)
    a = rng.lognormal(mean=-1, sigma=2, size=(64, 128, 3)).astype(np.float32)
    a[5, 7] = (5000.0, 4.0, 0.25)              # sun texel, saturated hue
    a[6, 8] = 0.0
    w = np.asarray(_pack_e5(a)).view(np.uint32)
    e = (w >> 27) & 31
    s = np.exp2(e.astype(np.float32) - 24.0)
    dec = np.stack([((w >> 18) & 511).astype(np.float32) * s,
                    ((w >> 9) & 511).astype(np.float32) * s,
                    (w & 511).astype(np.float32) * s], -1)
    dom = np.maximum(a.max(axis=-1, keepdims=True), 1e-30)
    assert (np.abs(dec - a) <= dom * (2.0 ** -9) + 1e-7).all()
    assert (dec[6, 8] == 0.0).all()


def _hdr_env_scene():
    rng = np.random.default_rng(2)
    env = (0.05 + rng.random((64, 128, 3)).astype(np.float32) * 0.4)
    env[10:14, 30:36] = 40.0                   # small bright sun
    sc = Scene(ambient_color=rgb(0.02, 0.02, 0.02))
    sc.add_Camera(screen_height=16, screen_width=20,
                  look_from=vec3(-4, 0, 0), look_at=vec3(0, 0.05, 0))
    gold = Glossy(diff_color=rgb(1.0, 0.572, 0.184),
                  n=vec3(0.15 + 3.58j, 0.4 + 2.37j, 1.54 + 1.91j),
                  roughness=0.1, spec_coeff=0.3, diff_coeff=0.7)
    sc.add(Sphere(material=gold, center=vec3(1.0, 0.0, 1.5), radius=1.7,
                  max_ray_depth=3))
    sc.add_Background(env, spherical=True, linear=True, light_intensity=0.5)
    return sc


def test_hdr_env_routes_to_record_path():
    """HDR environments no longer force the wavefront: the atlas stores
    them RGB9E5 (core/compile.py), keeping per-texel precision next to a
    bright sun."""
    static, _ = compile_scene(_hdr_env_scene())
    assert static.pallas_tex_ok
    assert any(static.tex_enc)                 # some texture packed as e5


def test_hdr_env_statistical_match():
    a, b = both(_hdr_env_scene(), 32)
    assert np.allclose(a.reshape(-1, 3).mean(0), b.reshape(-1, 3).mean(0),
                       atol=0.03)
    assert np.abs(a - b).mean() < 0.03


def _bilinear_scene():
    sc = textured_scene()
    floor = Glossy(diff_color=image(checkerboard(64), repeat=40.0,
                                    filter="bilinear"),
                   n=vec3(1.2 + 0.3j, 1.2 + 0.3j, 1.1 + 0.3j),
                   roughness=0.2, spec_coeff=0.3, diff_coeff=0.9)
    sc2 = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc2.add_Camera(look_from=vec3(0, 0.25, 1), look_at=vec3(0, 0.25, -3),
                   screen_width=20, screen_height=16)
    sc2.add_DirectionalLight(Ldir=vec3(0.52, 0.45, -0.5),
                             color=rgb(0.15, 0.15, 0.15))
    gold = Glossy(diff_color=rgb(1.0, 0.572, 0.184),
                  n=vec3(0.15 + 3.58j, 0.4 + 2.37j, 1.54 + 1.91j),
                  roughness=0.0, spec_coeff=0.2, diff_coeff=0.8)
    sc2.add(Sphere(material=gold, center=vec3(-0.5, 0.1, -3.0), radius=0.6,
                   max_ray_depth=3))
    sc2.add(Plane(material=floor, center=vec3(0, -0.5, -3.0), width=120.0,
                  height=120.0, u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1),
                  max_ray_depth=3))
    sc2.add_Background(procedural_sky(128, 96))
    return sc2


def test_bilinear_routes_to_record_path():
    """Bilinear-filtered textures replay with a 4-tap fetch instead of
    forcing the whole scene onto the wavefront."""
    static, _ = compile_scene(_bilinear_scene())
    assert static.pallas_tex_ok


def test_bilinear_statistical_match():
    a, b = both(_bilinear_scene(), 16)
    assert np.allclose(a.reshape(-1, 3).mean(0), b.reshape(-1, 3).mean(0),
                       atol=0.02)
    assert np.abs(a - b).mean() < 0.03


def test_tiled_order_and_banding_bit_equal():
    """2D-tiled record order + banded replay vs the flat order (round 4).

    With every branch decision enumerated (split_k covers the depth) the
    path set is deterministic and keyed by (pixel, sample), so the three
    variants — flat, tiled, tiled + banded replay — must agree BIT-exactly:
    the order remap is a pure permutation inverted by a transpose, and
    banding only skips gathers for super-blocks whose lanes provably fetch
    nothing.
    """
    import jax.numpy as jnp

    from raytracer_tpu import Emissive, Refractive
    from raytracer_tpu.core.compile import derive_max_bounces
    from raytracer_tpu.ops.pallas_record import (_tile_dims,
                                                 pallas_record_chunk)

    tex = np.tile(np.linspace(0.1, 1.0, 16, dtype=np.float32)[None, :, None],
                  (16, 1, 3))
    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add(Sphere(material=Refractive(n=vec3(1.5 + 4e-8j, 1.5, 1.5 + 4e-8j)),
                  center=vec3(0, 0, -1.5), radius=0.5, shadow=False,
                  max_ray_depth=3))
    sc.add(Plane(material=Glossy(diff_color=image(tex, repeat=4.0),
                                 roughness=0.2, spec_coeff=0.3,
                                 diff_coeff=0.7, n=vec3(2.2, 2.2, 2.2)),
                 center=vec3(0, -0.5, -3.0), width=12.0, height=12.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1),
                 max_ray_depth=3))
    sc.add(Sphere(material=Emissive(color=image(tex * 3, repeat=1.0)),
                  center=vec3(1.5, 1.5, -1), radius=0.5))
    sc.add_DirectionalLight(Ldir=vec3(0.3, 0.5, 0.4),
                            color=rgb(0.4, 0.4, 0.4))
    sc.add_Camera(look_from=vec3(0, 0.2, 1.0), look_at=vec3(0, 0, -1.5),
                  screen_width=40, screen_height=32)
    static, data = compile_scene(sc)
    assert static.pallas_tex_ok
    assert _tile_dims(40, 32) == (20, 16)
    B = derive_max_bounces(static)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    seed = jnp.asarray([1234, 77, 0], jnp.int32)
    kw = dict(interpret=True, split_k=3, sampler="r2")
    out = {}
    for name, om, bg in (("flat", "flat", 0), ("tiled", "tiled", 0),
                         ("banded", "tiled", 2)):
        L, _ = pallas_record_chunk(seed, data, cam_vec, static, 40, 32, 8, B,
                                   order_mode=om, banding=bg, **kw)
        out[name] = np.asarray(L)
    assert np.array_equal(out["flat"], out["tiled"])
    assert np.array_equal(out["tiled"], out["banded"])


def test_quad_atlas_bit_equal():
    """R5 quad-row fetch (VERDICT r4 #6): the bilinear replay's single
    quad-atlas gather is BIT-identical to the 4-tap gathers — the quad row
    stores exactly the four tap words in the loop's tap order, weights and
    accumulation order unchanged."""
    import jax.numpy as jnp

    from raytracer_tpu.core.compile import derive_max_bounces
    from raytracer_tpu.ops.pallas_record import pallas_record_chunk

    sc = _bilinear_scene()
    static, data = compile_scene(sc)
    assert static.pallas_tex_ok
    assert data.tex_atlas_quad is not None     # bilinear scene -> quads
    B = derive_max_bounces(static)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    seed = jnp.asarray([99, 7, 0], jnp.int32)
    outs = {}
    for qf in (None, False):
        L, _ = pallas_record_chunk(seed, data, cam_vec, static, 20, 16, 8, B,
                                   interpret=True, sampler="r2",
                                   quad_fetch=qf)
        outs[qf] = np.asarray(L)
    assert np.array_equal(outs[None], outs[False])


def test_no_quad_atlas_without_bilinear():
    """Scenes without bilinear textures must not pay the 4x quad atlas."""
    static, data = compile_scene(textured_scene())
    assert static.pallas_tex_ok
    assert data.tex_atlas_quad is None
