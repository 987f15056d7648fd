"""Pallas mega-kernel vs jnp wavefront: equivalence on CPU (TPU interpreter).

The two paths share estimators but draw from different RNG streams, so
stochastic scenes are compared statistically; deterministic scenes
(emissive-only) must match exactly.
"""

import numpy as np
import pytest

from raytracer_tpu import (Cuboid, Diffuse, Emissive, Plane, Refractive,
                           RenderSettings, Scene, Sphere, rgb, vec3)


def both_renders(sc, spp, seed=0):
    a = np.asarray(sc.render(samples_per_pixel=spp, seed=seed), np.float32) / 255.0
    sc.settings = RenderSettings(use_pallas="always")
    b = np.asarray(sc.render(samples_per_pixel=spp, seed=seed), np.float32) / 255.0
    sc.settings = RenderSettings()
    return a, b


def test_emissive_exact():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 0), look_at=vec3(0, 0, -1),
                  screen_width=16, screen_height=16)
    sc.add(Sphere(material=Emissive(color=rgb(0.3, 0.5, 0.7)),
                  center=vec3(0, 0, 0), radius=10.0, shadow=False))
    a, b = both_renders(sc, 2)
    assert np.array_equal(a, b)


def test_box_and_plane_silhouette():
    # different AA-jitter streams => compare at high spp with a tolerance;
    # only silhouette pixels can differ at all
    sc = Scene()
    sc.add_Camera(look_from=vec3(0.3, 0.2, 3), look_at=vec3(0, 0, -1),
                  screen_width=16, screen_height=16)
    cb = Cuboid(material=Emissive(color=rgb(0.9, 0.4, 0.1)),
                center=vec3(0, 0, 0), width=1, height=2, length=1)
    cb.rotate(θ=30, u=vec3(0, 1, 0))
    sc.add(cb)
    sc.add(Plane(material=Emissive(color=rgb(0.1, 0.2, 0.9)),
                 center=vec3(0, -1, 0), width=50.0, height=50.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    a, b = both_renders(sc, 64)
    assert np.abs(a - b).mean() < 0.01
    assert np.abs(a - b).max() < 0.35   # single silhouette pixels, 64 spp jitter


def test_cornell_statistical():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from example_cornellbox import build_cornell

    # z-test on the image mean with the standard error measured from seed
    # scatter — this catches a path-dependent brightness bias (e.g. one path
    # dropping a bounce) that the old channel-mean atol would let through
    seeds = (0, 1, 2)
    va, vb = [], []
    for s in seeds:
        sc = build_cornell(16, 16)
        a, b = both_renders(sc, 24, seed=s)
        va.append(a.mean())
        vb.append(b.mean())
    va, vb = np.asarray(va), np.asarray(vb)
    se = np.sqrt((va.std() ** 2 + vb.std() ** 2) / len(seeds))
    # floor guards the 3-seed SE estimate; 0.01 in mean sRGB is far below
    # the ~20% bias a dropped bounce would cause
    assert abs(va.mean() - vb.mean()) < max(4 * se, 0.01), (va, vb, se)
    # (noise-level comparison lives in test_sharding's Cornell test, where
    # the per-pixel std pooled over 256 pixels is a stable estimator; the
    # 3-seed image-mean std here is chi^2_2-noisy)


def test_glass_statistical():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8, field_of_view=30)
    sc.add(Sphere(material=Refractive(n=vec3(1.5 + 4e-8j, 1.5, 1.5)),
                  center=vec3(0, 0, 0), radius=0.5, shadow=False, max_ray_depth=4))
    sc.add(Sphere(material=Emissive(color=rgb(0.8, 0.6, 0.4)),
                  center=vec3(0, 0, 0), radius=20.0, shadow=False))
    a, b = both_renders(sc, 64)
    assert np.allclose(a.reshape(-1, 3).mean(0), b.reshape(-1, 3).mean(0), atol=0.04)


def test_importance_sampled_diffuse_statistical():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 1, 0.3), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8, field_of_view=30)
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.6, 0.6, 0.6)),
                 center=vec3(0, 0, 0), width=100.0, height=100.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Plane(material=Emissive(color=rgb(0.8, 0.8, 0.8)),
                 center=vec3(0, 3, 0), width=2.0, height=2.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, 1)),
           importance_sampled=True)
    a, b = both_renders(sc, 256)
    assert np.allclose(a[3:5, 3:5].mean(), b[3:5, 3:5].mean(), atol=0.04)


def test_textured_scene_skips_pallas():
    from raytracer_tpu import image
    from raytracer_tpu.core.compile import compile_scene
    from raytracer_tpu.textures.procedural import checkerboard

    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Plane(material=Diffuse(diff_color=image(checkerboard(64))),
                 center=vec3(0, 0, -2), width=10.0, height=10.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    sc.add(Sphere(material=Emissive(color=rgb(1, 1, 1)),
                  center=vec3(0, 0, 0), radius=30.0, shadow=False))
    static, _ = compile_scene(sc)
    assert not static.pallas_ok
    # and the textured render still works through the jnp path
    img = np.asarray(sc.render(samples_per_pixel=4))
    assert img.max() > 0


def test_checkpoint_resume_pallas(tmp_path):
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Sphere(material=Emissive(color=rgb(0.4, 0.6, 0.8)),
                  center=vec3(0, 0, -3), radius=1.5))
    sc.settings = RenderSettings(use_pallas="always")
    ck = str(tmp_path / "ck.npz")
    a = np.asarray(sc.render(samples_per_pixel=4, batch_size=2, seed=5,
                             checkpoint_path=ck))
    b = np.asarray(sc.render(samples_per_pixel=4, batch_size=2, seed=5,
                             checkpoint_path=ck))
    assert np.array_equal(a, b)


def test_deterministic_split_kernel_matches_jnp():
    """Glass furnace: with deterministic splitting both paths' estimates are
    (nearly) RNG-free, so kernel and jnp must agree tightly — not just
    statistically (reference refractive.py:102-110 tree, split_k=3)."""
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8, field_of_view=30)
    sc.add(Sphere(material=Refractive(n=vec3(1.5, 1.5, 1.5)),
                  center=vec3(0, 0, 0), radius=0.7, shadow=False,
                  max_ray_depth=4))
    sc.add(Sphere(material=Emissive(color=rgb(0.6, 0.6, 0.6)),
                  center=vec3(0, 0, 0), radius=20.0, shadow=False))
    from raytracer_tpu.core.compile import compile_scene
    static, _ = compile_scene(sc)
    assert static.pallas_ok
    a, b = both_renders(sc, 2)   # 16 paths each: full pattern blocks
    # interior pixels see the furnace almost exactly via both trees
    assert np.abs(a[2:6, 2:6] - b[2:6, 2:6]).max() < 0.02, (
        np.abs(a[2:6, 2:6] - b[2:6, 2:6]).max())


def test_merged_groups_match_per_slot_blocks():
    """Merged same-kind shading groups (R4.11) vs the pre-merge per-slot
    blocks: per-lane parameter selection must reproduce the per-slot
    kernel's estimator lane-for-lane (identical draws, identical math) —
    only FMA/fusion-level rounding may differ (<= a few ulps observed).

    Scene mixes every mergeable kind with multiple slots: 3 diffuse,
    2 glossy, 2 emissive, 2 refractive materials."""
    import jax.numpy as jnp

    from raytracer_tpu import Glossy
    from raytracer_tpu.core.compile import compile_scene
    from raytracer_tpu.ops.pallas_trace import pallas_trace_chunk

    sc = Scene(ambient_color=rgb(0.05, 0.05, 0.05))
    sc.add_Camera(look_from=vec3(0, 0.5, 2.5), look_at=vec3(0, 0.3, 0),
                  screen_width=16, screen_height=16, field_of_view=45)
    sc.add_DirectionalLight(Ldir=vec3(0.3, -1, -0.4), color=rgb(1, 1, 1))
    sc.add(Plane(material=Diffuse(diff_color=rgb(0.7, 0.7, 0.7)),
                 center=vec3(0, 0, 0), width=8.0, height=8.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.8, 0.2, 0.2)),
                  center=vec3(-0.9, 0.3, 0), radius=0.3))
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.2, 0.2, 0.8),
                                   ambient_weight=0.3),
                  center=vec3(-0.3, 0.3, 0), radius=0.3))
    sc.add(Sphere(material=Glossy(diff_color=rgb(0.4, 0.6, 0.4),
                                  n=vec3(1.5, 1.5, 1.5), roughness=0.3,
                                  spec_coeff=0.3, diff_coeff=0.7),
                  center=vec3(0.3, 0.3, 0), radius=0.3))
    sc.add(Sphere(material=Glossy(diff_color=rgb(0.6, 0.4, 0.2),
                                  n=vec3(2.0, 2.0, 2.0), roughness=0.0,
                                  spec_coeff=0.5, diff_coeff=0.5),
                  center=vec3(0.9, 0.3, 0), radius=0.3))
    sc.add(Sphere(material=Refractive(n=vec3(1.5, 1.5, 1.5)),
                  center=vec3(-0.6, 0.9, -0.6), radius=0.25, shadow=False))
    sc.add(Sphere(material=Refractive(n=vec3(1.3, 1.3, 1.3)),
                  center=vec3(0.6, 0.9, -0.6), radius=0.25, shadow=False))
    sc.add(Sphere(material=Emissive(color=rgb(2, 2, 1.8)),
                  center=vec3(0, 2.5, 0), radius=0.4, shadow=False))
    sc.add(Sphere(material=Emissive(color=rgb(0.5, 1.5, 2.0)),
                  center=vec3(2, 2.0, -2), radius=0.4, shadow=False))

    static, data = compile_scene(sc)
    assert static.pallas_ok
    _, _, settings = sc._settings_for_render(False)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    seed = jnp.array([77, 778, 0], jnp.int32)
    out = {}
    for merge in (True, False):
        L, _ = pallas_trace_chunk(
            seed, data, cam_vec, static, 16, 16, 4, 6, True,
            settings.split_k, settings.sampler, settings.projection,
            merge_groups=merge)
        out[merge] = np.asarray(L)
    assert np.allclose(out[True], out[False], atol=1e-5), (
        np.abs(out[True] - out[False]).max())


def test_merged_dispersive_pair_statistical():
    """ADVICE r4: two dispersion=True refractive materials share ONE merged
    block (the 'extra' group-key term) and therefore ONE hero-wavelength
    draw (hu) per bounce, where the per-slot kernel draws hu in each
    slot's own block at different RNG counters.  Merged vs unmerged are
    thus NOT lane-exact on this path — but the estimator must agree
    statistically (same hero-selection distribution, 3x one-hot weights)."""
    import jax.numpy as jnp

    from raytracer_tpu.core.compile import compile_scene
    from raytracer_tpu.ops.pallas_trace import pallas_trace_chunk

    sc = Scene(ambient_color=rgb(0.02, 0.02, 0.02))
    sc.add_Camera(look_from=vec3(0, 0, 2.2), look_at=vec3(0, 0, 0),
                  screen_width=16, screen_height=16, field_of_view=40)
    sc.add(Sphere(material=Refractive(n=vec3(1.45 + 0j, 1.52 + 0j,
                                             1.60 + 0j), dispersion=True),
                  center=vec3(-0.45, 0, 0), radius=0.42, shadow=False,
                  max_ray_depth=4))
    sc.add(Sphere(material=Refractive(n=vec3(1.30 + 0j, 1.34 + 0j,
                                             1.38 + 0j), dispersion=True),
                  center=vec3(0.45, 0, 0), radius=0.42, shadow=False,
                  max_ray_depth=4))
    sc.add(Sphere(material=Emissive(color=rgb(1.5, 1.3, 1.1)),
                  center=vec3(0, 0, 0), radius=25.0, shadow=False))

    static, data = compile_scene(sc)
    assert static.pallas_ok and static.has_dispersion
    # both dispersive slots must land in ONE merged group
    from raytracer_tpu.materials.base import MAT_REFRACTIVE
    refr_slots = {r.mat_slot for r in static.obj_records
                  if r.mat_type == MAT_REFRACTIVE}
    assert len(refr_slots) == 2
    _, _, settings = sc._settings_for_render(False)
    cam = sc.camera.params()
    cam_vec = jnp.concatenate([
        cam.origin, cam.fwd, cam.right, cam.up,
        jnp.stack([cam.cam_w, cam.cam_h, cam.lens_radius, cam.focal,
                   cam.half_fov])])
    out = {}
    for merge in (True, False):
        acc = []
        for s in (5, 6):
            seed = jnp.array([s, 100 + s, 0], jnp.int32)
            L, _ = pallas_trace_chunk(
                seed, data, cam_vec, static, 16, 16, 32,
                settings.max_bounces, True, settings.split_k,
                settings.sampler, settings.projection, merge_groups=merge)
            acc.append(np.asarray(L))
        out[merge] = np.concatenate(acc)
    # not lane-exact (hu counters differ) — compare channel means against
    # the seed-to-seed noise of the estimator itself
    m_t = out[True].mean(axis=0)
    m_f = out[False].mean(axis=0)
    assert np.all(np.isfinite(out[True])) and np.all(np.isfinite(out[False]))
    assert np.allclose(m_t, m_f, rtol=0.05, atol=0.01), (m_t, m_f)


def test_aa_plane_isect_bit_equal_generic():
    """R5 axis-aligned plane fast path: for every +-unit-axis frame, the
    statically component-selected formula must match the generic
    three-dot-product formula BIT-exactly on random rays (the dropped
    terms are exact *0/+0 in f32)."""
    import itertools

    import jax.numpy as jnp

    from raytracer_tpu.ops.pallas_trace import _isect_plane

    rng = np.random.default_rng(5)
    N = 4096
    O = rng.uniform(-3, 3, (3, N)).astype(np.float32)
    D = rng.normal(size=(3, N)).astype(np.float32)
    D /= np.linalg.norm(D, axis=0, keepdims=True)
    for nax, nsg in itertools.product(range(3), (1.0, -1.0)):
        uax = (nax + 1) % 3
        vax = (nax + 2) % 3
        for usg, vsg in ((1.0, -1.0), (-1.0, 1.0), (1.0, 1.0)):
            n = np.zeros(3, np.float32)
            u = np.zeros(3, np.float32)
            v = np.zeros(3, np.float32)
            n[nax], u[uax], v[vax] = nsg, usg, vsg
            c = rng.uniform(-2, 2, 3).astype(np.float32)
            g = [jnp.float32(x) for x in
                 list(c) + list(u) + list(v) + list(n) + [1.5, 0.8]]
            args = [jnp.asarray(x) for x in (*O, *D)]
            t_gen, o_gen = _isect_plane(g, *args)
            t_aa, o_aa = _isect_plane(
                g, *args, aa=((nax, nsg), (uax, usg), (vax, vsg)))
            assert np.array_equal(np.asarray(t_gen), np.asarray(t_aa)), (
                nax, nsg, usg, vsg)
            assert np.array_equal(np.asarray(o_gen), np.asarray(o_aa))


def test_aa_detection_on_cornell():
    """All six Cornell walls carry exact unit-axis frames -> ObjRecord.aa
    set; a rotated plane must stay generic."""
    import sys as _s
    from pathlib import Path as _P
    _s.path.insert(0, str(_P(__file__).resolve().parent.parent / "examples"))
    from example_cornellbox import build_cornell

    from raytracer_tpu.core.compile import compile_scene

    static, _ = compile_scene(build_cornell(32, 32))
    aa_planes = [r for r in static.obj_records
                 if r.kind == "plane" and r.aa is not None]
    assert len(aa_planes) == 6

    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8)
    p = Plane(material=Diffuse(diff_color=rgb(0.5, 0.5, 0.5)),
              center=vec3(0, 0, 0), width=2.0, height=2.0,
              u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0))
    p.rotate(θ=30, u=vec3(0, 0, 1))
    sc.add(p)
    static2, _ = compile_scene(sc)
    rot = [r for r in static2.obj_records if r.kind == "plane"]
    assert rot and all(r.aa is None for r in rot)
