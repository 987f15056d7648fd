"""Coverage for the remaining reference components: animation, normal maps,
panorama/skybox, blur preprocessing, thin-film e2e, TriangleMesh."""

import numpy as np
import pytest

from raytracer_tpu import (Diffuse, Emissive, Glossy, Plane, Scene, Sphere,
                           ThinFilmInterference, TriangleMesh, create_animation,
                           rgb, vec3)
from raytracer_tpu.backgrounds.environment import procedural_sky


def tiny_scene():
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Sphere(material=Emissive(color=rgb(0.9, 0.3, 0.1)),
                  center=vec3(0, 0, -1), radius=0.8))
    return sc


def test_create_animation(tmp_path):
    sc = tiny_scene()
    moved = []

    def update(scene, t):
        moved.append(t)
        scene.camera.look_from = np.array([0.0, 0.0, 2.0 + t])

    create_animation(sc, samples_per_pixel=1, fps=2, start_time=0.0,
                     final_time=1.0, update_scene=update, name="anim",
                     frames_dir=str(tmp_path))
    frames = sorted(tmp_path.glob("anim_*.png"))
    assert len(frames) == 2
    # every frame time visited (render_frames pre-calls times[0] once to fix
    # the scene structure, so update_scene may run an extra time)
    assert 0.0 in moved and 0.5 in moved


def test_normal_map_changes_shading():
    def render(with_map):
        sc = Scene(ambient_color=rgb(0, 0, 0))
        sc.add_Camera(look_from=vec3(0, 2, 2), look_at=vec3(0, 0, 0),
                      screen_width=8, screen_height=8, field_of_view=30)
        sc.add_DirectionalLight(Ldir=vec3(0.3, 1, 0.2), color=rgb(1, 1, 1))
        mat = Glossy(diff_color=rgb(0.5, 0.5, 0.5), roughness=0.0,
                     spec_coeff=0.0, diff_coeff=1.0, n=vec3(1.0, 1.0, 1.0))
        if with_map:
            # strong tangent-space perturbation: x-tilted normals
            nm = np.zeros((8, 8, 3), np.float32)
            nm[..., 0] = 0.9   # decoded: (0.8, -1, 0.6)-ish, non-vertical
            nm[..., 1] = 0.0
            nm[..., 2] = 0.8
            mat.set_normalmap(nm, repeat=1.0)
        sc.add(Plane(material=mat, center=vec3(0, 0, 0), width=10.0, height=10.0,
                     u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1), max_ray_depth=1))
        return np.asarray(sc.render(samples_per_pixel=2, seed=0), np.float32)

    flat = render(False)
    bumped = render(True)
    assert not np.allclose(flat, bumped)


def test_normal_map_on_sphere_supported():
    """Sphere normal maps are supported (analytic spherical tangent frame;
    closed-form direction check in test_texture_filter.py).  A neutral map
    renders finite."""
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 2), look_at=vec3(0, 0, -1),
                  screen_width=4, screen_height=4)
    mat = Diffuse(diff_color=rgb(0.5, 0.5, 0.5))
    mat.set_normalmap(np.full((4, 4, 3), 0.5, np.float32))
    sc.add(Sphere(material=mat, center=vec3(0, 0, -1), radius=0.5))
    img = sc.render(samples_per_pixel=1, seed=0, output="linear")
    assert np.isfinite(np.asarray(img)).all()


def test_skybox_and_panorama_backgrounds():
    sky = procedural_sky(128, 96)
    for spherical in (False, True):
        sc = Scene()
        sc.add_Camera(look_from=vec3(0, 0, 0), look_at=vec3(0, 0.2, -1),
                      screen_width=8, screen_height=8)
        sc.add_Background(sky, spherical=spherical)
        img = np.asarray(sc.render(samples_per_pixel=2), np.float32) / 255.0
        assert img.mean() > 0.05, f"spherical={spherical} rendered black"


def test_skybox_lightmap_ibl():
    # light_intensity adds the lightmap only for secondary rays: a diffuse
    # floor under the sky gets brighter when light_intensity rises
    def render(li):
        sc = Scene()
        sc.add_Camera(look_from=vec3(0, 1, 3), look_at=vec3(0, 0, 0),
                      screen_width=8, screen_height=8, field_of_view=30)
        sc.add(Plane(material=Diffuse(diff_color=rgb(0.7, 0.7, 0.7)),
                     center=vec3(0, 0, 0), width=50.0, height=50.0,
                     u_axis=vec3(1, 0, 0), v_axis=vec3(0, 0, -1)))
        sc.add_Background(procedural_sky(64, 48), light_intensity=li)
        return np.asarray(sc.render(samples_per_pixel=16, seed=1), np.float32).mean()

    assert render(4.0) > render(0.0) + 1.0


def test_blur_skybox_array():
    from raytracer_tpu.backgrounds.blur import blur_skybox_array

    img = procedural_sky(64, 48)
    out = blur_skybox_array(img, 3.0)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    # linearized output: darker than the sRGB input on average
    assert out.mean() < img.mean()


def test_thin_film_e2e():
    sc = Scene(ambient_color=rgb(0.01, 0.01, 0.01))
    sc.add_Camera(look_from=vec3(0, 0, 4), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8, field_of_view=40)
    sc.add(Sphere(material=ThinFilmInterference(thickness=330, noise=0.0),
                  center=vec3(0, 0, 0), radius=1.5, shadow=False, max_ray_depth=4))
    sc.add(Sphere(material=Emissive(color=rgb(0.7, 0.7, 0.7)),
                  center=vec3(0, 0, 0), radius=30.0, shadow=False))
    img = np.asarray(sc.render(samples_per_pixel=32, seed=0), np.float32) / 255.0
    # the bubble transmits most light: center pixels close to background,
    # but thin-film reflection tints them away from exact grey
    assert img.mean() > 0.3
    center = img[3:5, 3:5].reshape(-1, 3).mean(0)
    assert center.max() > 0.2


def test_simulation_inference_pipeline(tmp_path):
    # the fork's SBI use case end-to-end at toy scale: simulate a per-ray
    # dataset over refraction indices, fit the torch regressor, and infer a
    # finite index for a held-out render (accuracy needs the full run;
    # this asserts the pipeline itself)
    import importlib
    import sys
    from pathlib import Path

    torch = pytest.importorskip("torch")  # noqa: F841
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    si = importlib.import_module("simulation_inference")

    data = si.simulate(tmp_path / "rays.csv", n_sims=6, spp=4)
    assert data.shape == (6, 7) and np.isfinite(data).all()
    obs = si.ray_features(si.glass_scene(1.5).render(samples_per_pixel=4,
                                                     seed=99))
    est = si.infer(data, obs)
    assert np.isfinite(est) and 0.5 < est < 2.5
    assert (tmp_path / "rays.csv").exists()


def test_example_mesh_builds():
    # the mesh example constructs its whole scene (OBJ gen + native parse +
    # rotation) at import; compiling it must engage the clustered sweep
    import importlib
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    mod = importlib.import_module("example_mesh")
    from raytracer_tpu.core.compile import compile_scene

    static, data = compile_scene(mod.Sc)
    assert static.n_tris == 5120
    assert data.geom.tri_cl_lo.shape[0] == 20      # 5120 / 256 clusters


def test_triangle_mesh_obj(tmp_path):
    # two triangles forming a quad facing +z
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\nf 1 2 3\nf 1 3 4\n")
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 3), look_at=vec3(0, 0, 0),
                  screen_width=8, screen_height=8, field_of_view=45)
    mesh = TriangleMesh(str(obj), center=vec3(0, 0, 0),
                        material=Emissive(color=rgb(0.2, 0.9, 0.4)))
    sc.add(mesh)
    assert mesh.faces.shape == (2, 3)
    img = np.asarray(sc.render(samples_per_pixel=2), np.float32) / 255.0
    # center shows the quad
    assert img[3:5, 3:5, 1].mean() > 0.5
    # corners miss
    assert img[0, 0].max() == 0.0


def test_triangle_mesh_rotation(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\n")
    mesh = TriangleMesh(str(obj), center=vec3(0, 0, 0),
                        material=Emissive(color=rgb(1, 1, 1)))
    v0 = mesh.vertices.copy()
    mesh.rotate(θ=360, u=vec3(0, 1, 0))
    assert np.allclose(mesh.vertices, v0, atol=1e-6)


def test_hdr_round_trip(tmp_path):
    """save_hdr/load_hdr preserve linear radiance to RGBE precision
    (~0.4% relative), including values far above 1.0."""
    import numpy as np

    from raytracer_tpu import load_hdr, save_hdr

    rng = np.random.default_rng(7)
    a = (rng.uniform(0, 1, (16, 24, 3)) ** 2) * rng.choice(
        [0.01, 1.0, 37.5], (16, 24, 1))
    p = tmp_path / "t.hdr"
    save_hdr(a, p)
    b = load_hdr(p)
    m = a.max(axis=2, keepdims=True)
    assert np.abs(b - a).max() <= 0.004 * max(a.max(), 1.0) + 1e-6
    # per-pixel shared-exponent error bound: half an RGBE step
    assert (np.abs(b - a) <= m / 256.0 + 1e-7).all()


def test_hdr_environment_is_linear_and_gated(tmp_path):
    """A Radiance .hdr Panorama is consumed as LINEAR radiance (no EOTF,
    values above 1 preserved); since r3 such scenes KEEP the record path
    (the atlas stores them RGB9E5 — core/compile.py E5_PACK_LIMIT)."""
    import numpy as np

    from raytracer_tpu import Panorama, Scene, save_hdr, vec3
    from raytracer_tpu.core.compile import compile_scene

    env = np.full((8, 16, 3), 5.0, np.float32)
    env[:, :, 1] = 2.0
    p = tmp_path / "env.hdr"
    save_hdr(env, p)

    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 0), look_at=vec3(0, 0, -1),
                  screen_width=8, screen_height=8)
    sc.add(Panorama(str(p)))
    static, _ = compile_scene(sc)
    assert static.pallas_tex_ok and not static.pallas_ok
    assert any(static.tex_enc)
    lin = np.asarray(sc.render(samples_per_pixel=1, seed=0, output="linear"))
    assert np.allclose(lin[..., 0], 5.0, rtol=0.02)
    assert np.allclose(lin[..., 1], 2.0, rtol=0.02)


def test_hdr_rle_load(tmp_path):
    """load_hdr decodes new-RLE scanlines (the layout real .hdr assets use),
    matching the plain-scanline decode of the same image."""
    import numpy as np

    from raytracer_tpu import load_hdr, save_hdr

    rng = np.random.default_rng(3)
    h, w = 12, 32
    # piecewise-constant rows -> genuine runs, plus a literal-heavy row
    a = np.repeat(rng.uniform(0, 20, (h, 4, 3)), w // 4, axis=1)
    a[5] = rng.uniform(0, 20, (w, 3))
    plain = tmp_path / "p.hdr"
    save_hdr(a, plain)
    ref = load_hdr(plain)

    # re-encode the same RGBE quadruples with new-RLE scanlines
    raw = plain.read_bytes()
    head_end = raw.index(b"\n\n") + 2
    head = raw[:head_end] + f"-Y {h} +X {w}\n".encode()
    dims_end = raw.index(b"\n", head_end) + 1
    rgbe = np.frombuffer(raw[dims_end:], np.uint8).reshape(h, w, 4)
    out = bytearray(head)
    for y in range(h):
        out += bytes([2, 2, w >> 8, w & 0xFF])
        for c in range(4):
            row = rgbe[y, :, c]
            x = 0
            while x < w:
                # find a run
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 127:
                    run += 1
                if run >= 3:
                    out += bytes([128 + run, int(row[x])])
                    x += run
                else:
                    lit = min(2, w - x)
                    out += bytes([lit]) + row[x:x + lit].tobytes()
                    x += lit
    rle = tmp_path / "r.hdr"
    rle.write_bytes(bytes(out))
    got = load_hdr(rle)
    assert np.array_equal(got, ref)


def test_hdr_env_blur_wide_kernel(tmp_path):
    """An HDR env blur whose kernel exceeds the texture extent keeps the
    texture shape (regression: r >= width used to slice the image away)."""
    import numpy as np

    from raytracer_tpu import Panorama, save_hdr

    env = np.zeros((8, 16, 3), np.float32)
    env[4, 8] = 500.0   # single bright texel
    p = tmp_path / "e.hdr"
    save_hdr(env, p)
    pan = Panorama(str(p), blur=6.0)
    bt = pan.material.blur_texture
    assert bt.shape == (8, 16, 3)
    assert np.isfinite(bt).all() and bt.max() > 0.0
    # energy spread, not clipped: HDR blur must keep values above 1
    assert bt.max() > 1.0
