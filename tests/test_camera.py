import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.camera import Camera, generate_rays


def test_rays_normalized_and_centered(key):
    cam = Camera(look_from=(0, 0, 0), look_at=(0, 0, -1),
                 screen_width=9, screen_height=9, field_of_view=90)
    O, D = generate_rays(key, cam.params(), 9, 9, 1)
    D = np.asarray(D)
    assert np.allclose(np.linalg.norm(D, axis=-1), 1.0, atol=1e-5)
    # center pixel looks roughly down -z (within the one-pixel jitter)
    center = D[(9 * 9) // 2]
    assert center[2] < -0.98
    # pinhole camera: all origins at look_from
    assert np.allclose(np.asarray(O), 0.0, atol=1e-6)


def test_field_of_view_extents(key):
    cam = Camera(look_from=(0, 0, 0), look_at=(0, 0, -1),
                 screen_width=101, screen_height=101, field_of_view=90)
    O, D = generate_rays(key, cam.params(), 101, 101, 1)
    D = np.asarray(D).reshape(101, 101, 3)
    # leftmost column: x/z ~ tan(45deg) = 1 -> direction (−1, y, −1)/norm
    left = D[50, 0]
    assert abs(abs(left[0] / left[2]) - 1.0) < 0.05


def test_aperture_spreads_origins(key):
    cam = Camera(look_from=(0, 0, 0), look_at=(0, 0, -1),
                 screen_width=8, screen_height=8, aperture=0.5, focal_distance=2.0)
    O, _ = generate_rays(key, cam.params(), 8, 8, 4)
    O = np.asarray(O)
    r = np.linalg.norm(O, axis=-1)
    assert r.max() <= 0.25 + 1e-5
    assert r.max() > 0.05


def test_sample_ordering(key):
    cam = Camera(look_from=(0, 0, 0), look_at=(0, 0, -1),
                 screen_width=4, screen_height=3)
    O, D = generate_rays(key, cam.params(), 4, 3, 2)
    assert D.shape == (2 * 4 * 3, 3)
    D = np.asarray(D).reshape(2, 12, 3)
    # both sample frames look at the same pixels: directions agree to within
    # one pixel of AA jitter (pixel pitch ~0.5 direction units at this fov),
    # far below the ~2.0 separation of distant pixels
    assert np.allclose(D[0], D[1], atol=0.45)


def test_camera_params_traced_no_recompile(key):
    cam1 = Camera(look_from=(0, 0, 0), look_at=(0, 0, -1), screen_width=4, screen_height=4)
    cam2 = Camera(look_from=(1, 2, 3), look_at=(0, 0, 0), screen_width=4, screen_height=4)
    f = jax.jit(lambda k, p: generate_rays(k, p, 4, 4, 1))
    f(key, cam1.params())
    n0 = f._cache_size()
    f(key, cam2.params())
    assert f._cache_size() == n0   # same executable for a moved camera
