"""À-trous AOV-guided denoiser (raytracer_tpu/denoise.py).

The reference has no denoiser; these tests establish the two properties that
make one useful: (1) noise in flat regions is strongly attenuated, (2)
geometric edges (normal / depth discontinuities) are preserved, and (3) on a
real Monte-Carlo render the denoised low-spp frame is measurably closer to a
high-spp ground truth than the raw input.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from raytracer_tpu import Scene, denoise

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def synthetic_edge(H=48, W=48, noise=0.25, seed=0):
    """Two flat half-planes with different normals, depths and radiance."""
    rng = np.random.default_rng(seed)
    left = np.arange(W)[None, :] < W // 2
    img = np.where(left[..., None], 0.2, 0.8).astype(np.float32)
    img = img + rng.normal(0, noise, (H, W, 3)).astype(np.float32)
    img = np.maximum(img, 0.0)
    normal = np.where(left[..., None],
                      np.array([0.0, 0.0, 1.0], np.float32),
                      np.array([1.0, 0.0, 0.0], np.float32))
    normal = np.broadcast_to(normal, (H, W, 3)).astype(np.float32)
    depth = np.where(np.broadcast_to(left, (H, W)), 2.0, 5.0).astype(np.float32)
    aovs = dict(albedo=np.ones((H, W, 3), np.float32), normal=normal,
                depth=depth)
    return img, aovs, left


def test_flat_region_variance_drops():
    img, aovs, left = synthetic_edge()
    out = denoise(img, aovs, iterations=4, sigma_color=2.0)
    assert out.shape == img.shape and out.dtype == np.float32
    # interior of each half (away from the edge and borders)
    raw_std = img[8:-8, 8:16].std()
    dn_std = out[8:-8, 8:16].std()
    assert dn_std < raw_std / 4, (raw_std, dn_std)


def test_edge_is_preserved():
    img, aovs, left = synthetic_edge()
    out = denoise(img, aovs, iterations=4, sigma_color=2.0)
    # the two halves must keep distinct means: geometric edge-stopping
    # prevents the 0.2 and 0.8 plateaus from blurring into each other
    m_l = out[8:-8, 4:20].mean()
    m_r = out[8:-8, -20:-4].mean()
    assert abs(m_l - 0.2) < 0.08, m_l
    assert abs(m_r - 0.8) < 0.08, m_r
    # columns immediately adjacent to the edge stay on their own side
    el = out[8:-8, left.shape[1] // 2 - 2].mean()
    er = out[8:-8, left.shape[1] // 2 + 1].mean()
    assert el < 0.45 < er, (el, er)


def test_albedo_demodulation_keeps_texture():
    # a checkered albedo under flat noisy lighting: demodulated filtering
    # must smooth the lighting without erasing the texture pattern
    rng = np.random.default_rng(3)
    H = W = 32
    cells = ((np.arange(H)[:, None] // 4 + np.arange(W)[None, :] // 4) % 2)
    albedo = np.broadcast_to(
        np.where(cells[..., None], 0.9, 0.25), (H, W, 3)).astype(np.float32)
    illum = 0.6 + rng.normal(0, 0.2, (H, W, 3)).astype(np.float32)
    img = np.maximum(albedo * illum, 0.0)
    normal = np.broadcast_to(np.array([0, 0, 1.0], np.float32), (H, W, 3))
    aovs = dict(albedo=albedo, normal=np.ascontiguousarray(normal),
                depth=np.full((H, W), 3.0, np.float32))
    out = denoise(img, aovs, iterations=3, sigma_color=2.0)
    bright = out[cells.astype(bool)].mean()
    dark = out[~cells.astype(bool)].mean()
    # texture contrast survives (ratio ~3.6 ideally), lighting noise drops
    assert bright / dark > 2.5, (bright, dark)
    ill = out / np.maximum(albedo, 0.05)
    assert ill[4:-4, 4:-4].std() < 0.08, ill.std()


def test_cornell_mse_improves():
    # real Monte-Carlo noise: a 2-spp Cornell render denoised with 4-spp AOVs
    # must land much closer to a 32-spp ground truth.  MSE is measured in
    # DISPLAY space (the sRGB EOTF the viewer sees): the 15x-radiance light
    # silhouette carries irreducible 2-spp aliasing noise in linear units
    # that tonemapping clamps anyway.
    import numpy as np

    from example_cornellbox import build_cornell
    from raytracer_tpu import srgb_linear_to_srgb

    sc = build_cornell(24, 24)
    truth = sc.render(32, seed=100, output="linear")
    noisy = sc.render(2, seed=7, output="linear")
    aovs = sc.render_aovs(4, seed=11)
    dn = denoise(noisy, aovs)
    tm = lambda x: np.asarray(srgb_linear_to_srgb(np.asarray(x)))
    mse_raw = float(((tm(noisy) - tm(truth)) ** 2).mean())
    mse_dn = float(((tm(dn) - tm(truth)) ** 2).mean())
    # ~2x display-space improvement measured; the remainder is shadow-
    # smoothing bias, irreducible without variance guidance at 2 spp.
    # (Ratios recalibrated after R2 sampling landed: the RAW render got
    # ~10-20% better, so the denoiser's relative win shrank while the
    # absolute result improved.)
    assert mse_dn < 0.60 * mse_raw, (mse_raw, mse_dn)
    # and in linear space away from the light the win is far larger (the
    # interior mask mirrors the denoiser's dilated freeze region)
    src = np.pad(aovs["emissive"] > 0.0, 1)
    near = np.zeros((24, 24), bool)
    for dy in range(3):
        for dx in range(3):
            near |= src[dy:dy + 24, dx:dx + 24]
    interior = ~near
    lin_raw = float(((noisy - truth) ** 2).mean(-1)[interior].mean())
    lin_dn = float(((dn - truth) ** 2).mean(-1)[interior].mean())
    assert lin_dn < 0.60 * lin_raw, (lin_raw, lin_dn)


def test_with_variance_output():
    # render(with_variance=True) returns a sane per-pixel variance of the
    # mean: non-negative, finite, and shrinking roughly like 1/n with spp
    from example_cornellbox import build_cornell

    sc = build_cornell(16, 16)
    lin, var = sc.render(2, seed=7, output="linear", with_variance=True)
    assert lin.shape == (16, 16, 3) and var.shape == (16, 16, 3)
    assert np.isfinite(var).all() and (var >= 0).all()
    assert var.max() > 0  # 2-spp Cornell is noisy somewhere
    _, var8 = sc.render(8, seed=7, output="linear", with_variance=True)
    # 4x the samples -> ~4x smaller variance of the mean (loose: the sample
    # variance estimate itself is noisy at 2 spp)
    assert var8.mean() < 0.6 * var.mean(), (var.mean(), var8.mean())
    # variance agrees with the scatter of independent renders: the mean
    # predicted std must be on the order of the observed seed-to-seed std
    renders = np.stack([sc.render(2, seed=s, output="linear")
                        for s in range(20, 26)])
    observed = renders.std(axis=0, ddof=1).mean()
    predicted = np.sqrt(var).mean()
    assert 0.3 < predicted / observed < 3.0, (predicted, observed)


def test_variance_guided_beats_fixed():
    # the SVGF-style luminance weight must beat the fixed-sigma weight on a
    # real low-spp render (measured: display MSE 0.0044 -> 0.0030 at 2 spp)
    from example_cornellbox import build_cornell
    from raytracer_tpu import srgb_linear_to_srgb

    sc = build_cornell(24, 24)
    truth = sc.render(32, seed=100, output="linear")
    noisy, var = sc.render(2, seed=7, output="linear", with_variance=True)
    aovs = sc.render_aovs(4, seed=11)
    dn_fix = denoise(noisy, aovs)
    dn_var = denoise(noisy, aovs, variance=var)
    tm = lambda x: np.asarray(srgb_linear_to_srgb(np.asarray(x)))
    mse_fix = float(((tm(dn_fix) - tm(truth)) ** 2).mean())
    mse_var = float(((tm(dn_var) - tm(truth)) ** 2).mean())
    assert mse_var < mse_fix, (mse_fix, mse_var)


def test_with_variance_validation():
    from example_cornellbox import build_cornell

    sc = build_cornell(8, 8)
    with pytest.raises(ValueError, match="with_variance"):
        sc.render(2, with_variance=True)  # needs output="linear"
    with pytest.raises(ValueError, match="checkpoint"):
        sc.render(2, output="linear", with_variance=True,
                  checkpoint_path="/tmp/nope.npz")
    img = sc.render(2, seed=3, output="linear")
    img2, var = sc.render(2, seed=3, output="linear", with_variance=True)
    assert np.allclose(img, img2), "with_variance must not change the mean"


def test_render_denoised_api():
    from example_cornellbox import build_cornell

    sc = build_cornell(16, 16)
    img = sc.render_denoised(2, seed=5)
    arr = np.asarray(img)
    assert arr.shape == (16, 16, 3) and arr.dtype == np.uint8
    # deterministic: same seeds -> identical bytes
    img2 = sc.render_denoised(2, seed=5)
    assert np.array_equal(arr, np.asarray(img2))
    lin = sc.render_denoised(2, seed=5, output="linear")
    assert lin.shape == (16, 16, 3) and lin.dtype == np.float32
