"""Simulation-based inference on per-ray data (the lmondada fork's use case).

The fork added sample batching specifically to generate per-ray training data
for inferring a glass sphere's refraction index with neural density
estimators (Training_raytracer.ipynb; SURVEY.md §2.1 "ML notebook").  This
example reproduces that pipeline natively:

1. simulate: render the glass-sphere scene at many refraction indices,
   recording (n_real, ray radiance statistics) pairs — the per-ray dataset
   the notebook reads from CSV;
2. infer: fit a small torch MLP regressor n_real <- radiance features and
   recover the index of a held-out "observed" render.

Run: python examples/simulation_inference.py [--quick]
Writes rays_dataset.csv next to this script.
"""

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from raytracer_tpu import (Emissive, Plane, Refractive, Scene, Sphere, rgb,
                           vec3)


def glass_scene(n_real):
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 2.5), look_at=vec3(0, 0, -1),
                  screen_width=32, screen_height=32, field_of_view=30)
    sc.add(Sphere(material=Refractive(n=vec3(n_real + 4e-8j, n_real, n_real)),
                  center=vec3(0, 0, 0), radius=0.7, shadow=False,
                  max_ray_depth=4))
    sc.add(Plane(material=Emissive(color=rgb(1.0, 0.6, 0.3)),
                 center=vec3(0, 0, -4), width=3.0, height=3.0,
                 u_axis=vec3(1, 0, 0), v_axis=vec3(0, 1, 0)))
    return sc


def ray_features(img):
    """Summary statistics of the per-ray radiance field (refraction bends the
    emissive backdrop, changing the image's spatial statistics)."""
    a = np.asarray(img, np.float32) / 255.0
    lum = a.mean(-1)
    cy = lum[8:24, 8:24].mean()
    ring = lum.mean() - cy
    gx = np.abs(np.diff(lum, axis=1)).mean()
    gy = np.abs(np.diff(lum, axis=0)).mean()
    return [lum.mean(), lum.std(), cy, ring, gx, gy]


def simulate(path, n_sims=40, spp=32):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_sims):
        n_real = float(rng.uniform(1.1, 1.9))
        img = glass_scene(n_real).render(samples_per_pixel=spp, seed=i)
        rows.append([n_real] + ray_features(img))
        print(f"sim {i + 1}/{n_sims} n={n_real:.3f}", flush=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["n_real", "mean", "std", "center", "ring", "gx", "gy"])
        w.writerows(rows)
    return np.asarray(rows, np.float32)


def infer(data, observed):
    import torch

    x = torch.tensor(data[:, 1:])
    y = torch.tensor(data[:, :1])
    mu, sd = x.mean(0), x.std(0) + 1e-6
    x = (x - mu) / sd
    net = torch.nn.Sequential(
        torch.nn.Linear(x.shape[1], 64), torch.nn.ReLU(),
        torch.nn.Linear(64, 64), torch.nn.ReLU(), torch.nn.Linear(64, 1))
    opt = torch.optim.Adam(net.parameters(), lr=1e-2)
    for _ in range(800):
        opt.zero_grad()
        loss = torch.nn.functional.mse_loss(net(x), y)
        loss.backward()
        opt.step()
    obs = (torch.tensor([observed], dtype=torch.float32) - mu) / sd
    return float(net(obs).item())


def main():
    quick = "--quick" in sys.argv
    out = Path(__file__).parent / "rays_dataset.csv"
    data = simulate(out, n_sims=10 if quick else 40, spp=16 if quick else 32)
    true_n = 1.52
    obs = ray_features(glass_scene(true_n).render(
        samples_per_pixel=16 if quick else 64, seed=999))
    est = infer(data, obs)
    print(f"true n_real = {true_n}, inferred = {est:.3f}")


if __name__ == "__main__":
    main()
