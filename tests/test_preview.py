"""Progressive preview (Scene.render(preview_path=...)).

Every `preview_every` chunks the tonemapped accumulator-so-far is written
to disk; the final preview is bit-identical to the returned image.  The
reference offers nothing between "Rendering..." and the finished frame.
"""

import numpy as np
from PIL import Image

from raytracer_tpu import Diffuse, Emissive, Scene, Sphere, rgb, vec3


def scene(W=32, H=24):
    sc = Scene(ambient_color=rgb(0, 0, 0))
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=W, screen_height=H)
    sc.add(Sphere(material=Diffuse(diff_color=rgb(0.8, 0.6, 0.4),
                                   diffuse_rays=1),
                  center=vec3(0, -20.3, -2), radius=20.0))
    sc.add(Sphere(material=Emissive(color=rgb(4, 4, 4)),
                  center=vec3(0, 1.5, -2), radius=0.6, shadow=False))
    return sc


def test_final_preview_matches_returned_image(tmp_path):
    p = tmp_path / "preview.png"
    sc = scene()
    img = sc.render(8, seed=1, batch_size=2, preview_path=str(p),
                    preview_every=2)
    assert p.exists()
    assert np.array_equal(np.asarray(Image.open(p)), np.asarray(img))


def test_intermediate_previews_refine(tmp_path, monkeypatch):
    p = tmp_path / "preview.png"
    sc = scene()
    snapshots = []
    orig = Image.Image.save

    def spy(self, fp, *a, **k):
        orig(self, fp, *a, **k)
        snapshots.append(np.asarray(Image.open(fp)).copy())

    monkeypatch.setattr(Image.Image, "save", spy)
    sc.render(8, seed=1, batch_size=2, preview_path=str(p), preview_every=1)
    # 4 chunks -> 3 intermediate writes + 1 final
    assert len(snapshots) == 4
    # every snapshot is a plausible frame of the same scene (lit emitter)
    for s in snapshots:
        assert s.shape == (24, 32, 3) and s.max() > 100
    # intermediates differ from the final (fewer samples -> more noise)
    assert not np.array_equal(snapshots[0], snapshots[-1])


def test_preview_every_validated(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="preview_every"):
        scene().render(4, preview_path=str(tmp_path / "p.png"),
                       preview_every=0)


def test_preview_with_linear_output(tmp_path):
    p = tmp_path / "preview.png"
    sc = scene()
    lin = sc.render(4, seed=0, batch_size=2, output="linear",
                    preview_path=str(p))
    assert p.exists() and np.asarray(Image.open(p)).max() > 100
    assert lin.shape == (24, 32, 3)
