"""CLI: render scene files from the shell (raytracer_tpu/cli.py).

The reference has no command-line surface — every render is a hand-run
script (example1.py).  The CLI loads any example-style module (`Sc` or
`build_scene()`) and exposes the production features as flags.
"""

import json

import numpy as np
import pytest
from PIL import Image

from raytracer_tpu.cli import main

SCENE = '''
from raytracer_tpu import *

def build_scene(width=24, height=16):
    sc = Scene()
    sc.add_Camera(look_from=vec3(0, 0, 1), look_at=vec3(0, 0, -1),
                  screen_width=width, screen_height=height)
    sc.add(Sphere(material=Emissive(color=rgb(1.0, 0.6, 0.3)),
                  center=vec3(0, 0, -3), radius=1.2))
    return sc

Sc = build_scene()
'''


@pytest.fixture()
def scene_file(tmp_path):
    p = tmp_path / "cli_scene.py"
    p.write_text(SCENE)
    return p


def test_render_png_and_stats(scene_file, tmp_path, capsys):
    out = tmp_path / "img.png"
    main(["render", str(scene_file), "--spp", "2", "-o", str(out)])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["out"] == str(out)
    assert line["samples_per_pixel_traced"] >= 2
    img = np.asarray(Image.open(out))
    assert img.shape == (16, 24, 3)
    assert img.max() > 100          # the emissive sphere is there


def test_render_resolution_override(scene_file, tmp_path, capsys):
    out = tmp_path / "big.png"
    main(["render", str(scene_file), "--spp", "1", "--width", "32",
          "--height", "20", "-o", str(out)])
    assert np.asarray(Image.open(out)).shape == (20, 32, 3)


def test_render_hdr(scene_file, tmp_path, capsys):
    from raytracer_tpu import load_hdr

    out = tmp_path / "img.png"     # suffix swapped to .hdr by --hdr
    main(["render", str(scene_file), "--spp", "2", "--hdr", "-o", str(out)])
    hdr = load_hdr(str(tmp_path / "img.hdr"))
    assert hdr.shape == (16, 24, 3) and np.isfinite(hdr).all()
    assert hdr.max() > 0.5


def test_aovs(scene_file, tmp_path, capsys):
    main(["aovs", str(scene_file), "-o", str(tmp_path / "aov_{}.png")])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "depth" in line["planes"] and "normal" in line["planes"]
    for f in line["files"]:
        assert Image.open(f).size == (24, 16)


def test_devices(capsys):
    main(["devices"])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["device_count"] >= 1


def test_bad_scene_file(tmp_path):
    p = tmp_path / "empty.py"
    p.write_text("x = 1\n")
    with pytest.raises(SystemExit, match="neither"):
        main(["render", str(p), "--spp", "1"])
    with pytest.raises(SystemExit, match="not found"):
        main(["render", str(tmp_path / "missing.py")])


def test_render_sharded(scene_file, tmp_path, capsys):
    """--sharded renders over the 8 virtual devices (shard_map + psum)."""
    out = tmp_path / "sh.png"
    main(["render", str(scene_file), "--spp", "8", "--sharded",
          "-o", str(out)])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["sharded"] is True
    a = np.asarray(Image.open(out))
    assert a.shape == (16, 24, 3) and a.max() > 100


def test_animate_frames(tmp_path, capsys):
    p = tmp_path / "anim_scene.py"
    p.write_text(SCENE + '''
import numpy as np
def update_scene(scene, t):
    scene.scene_primitives[0].center = np.asarray(
        [1.5 * t - 0.75, 0.0, -3.0], np.float32)
''')
    frames_dir = tmp_path / "frames"
    main(["animate", str(p), "--spp", "1", "--fps", "4",
          "-o", str(frames_dir)])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["frames_per_s"] > 0
    assert len(list(frames_dir.glob("*.png"))) == 4


def test_bake(scene_file, tmp_path, capsys):
    from raytracer_tpu import load_hdr

    out = tmp_path / "env.hdr"
    main(["bake", str(scene_file), "--spp", "2", "--width", "64",
          "--height", "32", "-o", str(out)])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["shape"] == [32, 64, 3]
    env = load_hdr(str(out))
    assert env.shape == (32, 64, 3) and env.max() > 0.5


def test_tonemap_and_exposure_flags(scene_file, tmp_path, capsys):
    base = tmp_path / "base.png"
    main(["render", str(scene_file), "--spp", "2", "-o", str(base)])
    up = tmp_path / "up.png"
    main(["render", str(scene_file), "--spp", "2", "--tonemap", "reinhard",
          "--exposure", "1", "-o", str(up)])
    capsys.readouterr()
    a = np.asarray(Image.open(base)).astype(int)
    b = np.asarray(Image.open(up)).astype(int)
    lit = a.sum(-1) > 30
    assert lit.any() and b[lit].mean() != a[lit].mean()
    # display flags only make sense for plain PNG renders
    with pytest.raises(SystemExit, match="tonemap"):
        main(["render", str(scene_file), "--spp", "2", "--hdr",
              "--exposure", "1"])


def test_preview_flag(scene_file, tmp_path, capsys):
    out = tmp_path / "img.png"
    prev = tmp_path / "live.png"
    main(["render", str(scene_file), "--spp", "4", "-o", str(out),
          "--preview", str(prev)])
    capsys.readouterr()
    assert np.array_equal(np.asarray(Image.open(prev)),
                          np.asarray(Image.open(out)))


def test_motion_blur_flag(tmp_path, capsys):
    p = tmp_path / "mb_scene.py"
    p.write_text(SCENE + '''
import numpy as np
def update_scene(scene, t):
    scene.scene_primitives[0].center = np.asarray(
        [1.5 * t - 0.75, 0.0, -3.0], np.float32)
''')
    out = tmp_path / "mb.png"
    main(["render", str(p), "--spp", "8", "--motion-blur", "--slices", "4",
          "-o", str(out)])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["motion_blur"] is True
    a = np.asarray(Image.open(out))
    # the streak spans more columns than a static render would
    lit_cols = ((a.sum(-1) > 30).any(axis=0)).sum()
    assert lit_cols > 10
    # missing update_scene is a clear error
    p2 = tmp_path / "static_scene.py"
    p2.write_text(SCENE)
    with pytest.raises(SystemExit, match="update_scene"):
        main(["render", str(p2), "--motion-blur"])


def test_ods(scene_file, tmp_path, capsys):
    out = tmp_path / "stereo.png"
    main(["ods", str(scene_file), "--spp", "1", "--ipd", "0.1",
          "-o", str(out)])
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["out"] == str(out) and line["layout"] == "top-bottom"
    img = np.asarray(Image.open(out))
    assert img.shape == (32, 24, 3)          # two 16-row eyes stacked
    main(["ods", str(scene_file), "--spp", "1", "--layout", "side-by-side",
          "-o", str(tmp_path / "sbs.png")])
    assert np.asarray(Image.open(tmp_path / "sbs.png")).shape == (16, 48, 3)
