"""The dataset `__main__` visualizers plot fabricated samples hermetically
(reference ships five — datasets/{homographies,hpatches,megadepth,
posed_images,zeb}.py; these cover the two added in round 4)."""

import os
import subprocess
import sys

import cv2
import h5py
import numpy as np
import pytest


def _run_module(module, args, data_dir, out):
    env = dict(os.environ)
    env["GLUEFACTORY_DATA"] = str(data_dir)
    env["JAX_PLATFORMS"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    res = subprocess.run(
        [sys.executable, "-m", module, "--out", str(out), *args],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert out.exists() and out.stat().st_size > 0


@pytest.mark.slow
def test_posed_images_visualizer(tmp_path):
    from gluefactory_tpu.data.homographies import generate_synthetic_image

    root = tmp_path / "megadepth1500"
    scene = "0001"
    (root / scene / "images").mkdir(parents=True)
    (root / scene / "depths").mkdir(parents=True)
    w, h = 160, 120
    views, names = [], []
    for i in range(3):
        img = (generate_synthetic_image(i, (w, h)) * 255).astype(np.uint8)
        name = f"im{i}.jpg"
        names.append(name)
        cv2.imwrite(str(root / scene / "images" / name), img[..., ::-1])
        with h5py.File(root / scene / "depths" / f"im{i}.h5", "w") as hf:
            hf.create_dataset("/depth", data=np.full((h, w), 4.0, np.float32))
        fields = (
            [name]
            + [f"{x:.6f}" for x in np.eye(3).ravel()]
            + [f"{x:.6f}" for x in [0.05 * i, 0.0, 0.0]]
            + ["PINHOLE", str(w), str(h), "120.0", "120.0", f"{w/2}", f"{h/2}"]
        )
        views.append(" ".join(fields))
    (root / scene / "views.txt").write_text("\n".join(views) + "\n")
    (root / scene / "pairs.txt").write_text(
        "\n".join(f"{names[i]} {names[i+1]}" for i in range(2)) + "\n"
    )
    out = tmp_path / "posed.png"
    _run_module(
        "gluefactory_tpu.data.posed_images",
        ["--num_items", "2", "--dpi", "50", "preprocessing.resize=120"],
        tmp_path,
        out,
    )


@pytest.mark.slow
def test_zeb_visualizer(tmp_path):
    from gluefactory_tpu.data.homographies import generate_synthetic_image

    root = tmp_path / "zeb"
    w, h = 160, 120
    f = 120.0
    K = [f, 0.0, w / 2, 0.0, f, h / 2, 0.0, 0.0, 1.0]
    sdir = root / "gl3d"
    sdir.mkdir(parents=True)
    for i in range(3):
        img = (generate_synthetic_image(i, (w, h)) * 255).astype(np.uint8)
        cv2.imwrite(str(sdir / f"sub-im{i}.png"), img[..., ::-1])
    for i in range(2):
        T = np.eye(4)
        T[0, 3] = 0.05 * (i + 1)
        fields = (
            [f"im{i}.png", f"im{i+1}.png", "0.5000", "0.6000"]
            + [f"{x:.6f}" for x in K]
            + [f"{x:.6f}" for x in K]
            + [f"{x:.6f}" for x in T[:3].ravel()]
        )
        (sdir / f"sub-im{i}-im{i+1}.txt").write_text(" ".join(fields) + "\n")
    out = tmp_path / "zeb.png"
    _run_module(
        "gluefactory_tpu.data.zeb",
        ["--num_items", "2", "--dpi", "50", "max_per_scene=2",
         "preprocessing.resize=120"],
        tmp_path,
        out,
    )
