"""PosedImageDataset side-data loading (reference
`datasets/posed_images.py:71-72,120-131,166-169`): per-scene `extra_data`
text files merged into each view under `extra_keys`."""

import cv2
import numpy as np
import pytest


@pytest.fixture()
def posed_root(tmp_path, monkeypatch):
    import gluefactory_tpu.data.posed_images as pi

    from gluefactory_tpu.data.homographies import generate_synthetic_image

    root = tmp_path / "posed"
    scene = "0001"
    (root / scene / "images").mkdir(parents=True)
    w, h = 80, 60
    views, names = [], []
    for i in range(3):
        img = (generate_synthetic_image(i, (w, h)) * 255).astype(np.uint8)
        name = f"im{i}.jpg"
        names.append(name)
        cv2.imwrite(str(root / scene / "images" / name), img[..., ::-1])
        fields = (
            [name]
            + [f"{x:.6f}" for x in np.eye(3).ravel()]
            + [f"{x:.6f}" for x in [0.05 * i, 0.0, 0.0]]
            + ["PINHOLE", str(w), str(h), "120.0", "120.0", f"{w/2}", f"{h/2}"]
        )
        views.append(" ".join(fields))
    (root / scene / "views.txt").write_text("\n".join(views) + "\n")
    (root / scene / "pairs.txt").write_text(f"{names[0]} {names[1]}\n")
    (root / scene / "extra.txt").write_text(
        "# comment line skipped\n"
        f"{names[0]} 0.25 7\n{names[1]} 0.50 8\n{names[2]} 0.75 9\n"
    )
    monkeypatch.setattr(pi, "DATA_PATH", tmp_path)
    return root


def test_extra_data_merged_into_views(posed_root):
    from gluefactory_tpu.data import get_dataset

    ds = get_dataset("posed_images")(
        {
            "root": "posed",
            "depth_dir": None,
            "extra_data": "{scene}/extra.txt",
            "extra_keys": ["covisibility", "tag"],
            "num_workers": 0,
        }
    )
    item = ds.get_dataset("test")[0]
    assert item["view0"]["covisibility"] == 0.25 and item["view0"]["tag"] == 7
    assert item["view1"]["covisibility"] == 0.50 and item["view1"]["tag"] == 8


def test_extra_data_unknown_view_raises(posed_root):
    from gluefactory_tpu.data import get_dataset

    (posed_root / "0001" / "extra.txt").write_text("missing.jpg 1.0 1\n")
    with pytest.raises(AssertionError):
        get_dataset("posed_images")(
            {
                "root": "posed",
                "extra_data": "{scene}/extra.txt",
                "extra_keys": ["a", "b"],
            }
        )
