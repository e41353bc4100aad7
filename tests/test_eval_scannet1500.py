"""Hermetic ScanNet-1500 eval test: fabricates the calibrated image-pairs
layout (pairs_calibrated.txt with K0/K1/T columns) and runs the full
two-loop relative-pose benchmark (reference `eval/scannet1500.py:26-193`)."""

import cv2
import numpy as np
import pytest


@pytest.fixture()
def fake_scannet(tmp_path, monkeypatch):
    import gluefactory_tpu.data.image_pairs as ip

    from gluefactory_tpu.data.homographies import generate_synthetic_image

    root = tmp_path / "scannet1500"
    (root / "scene0000").mkdir(parents=True)
    w, h = 160, 120
    f = 120.0
    K = [f, 0.0, w / 2, 0.0, f, h / 2, 0.0, 0.0, 1.0]
    names = []
    for i in range(4):
        img = (generate_synthetic_image(i, (w, h)) * 255).astype(np.uint8)
        name = f"scene0000/frame{i}.jpg"
        names.append(name)
        cv2.imwrite(str(root / name), img[..., ::-1])
    lines = []
    for i in range(3):
        T = np.eye(4)
        T[0, 3] = 0.05 * (i + 1)
        fields = (
            [names[i], names[i + 1]]
            + [f"{x:.6f}" for x in K]
            + [f"{x:.6f}" for x in K]
            + [f"{x:.6f}" for x in T[:3].ravel()]
        )
        lines.append(" ".join(fields))
    (root / "pairs_calibrated.txt").write_text("\n".join(lines) + "\n")
    monkeypatch.setattr(ip, "DATA_PATH", tmp_path)
    return root


def test_scannet_dataset(fake_scannet, tmp_path):
    from gluefactory_tpu.data import get_dataset

    ds = get_dataset("image_pairs")(
        {
            "pairs": str(fake_scannet / "pairs_calibrated.txt"),
            "root": "scannet1500",
            "extra_data": "relative_pose",
            "preprocessing": {"resize": 120, "side": "long"},
            "num_workers": 0,
        }
    )
    loader = ds.get_data_loader("test")
    assert len(loader) == 3
    batch = next(iter(loader))
    assert batch["T_0to1"].shape == (1, 4, 4)
    assert batch["view0"]["camera"]["f"].shape == (1, 2)


def test_scannet1500_eval_pipeline(fake_scannet, tmp_path):
    from gluefactory_tpu.eval.scannet1500 import ScanNet1500Pipeline

    pipeline = ScanNet1500Pipeline(
        {
            "data": {
                "pairs": str(fake_scannet / "pairs_calibrated.txt"),
                "root": "scannet1500",
                "preprocessing": {"resize": 120, "side": "long"},
                "num_workers": 0,
            },
            "model": {
                "name": "two_view_pipeline",
                "extractor": {
                    "name": "superpoint",
                    "max_num_keypoints": 96,
                    "detection_threshold": 0.0,
                },
                "matcher": {"name": "nearest_neighbor_matcher"},
            },
            "eval": {"estimator": "opencv", "ransac_th": 1.0},
        }
    )
    exp_dir = tmp_path / "scannet_eval"
    s, figs, r = pipeline.run(exp_dir, overwrite=True, overwrite_eval=True)
    assert any(k.startswith("rel_pose_error") for k in s)
    assert "mepi_prec@1e-3" in s
    assert len(r["rel_pose_error"]) == 3
    # two-loop protocol artifacts
    assert (exp_dir / "predictions.h5").exists()
    assert (exp_dir / "results.h5").exists()
