"""Hermetic ZEB eval test: fabricates the GIM per-pair-txt layout
(<root>/<scene>/<subscene>-<img0>-<img1>.txt next to the images) and runs
the full two-loop zero-shot pose benchmark (reference `eval/zeb.py:14-93`,
`datasets/zeb.py:57-193`)."""

import cv2
import numpy as np
import pytest


@pytest.fixture()
def fake_zeb(tmp_path, monkeypatch):
    import gluefactory_tpu.data.zeb as zeb

    from gluefactory_tpu.data.homographies import generate_synthetic_image

    root = tmp_path / "zeb"
    w, h = 160, 120
    f = 120.0
    K = [f, 0.0, w / 2, 0.0, f, h / 2, 0.0, 0.0, 1.0]
    for scene, overlaps in (("gl3d", (0.5, 0.6)), ("kitti", (0.9, 0.8))):
        sdir = root / scene
        sdir.mkdir(parents=True)
        for i in range(3):
            img = (generate_synthetic_image(i, (w, h)) * 255).astype(np.uint8)
            cv2.imwrite(str(sdir / f"sub-im{i}.png"), img[..., ::-1])
        for i in range(2):
            T = np.eye(4)
            T[0, 3] = 0.05 * (i + 1)
            fields = (
                [f"im{i}.png", f"im{i+1}.png"]
                + [f"{o:.4f}" for o in overlaps]
                + [f"{x:.6f}" for x in K]
                + [f"{x:.6f}" for x in K]
                + [f"{x:.6f}" for x in T[:3].ravel()]
            )
            (sdir / f"sub-im{i}-im{i+1}.txt").write_text(" ".join(fields) + "\n")
    monkeypatch.setattr(zeb, "DATA_PATH", tmp_path)
    return root


def test_zeb_dataset(fake_zeb):
    from gluefactory_tpu.data import get_dataset

    ds = get_dataset("zeb")(
        {
            "root": "zeb",
            "preprocessing": {"resize": 120, "side": "long"},
            "num_workers": 0,
        }
    )
    loader = ds.get_data_loader("test")
    assert len(loader) == 4
    batch = next(iter(loader))
    assert batch["T_0to1"].shape == (1, 4, 4)
    assert batch["view0"]["camera"]["f"].shape == (1, 2)
    assert batch["name"][0].startswith(("gl3d/", "kitti/"))


def test_zeb_check_validates_pair_files(fake_zeb):
    """`check: True` parses every pair file at init (reference
    zeb.py:68,92-96): valid layouts pass, a corrupt pair file raises."""
    from gluefactory_tpu.data import get_dataset

    ds = get_dataset("zeb")({"root": "zeb", "check": True, "num_workers": 0})
    assert len(ds.get_dataset("test")) == 4
    bad = fake_zeb / "gl3d" / "sub-im9-im8.txt"
    bad.write_text("im9.png im8.png 0.5 0.5\n")  # images don't exist
    try:
        with pytest.raises((IndexError, AssertionError, ValueError)):
            get_dataset("zeb")({"root": "zeb", "check": True, "num_workers": 0})
    finally:
        bad.unlink()


def test_zeb_overlap_filtering(fake_zeb):
    from gluefactory_tpu.data import get_dataset

    ds = get_dataset("zeb")(
        {
            "root": "zeb",
            "preprocessing": {"resize": 120, "side": "long"},
            "num_workers": 0,
            "min_overlap": 0.7,  # keeps only the kitti pairs (min ov 0.8)
        }
    )
    loader = ds.get_data_loader("test")
    assert len(loader) == 2


def test_zeb_eval_pipeline(fake_zeb, tmp_path):
    from gluefactory_tpu.eval.zeb import ZEBPipeline

    pipeline = ZEBPipeline(
        {
            "data": {
                "root": "zeb",
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
    exp_dir = tmp_path / "zeb_eval"
    s, figs, r = pipeline.run(exp_dir, overwrite=True, overwrite_eval=True)
    assert any(k.startswith("rel_pose_error") for k in s)
    assert len(r["rel_pose_error"]) == 4
    assert (exp_dir / "predictions.h5").exists()
