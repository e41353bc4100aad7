"""Hermetic MegaDepth-1500 eval test: fabricates the posed-images layout
(views.txt/pairs.txt, h5 depths) with exact geometry and runs the full
two-loop relative-pose benchmark."""

import cv2
import h5py
import numpy as np
import pytest


@pytest.fixture()
def fake_md1500(tmp_path, monkeypatch):
    import gluefactory_tpu.data.posed_images as pi

    from gluefactory_tpu.data.homographies import generate_synthetic_image

    root = tmp_path / "megadepth1500"
    scene = "0022"
    (root / scene / "images").mkdir(parents=True)
    (root / scene / "depths").mkdir(parents=True)
    w, h = 160, 120
    f = 120.0
    n = 4
    views_lines = []
    names = []
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (generate_synthetic_image(i, (w, h)) * 255).astype(np.uint8)
        name = f"im{i}.jpg"
        names.append(name)
        cv2.imwrite(str(root / scene / "images" / name), img[..., ::-1])
        with h5py.File(root / scene / "depths" / f"im{i}.h5", "w") as hf:
            hf.create_dataset("/depth", data=np.full((h, w), 4.0, np.float32))
        R = np.eye(3)
        t = np.array([0.05 * i, 0.0, 0.0])
        fields = (
            [name]
            + [f"{x:.6f}" for x in R.ravel()]
            + [f"{x:.6f}" for x in t]
            + ["PINHOLE", str(w), str(h), f"{f}", f"{f}", f"{w/2}", f"{h/2}"]
        )
        views_lines.append(" ".join(fields))
    (root / scene / "views.txt").write_text("\n".join(views_lines) + "\n")
    pairs = [f"{names[i]} {names[i+1]}" for i in range(n - 1)]
    (root / scene / "pairs.txt").write_text("\n".join(pairs) + "\n")
    monkeypatch.setattr(pi, "DATA_PATH", tmp_path)
    return root


def test_md1500_dataset(fake_md1500):
    from gluefactory_tpu.data import get_dataset

    ds = get_dataset("posed_images")(
        {
            "root": "megadepth1500",
            "depth_dir": "{scene}/depths",
            "preprocessing": {"resize": 120, "side": "long"},
        }
    )
    loader = ds.get_data_loader("test")
    assert len(loader) == 3
    batch = next(iter(loader))
    assert batch["T_0to1"].shape == (1, 4, 4)
    assert "depth" in batch["view0"]
    assert batch["view0"]["camera"]["f"].shape == (1, 2)


@pytest.mark.slow
def test_md1500_grouped_export_matches_per_item(fake_md1500, tmp_path):
    """items_per_dispatch>1 (padded group dispatch, partial trailing group)
    writes a predictions.h5 item-for-item equal to per-item dispatch."""
    import h5py

    from gluefactory_tpu.data.homographies import generate_synthetic_image
    from gluefactory_tpu.eval.megadepth1500 import MegaDepth1500Pipeline

    # a second scene with mixed aspect ratios so processed image shapes
    # differ WITHIN a dispatch group (exercises the zero-pad + image_size
    # masking path of the grouped export)
    scene = fake_md1500 / "0033"
    (scene / "images").mkdir(parents=True)
    (scene / "depths").mkdir(parents=True)
    views_lines, names = [], []
    for i, (w, h) in enumerate([(160, 120), (120, 160)]):
        img = (generate_synthetic_image(10 + i, (w, h)) * 255).astype(np.uint8)
        name = f"jm{i}.jpg"  # unique vs scene 0022 (h5 names must not clash)
        names.append(name)
        cv2.imwrite(str(scene / "images" / name), img[..., ::-1])
        with h5py.File(scene / "depths" / f"jm{i}.h5", "w") as hf:
            hf.create_dataset("/depth", data=np.full((h, w), 4.0, np.float32))
        fields = (
            [name]
            + [f"{x:.6f}" for x in np.eye(3).ravel()]
            + [f"{x:.6f}" for x in [0.05 * i, 0.0, 0.0]]
            + ["PINHOLE", str(w), str(h), "120.0", "120.0", f"{w/2}", f"{h/2}"]
        )
        views_lines.append(" ".join(fields))
    (scene / "views.txt").write_text("\n".join(views_lines) + "\n")
    (scene / "pairs.txt").write_text(f"{names[0]} {names[1]}\n")

    conf = {
        "data": {
            "root": "megadepth1500",
            "depth_dir": "{scene}/depths",
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
    files = {}
    # 4 pairs with groups of 3 exercises mixed-shape padding AND the
    # repeated-item partial trailing group
    for ipd in (None, 3):
        pipeline = MegaDepth1500Pipeline({**conf, "items_per_dispatch": ipd})
        exp_dir = tmp_path / f"md_export_ipd{ipd}"
        exp_dir.mkdir()
        files[ipd] = pipeline.get_predictions(exp_dir, overwrite=True)
    def all_datasets(f):
        out = {}
        f.visititems(
            lambda p, obj: out.update({p: np.asarray(obj)})
            if isinstance(obj, h5py.Dataset) else None
        )
        return out

    with h5py.File(files[None], "r") as fa, h5py.File(files[3], "r") as fb:
        da, db = all_datasets(fa), all_datasets(fb)
    assert set(da) == set(db)
    # 4 pairs x the exported match keys
    assert len({p.rsplit("/", 1)[0] for p in da}) == 4
    # same-shape bucketing keeps grouped dispatch BIT-identical to per-item
    for p in sorted(da):
        a, b = da[p], db[p]
        assert a.shape == b.shape, (p, a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=p)


@pytest.mark.slow
def test_md1500_eval_pipeline(fake_md1500, tmp_path):
    from gluefactory_tpu.eval.megadepth1500 import MegaDepth1500Pipeline

    pipeline = MegaDepth1500Pipeline(
        {
            "data": {
                "root": "megadepth1500",
                "depth_dir": "{scene}/depths",
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
    exp_dir = tmp_path / "md_eval"
    s, fgs, r = pipeline.run(exp_dir, overwrite=True, overwrite_eval=True)
    assert "rel_pose_error@5°" in s or "rel_pose_error_mAA" in s
    assert "mepi_prec@1e-3" in s
    assert len(r["rel_pose_error"]) == 3
