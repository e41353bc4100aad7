"""Hermetic HPatches eval-pipeline test: generates an hpatches-layout dataset
on disk with known homographies and runs the full two-loop protocol."""

import cv2
import numpy as np
import pytest


@pytest.fixture()
def fake_hpatches(tmp_path, monkeypatch):
    import gluefactory_tpu.data.hpatches as hp
    import gluefactory_tpu.settings as settings

    from gluefactory_tpu.data.homographies import generate_synthetic_image

    root = tmp_path / "hpatches-sequences-release"
    rng = np.random.default_rng(0)
    for s, seq in enumerate(["i_fake1", "v_fake2"]):
        d = root / seq
        d.mkdir(parents=True)
        img = (generate_synthetic_image(s, (320, 240)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "1.ppm"), img[..., ::-1])
        for q in range(2, 7):
            H = np.eye(3)
            H[:2, 2] = rng.uniform(-20, 20, 2)
            H[0, 1] = rng.uniform(-0.05, 0.05)
            warped = cv2.warpPerspective(img, H, (320, 240))
            cv2.imwrite(str(d / f"{q}.ppm"), warped[..., ::-1])
            np.savetxt(str(d / f"H_1_{q}"), H)
    monkeypatch.setattr(settings, "DATA_PATH", tmp_path)
    monkeypatch.setattr(hp, "DATA_PATH", tmp_path)
    return root


def test_hpatches_dataset(fake_hpatches):
    from gluefactory_tpu.data import get_dataset

    ds = get_dataset("hpatches")({"preprocessing": {"resize": 240, "side": "short"}})
    loader = ds.get_data_loader("test")
    assert len(loader) == 10
    batch = next(iter(loader))
    assert batch["view0"]["image"].shape[1:] == (240, 320, 3)
    assert batch["H_0to1"].shape == (1, 3, 3)


@pytest.mark.slow
def test_hpatches_eval_pipeline(fake_hpatches, tmp_path):
    from gluefactory_tpu.eval.hpatches import HPatchesPipeline

    pipeline = HPatchesPipeline(
        {
            "data": {
                "preprocessing": {"resize": 240, "side": "short"},
                "num_workers": 0,
            },
            "model": {
                "name": "two_view_pipeline",
                "extractor": {
                    "name": "superpoint",
                    "max_num_keypoints": 128,
                    "detection_threshold": 0.0,
                },
                "matcher": {"name": "nearest_neighbor_matcher"},
            },
            "eval": {"estimator": "opencv", "ransac_th": 2.0},
        }
    )
    exp_dir = tmp_path / "eval_exp"
    s, f, r = pipeline.run(exp_dir, overwrite=True, overwrite_eval=True)
    assert (exp_dir / "predictions.h5").exists()
    assert (exp_dir / "results.h5").exists()
    assert (exp_dir / "summaries.json").exists()
    assert "H_error_ransac@3px" in s or "H_error_ransac_mAA" in s
    assert "mnum_matches" in s
    assert len(r["H_error_dlt"]) == 10


@pytest.mark.slow
def test_hpatches_eval_pipeline_matcher_only_loftr(fake_hpatches, tmp_path):
    """Dense detector-free matchers produce their OWN keypoints: the
    pipeline must run with no extractor (native LoFTR) through the full
    two-loop protocol."""
    from gluefactory_tpu.eval.hpatches import HPatchesPipeline

    pipeline = HPatchesPipeline(
        {
            "data": {
                "preprocessing": {"resize": 160, "side": "short",
                                  "edge_divisible_by": 8},
                "num_workers": 0,
            },
            "model": {
                "name": "two_view_pipeline",
                "matcher": {
                    "name": "loftr",
                    "max_num_matches": 64,
                    "coarse_layers": 1,
                    "match_threshold": 0.0,
                },
            },
            "eval": {"estimator": "opencv", "ransac_th": 3.0},
        }
    )
    exp_dir = tmp_path / "eval_loftr"
    s, f, r = pipeline.run(exp_dir, overwrite=True, overwrite_eval=True)
    assert (exp_dir / "predictions.h5").exists()
    assert "mnum_matches" in s
    assert len(r["H_error_dlt"]) == 10
