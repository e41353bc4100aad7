"""Hermetic ETH3D eval test: fabricates the COLMAP-text ETH3D layout
(cameras.txt/images.txt, png depths, covisible 3D points) and runs the full
match-AP benchmark — including the wireframe+GlueStick line path with
GT-in-forward depth matching."""

import cv2
import numpy as np
import pytest


def qvec_identity():
    return "1 0 0 0"


@pytest.fixture()
def fake_eth3d(tmp_path, monkeypatch):
    import gluefactory_tpu.data.eth3d as e3d

    from gluefactory_tpu.data.homographies import generate_synthetic_image

    root = tmp_path / "ETH3D_undistorted"
    scene = root / "courtyard"
    img_dir = scene / "images" / "dslr_images_undistorted"
    depth_dir = scene / "ground_truth_depth" / "undistorted_depth"
    calib_u = scene / "dslr_calibration_undistorted"
    calib_j = scene / "dslr_calibration_jpg"
    for d in (img_dir, depth_dir, calib_u, calib_j):
        d.mkdir(parents=True)

    w, h = 256, 192
    f = 200.0
    n = 3
    names = [f"DSC_{i}.JPG" for i in range(n)]
    base = (generate_synthetic_image(0, (w, h)) * 255).astype(np.uint8)
    for i, name in enumerate(names):
        # small translations of the same image (flat scene at depth 4)
        M = np.float32([[1, 0, -4 * i], [0, 1, 0]])
        img = cv2.warpAffine(base, M, (w, h))
        cv2.imwrite(str(img_dir / name), img[..., ::-1])
        depth16 = (np.full((h, w), 4.0) * 256).astype(np.uint16)
        cv2.imwrite(str(depth_dir / (name[:-4] + ".png")), depth16)

    # cameras.txt (downsize_factor=1 in the test conf)
    (calib_u / "cameras.txt").write_text(
        "# cameras\n# \n# \n" + f"0 PINHOLE {w} {h} {f} {f} {w/2} {h/2}\n"
    )
    # images.txt: 4 header lines, then per image 2 lines
    pts_ids = [str(j) for j in range(50)]
    lines_u, lines_j = ["# h"] * 4, ["# h"] * 4
    for i, name in enumerate(names):
        # translation of the camera: x = 0.08*i (stereo-like)
        lines_u.append(f"{i+1} {qvec_identity()} {0.08*i:.3f} 0 0 0 {name}")
        pts = " ".join(
            f"{10*j % w} {7*j % h} {j}" for j in range(50)
        )
        lines_u.append(pts)
        lines_j.append(f"{i+1} {qvec_identity()} {0.08*i:.3f} 0 0 0 {name}")
        lines_j.append(pts)
    (calib_u / "images.txt").write_text("\n".join(lines_u) + "\n")
    (calib_j / "images.txt").write_text("\n".join(lines_j) + "\n")

    monkeypatch.setattr(e3d, "DATA_PATH", tmp_path)
    return root


def test_eth3d_dataset(fake_eth3d):
    from gluefactory_tpu.data import get_dataset

    ds = get_dataset("eth3d")(
        {"min_covisibility": 10, "downsize_factor": 1, "grayscale": False}
    )
    loader = ds.get_data_loader("test")
    assert len(loader) == 3  # 3 covisible pairs
    batch = next(iter(loader))
    assert batch["view0"]["depth"].shape[1:] == (192, 256)
    assert batch["T_0to1"].shape == (1, 4, 4)


@pytest.mark.slow
def test_eth3d_eval_pipeline_points(fake_eth3d, tmp_path):
    from gluefactory_tpu.eval.eth3d import ETH3DPipeline

    pipeline = ETH3DPipeline(
        {
            "data": {
                "min_covisibility": 10,
                "downsize_factor": 1,
                "grayscale": False,
                "num_workers": 0,
            },
            "model": {
                "name": "two_view_pipeline",
                "run_gt_in_forward": True,
                "extractor": {
                    "name": "superpoint",
                    "max_num_keypoints": 128,
                    "detection_threshold": 0.0,
                },
                "matcher": {"name": "nearest_neighbor_matcher"},
                "ground_truth": {
                    "name": "depth_matcher",
                    "th_positive": 3.0,
                    "th_negative": 5.0,
                },
            },
            "eval": {"eval_lines": False, "plot_methods": [], "plot_line_methods": []},
        }
    )
    exp_dir = tmp_path / "eth3d_eval"
    s, fgs, r = pipeline.run(exp_dir, overwrite=True, overwrite_eval=True)
    assert "AP" in s
    assert 0.0 <= s["AP"] <= 100.0
