"""Grouped eval export timing on the real chip (VERDICT r4 next #8).

`export_predictions(items_per_dispatch=N)` exists to amortize the relay's
seconds-scale per-dispatch I/O overhead (CLAUDE.md); it is bit-identity
tested on CPU (tests/test_eval_megadepth1500.py). This measures what it
actually buys: seconds/item at ipd in {1, 8} for a fabricated 32-pair eval
(posed-images layout, 640x480 -> resize 480, SP 512 kpts + LightGlue-9)
through the public export path. Each setting is run twice: cold (includes
the one compile per distinct shape — identical count for both settings)
and warm (pure dispatch + host post-processing).

Usage: python scripts_dev/profile_export_ipd.py
Prints one JSON line per (ipd, pass).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import cv2
import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAIRS = 32
W, H = 640, 480
RESIZE = 480


def fabricate(root: Path):
    from gluefactory_tpu.data.homographies import generate_synthetic_image

    scene = "0001"
    (root / scene / "images").mkdir(parents=True)
    views_lines, names = [], []
    for i in range(N_PAIRS + 1):
        img = (generate_synthetic_image(i, (W, H)) * 255).astype(np.uint8)
        name = f"im{i}.jpg"
        names.append(name)
        cv2.imwrite(str(root / scene / "images" / name), img[..., ::-1])
        fields = (
            [name]
            + [f"{x:.6f}" for x in np.eye(3).ravel()]
            + [f"{x:.6f}" for x in [0.05 * i, 0.0, 0.0]]
            + ["PINHOLE", str(W), str(H), "500.0", "500.0", f"{W/2}", f"{H/2}"]
        )
        views_lines.append(" ".join(fields))
    (root / scene / "views.txt").write_text("\n".join(views_lines) + "\n")
    (root / scene / "pairs.txt").write_text(
        "\n".join(f"{names[i]} {names[i + 1]}" for i in range(N_PAIRS)) + "\n"
    )


def main():
    import gluefactory_tpu.data.posed_images  # noqa: F401  (registry)
    from gluefactory_tpu.data import get_dataset
    from gluefactory_tpu.eval.io import load_model, make_apply_fn
    from gluefactory_tpu.utils.export_predictions import export_predictions

    tmp = Path(tempfile.mkdtemp())
    fabricate(tmp / "eval")

    model, variables = load_model(
        {
            "name": "two_view_pipeline",
            "extractor": {
                "name": "superpoint",
                "max_num_keypoints": 512,
                "detection_threshold": 0.0,
                "force_num_keypoints": True,
                "trainable": False,
            },
            "matcher": {"name": "lightglue", "n_layers": 9, "checkpointed": False},
        },
        None,
    )
    apply_fn = make_apply_fn(model, variables)
    keys = [
        "keypoints0", "keypoints1", "keypoint_scores0", "keypoint_scores1",
        "matches0", "matches1", "matching_scores0", "matching_scores1",
    ]

    for ipd in (1, 8):
        ds = get_dataset("posed_images")(
            {
                "root": str(tmp / "eval"),
                "depth_dir": None,
                "preprocessing": {"resize": RESIZE, "side": "long"},
                "num_workers": 0,
            }
        )
        loader = ds.get_data_loader("test")
        for label in ("cold", "warm"):
            out = tmp / f"pred_ipd{ipd}_{label}.h5"
            t0 = time.perf_counter()
            export_predictions(
                loader, apply_fn, out, keys=keys, items_per_dispatch=ipd
            )
            dt = time.perf_counter() - t0
            with h5py.File(out, "r") as f:
                n = len(f.keys())
            print(
                json.dumps(
                    {
                        "metric": f"grouped eval export ({label}, ipd={ipd}, "
                        f"{N_PAIRS} pairs, SP512+LG9, {RESIZE}px)",
                        "seconds_total": round(dt, 2),
                        "seconds_per_item": round(dt / n, 3),
                        "items": n,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
