"""Per-scene MegaDepth feature-cache export (role of reference
`scripts/export_megadepth.py:14-173`): run an extractor over every image of
every scene, store features (optionally with per-keypoint depth via the
callback) into `exports/<tag>/{scene}.h5` — the cache consumed by
`data.load_features` for extractor-free stage-2 training (SURVEY §3.5).

Usage:
    python -m gluefactory_tpu.scripts.export_megadepth --method sp \
        [--scenes scene_list.txt] [--num_workers 8]
"""

from __future__ import annotations

import argparse
import numpy as np

from .. import logger
from ..data import get_dataset
from ..eval.io import make_apply_fn
from ..models import get_model
from ..settings import DATA_PATH
from ..utils.export_predictions import export_predictions

# extractor configurations (reference export_megadepth.py:24-141)
METHODS = {
    "sp": {
        "tag": "r1024_SP-k2048-nms3",
        "model": {
            "name": "superpoint",
            "max_num_keypoints": 2048,
            "nms_radius": 3,
            "detection_threshold": 0.0,
        },
    },
    "sp_open": {
        "tag": "r1024_SPopen-k2048-nms3",
        "model": {
            "name": "superpoint_open",
            "max_num_keypoints": 2048,
            "detection_threshold": 0.0,
        },
    },
    "sift": {
        "tag": "r1024_SIFT-k4096-nms4",
        "model": {"name": "sift", "max_num_keypoints": 4096, "nms_radius": 4},
    },
    "disk": {
        "tag": "r1024_DISK-k2048-nms5",
        # radius-5 NMS == kornia's window 11 (DISK confs use nms_window_size)
        "model": {"name": "disk", "max_num_keypoints": 2048, "nms_window_size": 11},
    },
    "aliked": {
        "tag": "r1024_ALIKED-k2048-n16",
        "model": {"name": "aliked", "max_num_keypoints": 2048},
    },
}


def depth_callback(pred: dict, data: dict) -> dict:
    """Store per-keypoint depth next to features (reference
    `scripts/export_megadepth.py:100-102`)."""
    import jax.numpy as jnp

    from ..geometry.depth import sample_depth

    depth = data.get("depth")
    if depth is None or "keypoints" not in pred:
        return {}
    d, valid = sample_depth(
        jnp.asarray(pred["keypoints"][None]), jnp.asarray(depth[None])
    )
    return {
        "depth_keypoints": np.asarray(d)[0],
        "valid_depth_keypoints": np.asarray(valid)[0],
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", type=str, default="sp", choices=sorted(METHODS))
    parser.add_argument("--scenes", type=str, default=None)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--resize", type=int, default=1024)
    parser.add_argument("--with_depth", action="store_true")
    args = parser.parse_args()

    method = METHODS[args.method]
    export_root = DATA_PATH / "exports" / ("megadepth-undist-depth-" + method["tag"])
    export_root.mkdir(parents=True, exist_ok=True)

    model_conf = method["model"]
    model = get_model(model_conf["name"]).from_conf(
        {k: v for k, v in model_conf.items() if k != "name"}
    )
    apply_fn = make_apply_fn(model, None)

    dataset = get_dataset("megadepth")(
        {
            "train_split": args.scenes or "train_scenes_clean.txt",
            "views": 1,
            "train_num_per_scene": None,
            "read_depth": args.with_depth,
            "preprocessing": {"resize": args.resize, "side": "long"},
            "num_workers": args.num_workers,
        }
    )
    tds = dataset.get_dataset("train")
    scenes = sorted({item[0] for item in tds.items})
    for scene in scenes:
        out_file = export_root / f"{scene}.h5"
        if out_file.exists():
            logger.info("Skipping %s (exists)", scene)
            continue
        scene_items = [it for it in tds.items if it[0] == scene]
        tds.items = scene_items
        import torch.utils.data as torch_data

        from ..data.base_dataset import collate

        loader = torch_data.DataLoader(
            tds, batch_size=1, num_workers=args.num_workers, collate_fn=collate
        )
        logger.info("Exporting %s (%d images)", scene, len(scene_items))
        export_predictions(
            loader, apply_fn, out_file, as_half=True,
            callback_fn=depth_callback if args.with_depth else None,
        )


if __name__ == "__main__":
    main()
