"""Generic local-feature export over a folder or dataset (role of reference
`scripts/export_local_features.py`).

Usage:
    python -m gluefactory_tpu.scripts.export_local_features \
        --image_dir /path/to/images --method superpoint \
        --output exports/features.h5 [--resize 1024] [--num_keypoints 2048]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from .. import logger
from ..data import get_dataset
from ..eval.io import make_apply_fn
from ..models import get_model
from ..utils.export_predictions import export_predictions

METHOD_CONFS = {
    "superpoint": {
        "name": "superpoint",
        "nms_radius": 3,
        "detection_threshold": 0.0,
    },
    "superpoint_open": {"name": "superpoint_open", "detection_threshold": 0.0},
    "sift": {"name": "sift"},
    "disk": {"name": "disk", "detection_threshold": 0.0},
    "aliked": {"name": "aliked", "detection_threshold": 0.0},
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--method", type=str, default="superpoint", choices=sorted(METHOD_CONFS))
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--resize", type=int, default=None)
    parser.add_argument("--num_keypoints", type=int, default=2048)
    parser.add_argument("--as_half", action="store_true")
    args = parser.parse_args()

    conf = dict(METHOD_CONFS[args.method])
    conf["max_num_keypoints"] = args.num_keypoints
    model = get_model(conf["name"]).from_conf({k: v for k, v in conf.items() if k != "name"})

    data_conf = {
        "images": args.image_dir,
        "preprocessing": {"resize": args.resize} if args.resize else {},
    }
    dataset = get_dataset("image_folder")(data_conf)
    loader = dataset.get_data_loader("test")

    # the extractor consumes unsuffixed view data; wrap it so export sees the
    # same two-view-free interface
    apply_fn = make_apply_fn(model, None)
    logger.info("Exporting %d images with %s", len(loader), args.method)
    export_predictions(loader, apply_fn, Path(args.output), as_half=args.as_half)


if __name__ == "__main__":
    main()
