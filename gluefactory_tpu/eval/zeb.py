"""ZEB zero-shot benchmark (role of reference `eval/zeb.py:14-93`): the
GIM cross-domain pair lists, evaluated with the ScanNet-1500 pose protocol."""

from __future__ import annotations

from pathlib import Path
from pprint import pprint

from ..settings import EVAL_PATH
from .io import get_eval_parser, parse_eval_args
from .scannet1500 import ScanNet1500Pipeline


class ZEBPipeline(ScanNet1500Pipeline):
    default_conf = {
        "data": {
            "name": "zeb",
            "preprocessing": {"resize": 1600, "side": "long"},
            "num_workers": 8,
            "batch_size": 1,
        },
        "model": {"ground_truth": {"name": None}},
        "eval": {"estimator": "opencv", "ransac_th": 0.5},
        "checkpoint": None,
    }


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = ZEBPipeline.default_conf
    output_dir = Path(EVAL_PATH, dataset_name)
    output_dir.mkdir(exist_ok=True, parents=True)
    name, conf = parse_eval_args(dataset_name, args, "configs/", default_conf)
    experiment_dir = output_dir / name
    experiment_dir.mkdir(exist_ok=True)
    pipeline = ZEBPipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    pprint(s)
