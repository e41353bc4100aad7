"""ScanNet-1500 relative-pose benchmark (role of reference
`eval/scannet1500.py:26-193`): image_pairs dataset with calibrated pairs,
same pose metrics as MegaDepth-1500.

Run: python -m gluefactory_tpu.eval.scannet1500 --conf superpoint+lightglue-official
"""

from __future__ import annotations

from pathlib import Path
from pprint import pprint

from ..settings import EVAL_PATH
from .io import get_eval_parser, parse_eval_args
from .megadepth1500 import MegaDepth1500Pipeline


class ScanNet1500Pipeline(MegaDepth1500Pipeline):
    default_conf = {
        "data": {
            "name": "image_pairs",
            "pairs": "scannet1500/pairs_calibrated.txt",
            "root": "scannet1500",
            "extra_data": "relative_pose",
            "preprocessing": {"resize": 640, "side": "long"},
            "num_workers": 8,
            "batch_size": 1,
        },
        "model": {"ground_truth": {"name": None}},
        "eval": {"estimator": "opencv", "ransac_th": 0.5},
        "checkpoint": None,
    }

    @classmethod
    def get_dataloader(cls, data_conf=None):
        from ..data import get_dataset

        data_conf = data_conf or cls.default_conf["data"]
        name = data_conf["name"] if isinstance(data_conf, dict) else data_conf.name
        dataset = get_dataset(name)(data_conf)
        return dataset.get_data_loader("test")


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = ScanNet1500Pipeline.default_conf
    output_dir = Path(EVAL_PATH, dataset_name)
    output_dir.mkdir(exist_ok=True, parents=True)
    name, conf = parse_eval_args(dataset_name, args, "configs/", default_conf)
    experiment_dir = output_dir / name
    experiment_dir.mkdir(exist_ok=True)
    pipeline = ScanNet1500Pipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    pprint(s)
