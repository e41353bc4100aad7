"""MegaDepth-1500 relative-pose benchmark (role of reference
`eval/megadepth1500.py:31-200`).

Exports matches, then computes epipolar/depth match metrics and RANSAC
relative-pose AUC@{5,10,20}° with best-threshold selection by mAA.
No auto-download: place megadepth1500 (posed-images layout) under DATA_PATH.

Run: python -m gluefactory_tpu.eval.megadepth1500 --conf superpoint+lightglue-official
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable
from pathlib import Path
from pprint import pprint

import h5py
import numpy as np

from ..data import get_dataset
from ..data.base_dataset import prepare_batch
from ..settings import EVAL_PATH
from ..utils.export_predictions import export_predictions
from ..utils.tensor import map_tensor, rbd
from .eval_pipeline import EvalPipeline
from .hpatches import load_cached_prediction
from .io import get_eval_parser, load_model, make_apply_fn, parse_eval_args
from .utils import (
    eval_matches_depth,
    eval_matches_epipolar,
    eval_poses,
    eval_relative_pose_robust,
)


class MegaDepth1500Pipeline(EvalPipeline):
    default_conf = {
        "data": {
            "name": "posed_images",
            "root": "megadepth1500",
            "image_dir": "{scene}/images",
            "depth_dir": "{scene}/depths",
            "views": "{scene}/views.txt",
            "view_groups": "{scene}/pairs.txt",
            "depth_format": "h5",
            "scene_list": None,
            "preprocessing": {
                "resize": 1600,
                "side": "long",
                "interpolation": "area",
                "antialias": False,
            },
            "num_workers": 8,
            "batch_size": 1,
        },
        "model": {"ground_truth": {"name": None}},
        "eval": {
            "estimator": "opencv",  # opencv | xla_ransac
            "ransac_th": 0.5,  # <=0 sweeps
        },
        "checkpoint": None,
        # group N items into one padded device dispatch during export
        # (relay-latency amortization; None = per-loader-batch)
        "items_per_dispatch": None,
    }
    export_keys = [
        "keypoints0", "keypoints1",
        "keypoint_scores0", "keypoint_scores1",
        "matches0", "matches1",
        "matching_scores0", "matching_scores1",
    ]

    @classmethod
    def get_dataloader(cls, data_conf=None):
        data_conf = data_conf or cls.default_conf["data"]
        dataset = get_dataset(data_conf["name"] if isinstance(data_conf, dict) else data_conf.name)(data_conf)
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir, model=None, variables=None, overwrite=False):
        pred_file = Path(experiment_dir) / "predictions.h5"
        if not pred_file.exists() or overwrite:
            if model is None:
                model, variables = load_model(self.conf.model, self.conf.get("checkpoint"))
            apply_fn = make_apply_fn(model, variables)
            export_predictions(
                self.get_dataloader(self.conf.get("data")), apply_fn, pred_file,
                keys=self.export_keys,
                items_per_dispatch=self.conf.get("items_per_dispatch"),
            )
        return pred_file

    def run_eval(self, loader, pred_file):
        assert Path(pred_file).exists()
        results = defaultdict(list)
        conf = self.conf.eval
        test_thresholds = (
            ([conf.ransac_th] if conf.ransac_th > 0 else [0.5, 1.0, 1.5, 2.0, 2.5, 3.0])
            if not isinstance(conf.ransac_th, Iterable)
            else list(conf.ransac_th)
        )
        pose_results = defaultdict(lambda: defaultdict(list))
        with h5py.File(str(pred_file), "r") as hfile:
            for i, batch in enumerate(loader):
                prepared = prepare_batch(batch)
                data_i = rbd(prepared)
                name = batch["name"][0]
                pred = load_cached_prediction(hfile, name, map_tensor(batch, lambda t: np.asarray(t)[0]))
                results_i = eval_matches_epipolar(data_i, pred)
                if "depth" in batch.get("view0", {}):
                    results_i.update(eval_matches_depth(data_i, pred))
                for th in test_thresholds:
                    pose_results_i = eval_relative_pose_robust(
                        data_i, pred, {"estimator": conf.estimator, "ransac_th": th}
                    )
                    for k, v in pose_results_i.items():
                        pose_results[th][k].append(v)
                results_i["names"] = name
                for k, v in results_i.items():
                    results[k].append(v)

        summaries = {}
        for k, v in results.items():
            arr = np.array(v)
            if not np.issubdtype(arr.dtype, np.number):
                continue
            summaries[f"m{k}"] = round(float(np.nanmedian(arr)), 3)

        best_pose_results, best_th = eval_poses(
            pose_results, auc_ths=[5, 10, 20], key="rel_pose_error", unit="°"
        )
        results = {**results, **pose_results[best_th]}
        summaries = {**summaries, **best_pose_results}

        figures = {}
        try:
            from ..visualization.viz2d import plot_cumulative

            figures["pose_recall"] = plot_cumulative(
                {self.conf.eval.estimator: results["rel_pose_error"]},
                [0, 30],
                unit="°",
                title="Pose ",
            )
        except Exception:
            pass
        return summaries, figures, results


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = MegaDepth1500Pipeline.default_conf
    output_dir = Path(EVAL_PATH, dataset_name)
    output_dir.mkdir(exist_ok=True, parents=True)
    name, conf = parse_eval_args(dataset_name, args, "configs/", default_conf)
    experiment_dir = output_dir / name
    experiment_dir.mkdir(exist_ok=True)
    pipeline = MegaDepth1500Pipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    pprint(s)
